"""End-to-end smoke tests: all four phases train, evaluate, checkpoint and resume
on synthetic CLEVR-shaped data, chained exactly like the real pipeline
(prior ckpt -> question coding ckpt -> module training ckpt -> joint)."""
import os
import shutil

import numpy as np
import pytest

from probnmn_tpu.evaluators.joint_training_evaluator import JointTrainingEvaluator
from probnmn_tpu.evaluators.module_training_evaluator import ModuleTrainingEvaluator
from probnmn_tpu.evaluators.program_prior_evaluator import ProgramPriorEvaluator
from probnmn_tpu.evaluators.question_coding_evaluator import QuestionCodingEvaluator
from probnmn_tpu.training.joint_training_trainer import JointTrainingTrainer
from probnmn_tpu.training.module_training_trainer import ModuleTrainingTrainer
from probnmn_tpu.training.program_prior_trainer import ProgramPriorTrainer
from probnmn_tpu.training.question_coding_trainer import QuestionCodingTrainer
from probnmn_tpu.utils.checkpointing import save_objects

from tests.clevr_fixtures import build_fixture_data, make_fixture_config


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Build data once; run the phases in dependency order, caching checkpoints."""
    root = str(tmp_path_factory.mktemp("clevr"))
    build_fixture_data(root)
    return {"root": root}


def test_program_prior_phase(pipeline):
    root = pipeline["root"]
    config = make_fixture_config(root, "program_prior")
    np.random.seed(config.RANDOM_SEED)
    serialization_dir = os.path.join(root, "pp_run")
    trainer = ProgramPriorTrainer(config, serialization_dir)
    evaluator = ProgramPriorEvaluator(config, trainer)

    losses = []
    for iteration in range(10):
        batch = next(trainer._batches)
        logs = trainer._do_iteration(batch)
        trainer._iteration = iteration
        losses.append(float(logs["loss"]))
    assert losses[-1] < losses[0], losses  # LM learns the 7 templates fast

    val_metrics = evaluator.evaluate(num_batches=2)
    assert val_metrics["program_prior"]["perplexity"] > 1.0
    trainer.after_validation(val_metrics, 9)

    ckpt = os.path.join(serialization_dir, "checkpoint_9.ckpt")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(serialization_dir, "checkpoint_best.ckpt"))

    # Publish as the "program_prior_best" for downstream phases.
    shutil.copy(ckpt, os.path.join(root, "program_prior_best.ckpt"))
    pipeline["prior_trained"] = True

    # Resume: fresh trainer restores params + iteration.
    trainer2 = ProgramPriorTrainer(config, serialization_dir)
    trainer2.load_checkpoint(ckpt)
    assert trainer2.iteration == 9
    p_old = np.asarray(trainer.params["program_prior"]["embedding"])
    p_new = np.asarray(trainer2.params["program_prior"]["embedding"])
    np.testing.assert_array_equal(p_old, p_new)


@pytest.mark.parametrize("objective", ["ours", "baseline"])
def test_question_coding_phase(pipeline, objective):
    root = pipeline["root"]
    assert pipeline.get("prior_trained")
    config = make_fixture_config(root, "question_coding", ["OBJECTIVE", objective])
    np.random.seed(config.RANDOM_SEED)
    serialization_dir = os.path.join(root, f"qc_run_{objective}")
    trainer = QuestionCodingTrainer(config, serialization_dir)
    evaluator = QuestionCodingEvaluator(config, trainer)

    baselines = [float(trainer._baseline)]
    for iteration in range(3):
        trainer.step(iteration)
        baselines.append(float(trainer._baseline))

    if objective == "ours":
        # REINFORCE baseline must move under the reference update rule.
        assert baselines[-1] != baselines[0]
    else:
        assert baselines[-1] == baselines[0]

    val_metrics = evaluator.evaluate(num_batches=2)
    for model in ("program_generator", "question_reconstructor"):
        for metric in ("BLEU", "perplexity", "sequence_accuracy", "word_error_rate"):
            assert metric in val_metrics[model]
    trainer.after_validation(val_metrics, 2)

    if objective == "ours":
        shutil.copy(
            os.path.join(serialization_dir, "checkpoint_2.ckpt"),
            os.path.join(root, "question_coding_best.ckpt"),
        )
        pipeline["qc_trained"] = True


def test_supervision_subset_is_seed_deterministic(pipeline):
    root = pipeline["root"]
    from probnmn_tpu.data.datasets import QuestionCodingDataset

    config = make_fixture_config(root, "question_coding")
    np.random.seed(config.RANDOM_SEED)
    d1 = QuestionCodingDataset(config.DATA.TRAIN_TOKENS, 12, 10)
    np.random.seed(config.RANDOM_SEED)
    d2 = QuestionCodingDataset(config.DATA.TRAIN_TOKENS, 12, 10)
    np.testing.assert_array_equal(d1.get_supervision_list(), d2.get_supervision_list())
    assert d1.get_supervision_list().sum() == 12
    # the supervision-weighted sampler yields ~50/50 batches
    from probnmn_tpu.data.samplers import SupervisionWeightedRandomSampler

    sampler = SupervisionWeightedRandomSampler(d1.get_supervision_list(), seed=0)
    draws = np.concatenate([sampler.epoch() for _ in range(50)])
    frac = d1.get_supervision_list()[draws].mean()
    assert 0.4 < frac < 0.6


def test_module_training_phase(pipeline):
    root = pipeline["root"]
    assert pipeline.get("qc_trained")
    config = make_fixture_config(root, "module_training")
    np.random.seed(config.RANDOM_SEED)
    serialization_dir = os.path.join(root, "mt_run")
    trainer = ModuleTrainingTrainer(config, serialization_dir)
    evaluator = ModuleTrainingEvaluator(config, trainer)

    for iteration in range(3):
        trainer.step(iteration)

    val_metrics = evaluator.evaluate(num_batches=2)
    assert 0.0 <= val_metrics["nmn"]["answer_accuracy"] <= 1.0
    assert val_metrics["nmn"]["average_invalid"] >= 0.0
    trainer.after_validation(val_metrics, 2)

    shutil.copy(
        os.path.join(serialization_dir, "checkpoint_2.ckpt"),
        os.path.join(root, "module_training_best.ckpt"),
    )
    pipeline["mt_trained"] = True


@pytest.mark.parametrize("objective", ["ours", "baseline"])
def test_joint_training_phase(pipeline, objective):
    root = pipeline["root"]
    assert pipeline.get("mt_trained")
    config = make_fixture_config(root, "joint_training", ["OBJECTIVE", objective])
    np.random.seed(config.RANDOM_SEED)
    serialization_dir = os.path.join(root, f"jt_run_{objective}")
    trainer = JointTrainingTrainer(config, serialization_dir)
    evaluator = JointTrainingEvaluator(config, trainer)

    for iteration in range(2):
        trainer.step(iteration)

    val_metrics = evaluator.evaluate(num_batches=2)
    assert "answer_accuracy" in val_metrics["nmn"]
    assert "sequence_accuracy" in val_metrics["program_generator"]
    trainer.after_validation(val_metrics, 1)
    # joint trainer warm-started PG from the question-coding checkpoint
    assert trainer.iteration == 1


def test_inference_script(pipeline, tmp_path):
    root = pipeline["root"]
    assert pipeline.get("mt_trained")
    import json
    from scripts import inference

    config_path = os.path.join(root, "inference_config.yml")
    make_fixture_config(root, "joint_training").dump(config_path)

    args = inference.parser.parse_args(
        ["--config-yml", config_path, "--checkpoint-path", os.path.join(root, "module_training_best.ckpt")]
    )
    inference.main(args)
    predictions_path = os.path.join(root, "module_training_best_predictions.json")
    assert os.path.exists(predictions_path)
    predictions = json.load(open(predictions_path))
    assert len(predictions) == 16  # val-size test fixture, batch 8 x 2
    assert {"question_index", "answer"} <= set(predictions[0].keys())


def test_train_script_streaming_features(pipeline, monkeypatch):
    """scripts/train.py --streaming-features end-to-end: the flag must plumb
    in_memory_features=False into the feature-reading trainer AND evaluator,
    and a short module_training run must complete (steps + validation +
    checkpoint) with the streaming readers (reference operates at 50-100 GB
    feature stores, readers.py:86 — in_memory=True is not an option there)."""
    root = pipeline["root"]
    assert pipeline.get("qc_trained")
    from scripts import train as train_script

    config_path = os.path.join(root, "mt_stream_config.yml")
    make_fixture_config(
        root, "module_training", ["OPTIM.NUM_ITERATIONS", 2]
    ).dump(config_path)
    serialization_dir = os.path.join(root, "mt_stream_run")

    seen = {"trainer": None, "evaluator": None}
    orig_trainer = train_script.TRAINERS["module_training"]
    orig_evaluator = train_script.EVALUATORS["module_training"]

    class SpyTrainer(orig_trainer):
        def __init__(self, *a, **kw):
            seen["trainer"] = kw.get("in_memory_features")
            super().__init__(*a, **kw)

    class SpyEvaluator(orig_evaluator):
        def __init__(self, *a, **kw):
            seen["evaluator"] = kw.get("in_memory_features")
            super().__init__(*a, **kw)

    monkeypatch.setitem(train_script.TRAINERS, "module_training", SpyTrainer)
    monkeypatch.setitem(train_script.EVALUATORS, "module_training", SpyEvaluator)

    args = train_script.parser.parse_args([
        "--phase", "module_training",
        "--config-yml", config_path,
        "--serialization-dir", serialization_dir,
        "--checkpoint-every", "2",
        "--num-val-batches", "1",
        "--streaming-features",
    ])
    train_script.main(args)
    assert seen["trainer"] is False
    assert seen["evaluator"] is False
    assert os.path.exists(os.path.join(serialization_dir, "checkpoint_best.ckpt"))


def test_evaluate_script(pipeline):
    """scripts/evaluate.py end-to-end: loads a checkpoint, runs the val split;
    also exercises --compilation-cache-dir (persistent XLA cache wiring)."""
    root = pipeline["root"]
    assert pipeline.get("prior_trained")
    import os

    import jax

    from scripts import evaluate

    config_path = os.path.join(root, "eval_config.yml")
    make_fixture_config(root, "program_prior").dump(config_path)
    cache_dir = os.path.join(root, "xla_cache")
    prev_cache = jax.config.jax_compilation_cache_dir
    args = evaluate.parser.parse_args(
        [
            "--phase", "program_prior",
            "--config-yml", config_path,
            "--checkpoint-path", os.path.join(root, "program_prior_best.ckpt"),
            "--compilation-cache-dir", cache_dir,
        ]
    )
    try:
        evaluate.main(args)  # logs metrics; must not raise
        # The flag routed through: the cache dir was created and configured.
        # (Entry POPULATION is asserted in test_compilation_cache.py with a
        # guaranteed-fresh computation — here earlier tests in the process may
        # have already compiled the evaluator's step functions, in which case
        # no compile happens during this drive and nothing new is written.)
        assert os.path.isdir(cache_dir)
        assert jax.config.jax_compilation_cache_dir == cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_cache)
        from jax.experimental.compilation_cache import compilation_cache as cc

        cc.reset_cache()  # tmp cache dir is deleted after the test


def test_verify_parity_all_phases_from_reference_pth(tmp_path):
    """SURVEY §6 parity protocol, all FOUR phases: synthesize reference-format
    .pth checkpoints (torch-serialized, reference key names — the v1.0 release
    layout), point every cross-phase warm-start at them, and run the full
    verify_parity port->evaluate->tolerance pipeline per phase. Matching
    expectations pass; perturbed expectations fail."""
    import json

    import jax
    from scripts import verify_parity
    from probnmn_tpu.data.vocabulary import Vocabulary
    from probnmn_tpu.models import nmn as nmn_lib
    from tests.ref_checkpoints import (
        make_nmn_state,
        make_prior_state,
        make_seq2seq_state,
        save_reference_pth,
    )

    root = str(tmp_path)
    build_fixture_data(root)
    config = make_fixture_config(root, "program_prior")
    vocab = Vocabulary.from_files(config.DATA.VOCABULARY)
    q_v = vocab.get_vocab_size("questions")
    p_v = vocab.get_vocab_size("programs")
    D, H = config.PROGRAM_PRIOR.INPUT_SIZE, config.PROGRAM_PRIOR.HIDDEN_SIZE
    nmn_spec = nmn_lib.make_spec(vocab, config)

    pg_state = make_seq2seq_state(q_v, p_v, D, H, 1, seed=0)
    qr_state = make_seq2seq_state(p_v, q_v, D, H, 1, seed=1)
    nmn_state = make_nmn_state(vocab, nmn_spec, seed=2)
    prior_pth = os.path.join(root, "program_prior_best.pth")
    qc_pth = os.path.join(root, "question_coding_best.pth")
    mt_pth = os.path.join(root, "module_training_best.pth")
    jt_pth = os.path.join(root, "joint_training_best.pth")
    save_reference_pth(prior_pth, {"program_prior": make_prior_state(p_v, D, H, 1, 3)})
    save_reference_pth(qc_pth, {"program_generator": pg_state,
                                "question_reconstructor": qr_state})
    save_reference_pth(mt_pth, {"nmn": nmn_state})
    save_reference_pth(jt_pth, {"program_generator": pg_state,
                                "question_reconstructor": qr_state,
                                "nmn": nmn_state})

    ckpt_overrides = [
        "CHECKPOINTS.PROGRAM_PRIOR", prior_pth,
        "CHECKPOINTS.QUESTION_CODING", qc_pth,
        "CHECKPOINTS.MODULE_TRAINING", mt_pth,
    ]
    phases = ("program_prior", "question_coding", "module_training", "joint_training")
    config_args, ckpt_args = [], []
    for phase in phases:
        cfg_path = os.path.join(root, f"{phase}_config.yml")
        make_fixture_config(root, phase, ckpt_overrides).dump(cfg_path)
        config_args.append(f"{phase}={cfg_path}")
        ckpt_args.append(f"{phase}=" + {
            "program_prior": prior_pth, "question_coding": qc_pth,
            "module_training": mt_pth, "joint_training": jt_pth,
        }[phase])

    out = os.path.join(root, "report.json")
    base = ["--checkpoints", *ckpt_args, "--configs", *config_args,
            "--num-val-batches", "2"]
    rc = verify_parity.main(verify_parity.parser.parse_args(base + ["--output", out]))
    assert rc == 0
    report = json.load(open(out))
    assert set(report) == set(phases)
    assert report["program_prior"]["program_prior"]["perplexity"] > 1.0
    assert "sequence_accuracy" in report["question_coding"]["program_generator"]
    assert "answer_accuracy" in report["module_training"]["nmn"]
    assert "answer_accuracy" in report["joint_training"]["nmn"]

    # The ported checkpoints evaluate reproducibly: the full report round-trips
    # as --expected at the ±0.5% tolerance...
    assert verify_parity.main(
        verify_parity.parser.parse_args(base + ["--expected", out])
    ) == 0
    # ...and a 50%-off expectation in any phase fails.
    bad = dict(report)
    bad["joint_training"] = {
        "nmn": {"average_invalid": report["joint_training"]["nmn"]["average_invalid"] + 7.0}
    }
    bad_path = os.path.join(root, "bad.json")
    json.dump(bad, open(bad_path, "w"))
    assert verify_parity.main(
        verify_parity.parser.parse_args(base + ["--expected", bad_path])
    ) == 1


def test_verify_parity_script(pipeline, tmp_path):
    """scripts/verify_parity.py: evaluates checkpoints per phase, writes a JSON
    report, and enforces the ±0.5% tolerance against expected metrics."""
    root = pipeline["root"]
    assert pipeline.get("prior_trained")
    import json
    from scripts import verify_parity

    config_path = os.path.join(root, "parity_config.yml")
    make_fixture_config(root, "program_prior").dump(config_path)
    ckpt = os.path.join(root, "program_prior_best.ckpt")
    out = os.path.join(str(tmp_path), "report.json")

    base = [
        "--checkpoints", f"program_prior={ckpt}",
        "--configs", f"program_prior={config_path}",
        "--num-val-batches", "2",
    ]
    rc = verify_parity.main(verify_parity.parser.parse_args(base + ["--output", out]))
    assert rc == 0
    report = json.load(open(out))
    ppl = report["program_prior"]["program_prior"]["perplexity"]
    assert ppl > 1.0

    # Matching expectation passes; a 50%-off expectation fails the tolerance.
    good = os.path.join(str(tmp_path), "good.json")
    json.dump({"program_prior": {"program_prior": {"perplexity": ppl}}}, open(good, "w"))
    assert verify_parity.main(verify_parity.parser.parse_args(base + ["--expected", good])) == 0
    bad = os.path.join(str(tmp_path), "bad.json")
    json.dump({"program_prior": {"program_prior": {"perplexity": ppl * 1.5}}}, open(bad, "w"))
    assert verify_parity.main(verify_parity.parser.parse_args(base + ["--expected", bad])) == 1


def test_train_cli_profile_trace(pipeline, tmp_path):
    """scripts/train.py --profile-dir captures a jax.profiler trace of the
    requested step window (aux tracing subsystem, SURVEY §5)."""
    import glob

    from scripts import train

    root = pipeline["root"]
    config_path = os.path.join(str(tmp_path), "profile_config.yml")
    make_fixture_config(
        root, "program_prior", extra_overrides=["OPTIM.NUM_ITERATIONS", 6]
    ).dump(config_path)
    trace_dir = os.path.join(str(tmp_path), "trace")
    args = train.parser.parse_args([
        "--phase", "program_prior",
        "--config-yml", config_path,
        "--serialization-dir", os.path.join(str(tmp_path), "profile_run"),
        "--checkpoint-every", "6",
        "--num-val-batches", "1",
        "--profile-dir", trace_dir,
        "--profile-steps", "2",
    ])
    train.main(args)
    traces = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True) \
        + glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert traces, f"no trace files under {trace_dir}"

"""Multi-device sharding on the virtual 8-device CPU mesh: mesh construction,
parameter placement rules, and a data-parallel train step with XLA-inserted
gradient all-reduce."""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from probnmn_tpu.models.program_prior import (
    ProgramPriorSpec,
    init_program_prior_params,
    program_prior_forward,
)
from probnmn_tpu.parallel import mesh as mesh_lib
from probnmn_tpu.training.optim import make_optimizer


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    m = mesh_lib.make_mesh(8, model_parallel=2)
    assert dict(m.shape) == {"data": 4, "model": 2}
    m1 = mesh_lib.make_mesh(8)
    assert dict(m1.shape) == {"data": 8, "model": 1}


def test_data_parallel_train_step_matches_single_device():
    spec = ProgramPriorSpec(vocab_size=12, input_size=8, hidden_size=8, num_layers=1)
    params = init_program_prior_params(jax.random.PRNGKey(0), spec)
    tx = make_optimizer(1e-2)
    opt_state = tx.init(params)
    rs = np.random.RandomState(0)
    batch = jnp.asarray(rs.randint(4, 12, (16, 6)), jnp.int32)
    rng = jax.random.PRNGKey(1)

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            return program_prior_forward(p, spec, batch, rng)["loss"].mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # single device
    p1, _, loss1 = jax.jit(train_step)(params, opt_state, batch)

    # 8-way data parallel: batch sharded, params replicated
    m = mesh_lib.make_mesh(8)
    with m:
        sharded_batch = mesh_lib.shard_batch(m, {"x": batch})["x"]
        sharded_params = mesh_lib.shard_params(m, params)
        sharded_opt = tx.init(sharded_params)
        p8, _, loss8 = jax.jit(train_step)(sharded_params, sharded_opt, sharded_batch)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_param_sharding_rules_fall_back_when_not_divisible():
    m = mesh_lib.make_mesh(8, model_parallel=2)
    params = {
        "attention": {"conv1": {"w": jnp.zeros((6, 3, 3, 8, 8))}},  # 6 % 2 == 0 -> sharded
        "same": {"conv": {"w": jnp.zeros((5, 9, 1))}},              # 5 % 2 != 0 -> replicated
    }
    with m:
        placed = mesh_lib.shard_params(m, params)
    att_sharding = placed["attention"]["conv1"]["w"].sharding
    same_sharding = placed["same"]["conv"]["w"].sharding
    assert att_sharding.spec[0] == "model"
    assert all(axis is None for axis in same_sharding.spec)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_production_trainer_dp_matches_single_device(tmp_path):
    """The wired-in mesh path (BatchIterator sharding + _Trainer param placement
    + GSPMD grad all-reduce) reproduces single-device losses, matching the
    capability of reference _trainer.py:92-100 (nn.DataParallel)."""
    import os
    from tests.clevr_fixtures import build_fixture_data, make_fixture_config
    from probnmn_tpu.training.program_prior_trainer import ProgramPriorTrainer

    root = str(tmp_path)
    build_fixture_data(root)
    config = make_fixture_config(root, "program_prior")

    losses = {}
    for nd in (None, 8):
        np.random.seed(config.RANDOM_SEED)
        trainer = ProgramPriorTrainer(
            config, os.path.join(root, f"run_{nd}"), num_devices=nd
        )
        if nd == 8:
            assert trainer.mesh is not None
            assert dict(trainer.mesh.shape) == {"data": 8, "model": 1}
            sh = trainer.params["program_prior"]["embedding"].sharding
            assert sh.mesh.shape == trainer.mesh.shape
        else:
            assert trainer.mesh is None
        ls = []
        for _ in range(3):
            batch = next(trainer._batches)
            if nd == 8:
                assert len(batch["program"].sharding.device_set) == 8
            logs = trainer._do_iteration(batch)
            ls.append(float(logs["loss"]))
        losses[nd] = ls
    np.testing.assert_allclose(losses[None], losses[8], rtol=2e-4)


def test_train_cli_runs_on_mesh(tmp_path):
    """scripts/train.py --num-devices 8 trains end-to-end on the virtual mesh."""
    import os
    from tests.clevr_fixtures import build_fixture_data, make_fixture_config
    from scripts import train

    root = str(tmp_path)
    build_fixture_data(root)
    config_path = os.path.join(root, "config.yml")
    make_fixture_config(
        root, "program_prior", extra_overrides=["OPTIM.NUM_ITERATIONS", 4]
    ).dump(config_path)

    args = train.parser.parse_args(
        [
            "--phase", "program_prior",
            "--config-yml", config_path,
            "--serialization-dir", os.path.join(root, "cli_run"),
            "--num-devices", "8",
            "--checkpoint-every", "4",
            "--num-val-batches", "1",
        ]
    )
    train.main(args)
    assert os.path.exists(os.path.join(root, "cli_run", "checkpoint_3.ckpt"))


def test_module_trainer_fused_nmn_on_mesh_matches_single_device(tmp_path, monkeypatch):
    """The production ModuleTrainingTrainer routes the FUSED Pallas NMN
    interpreter through shard_map when a mesh is active (forced here via
    interpret mode on the CPU mesh) and reproduces single-device losses —
    the flagship training step's multi-chip path, end to end."""
    import os
    from functools import partial

    from tests.clevr_fixtures import build_fixture_data, make_fixture_config
    from probnmn_tpu.data.vocabulary import Vocabulary
    from probnmn_tpu.models import nmn as nmn_lib
    from probnmn_tpu.models import program_generator
    from probnmn_tpu.training.module_training_trainer import ModuleTrainingTrainer
    from probnmn_tpu.utils.checkpointing import save_objects

    root = str(tmp_path)
    build_fixture_data(root)
    config = make_fixture_config(root, "module_training")

    # Synthesize the frozen-PG question_coding checkpoint this phase loads.
    vocab = Vocabulary.from_files(config.DATA.VOCABULARY)
    pg_spec = program_generator.make_spec(vocab, config)
    pg_params = program_generator.init_params(jax.random.PRNGKey(3), pg_spec)
    save_objects(
        os.path.join(root, "question_coding_best.ckpt"),
        {"program_generator": pg_params},
    )

    # Force the fused path on CPU: interpret-mode kernels, availability on.
    monkeypatch.setattr(nmn_lib, "fast_training_available", lambda spec: True)
    monkeypatch.setattr(
        nmn_lib, "nmn_forward_fast", partial(nmn_lib.nmn_forward_fast, interpret=True)
    )

    losses = {}
    for nd in (None, 8):
        np.random.seed(config.RANDOM_SEED)
        trainer = ModuleTrainingTrainer(
            config, os.path.join(root, f"fused_{nd}"), num_devices=nd
        )
        assert (trainer.mesh is not None) == (nd == 8)
        ls = []
        for _ in range(2):
            logs = trainer._do_iteration(next(trainer._batches))
            ls.append(float(logs["loss"]))
        losses[nd] = ls
    np.testing.assert_allclose(losses[None], losses[8], rtol=2e-4)


def test_module_evaluator_fused_nmn_on_mesh_matches_single_device(tmp_path, monkeypatch):
    """The ModuleTrainingEvaluator's fast Pallas path routes through shard_map
    when the trainer runs on a mesh (forced via interpret mode on the CPU
    mesh) and reproduces single-device metrics."""
    import os
    from functools import partial

    from tests.clevr_fixtures import build_fixture_data, make_fixture_config
    from probnmn_tpu.data.vocabulary import Vocabulary
    from probnmn_tpu.evaluators.module_training_evaluator import ModuleTrainingEvaluator
    from probnmn_tpu.models import nmn as nmn_lib
    from probnmn_tpu.models import program_generator
    from probnmn_tpu.ops import common as ops_common
    from probnmn_tpu.training.module_training_trainer import ModuleTrainingTrainer
    from probnmn_tpu.utils.checkpointing import save_objects

    root = str(tmp_path)
    build_fixture_data(root)
    config = make_fixture_config(root, "module_training")
    vocab = Vocabulary.from_files(config.DATA.VOCABULARY)
    pg_spec = program_generator.make_spec(vocab, config)
    save_objects(
        os.path.join(root, "question_coding_best.ckpt"),
        {"program_generator": program_generator.init_params(jax.random.PRNGKey(3), pg_spec)},
    )

    # Force the evaluator's fast path on CPU: availability on, interpret mode.
    monkeypatch.setattr(ops_common, "tpu_fused_kernels_supported", lambda: True)
    monkeypatch.setattr(
        nmn_lib, "fast_forward_from_tables",
        partial(nmn_lib.fast_forward_from_tables, interpret=True),
    )
    # The fixture's module_channels (8) fail the %128 gate; drop it for the test.
    import probnmn_tpu.evaluators.module_training_evaluator as ev_mod
    results = {}
    for nd in (None, 8):
        np.random.seed(config.RANDOM_SEED)
        trainer = ModuleTrainingTrainer(
            config, os.path.join(root, f"ev_fused_{nd}"), num_devices=nd
        )
        evaluator = ModuleTrainingEvaluator(config, trainer)
        evaluator._use_fast = True  # bypass the %128 lane gate at fixture scale
        results[nd] = evaluator.evaluate(num_batches=2)
    a, b = results[None]["nmn"], results[8]["nmn"]
    np.testing.assert_allclose(a["answer_accuracy"], b["answer_accuracy"], rtol=1e-6)
    np.testing.assert_allclose(a["average_invalid"], b["average_invalid"], rtol=1e-6)


def test_evaluate_and_inference_cli_on_mesh(tmp_path):
    """scripts/evaluate.py and scripts/inference.py run with --num-devices 8
    on the virtual mesh (val/test batches sharded over the data axis)."""
    import json
    import os

    import jax
    from tests.clevr_fixtures import build_fixture_data, make_fixture_config
    from probnmn_tpu.data.vocabulary import Vocabulary
    from probnmn_tpu.models import nmn as nmn_lib
    from probnmn_tpu.models import program_generator
    from probnmn_tpu.training.program_prior_trainer import ProgramPriorTrainer
    from probnmn_tpu.utils.checkpointing import save_objects
    from scripts import evaluate, inference

    root = str(tmp_path)
    build_fixture_data(root)

    # evaluate: program_prior phase from a fresh-trainer checkpoint.
    config_path = os.path.join(root, "eval_config.yml")
    make_fixture_config(root, "program_prior").dump(config_path)
    np.random.seed(0)
    trainer = ProgramPriorTrainer(
        make_fixture_config(root, "program_prior"), os.path.join(root, "seed_run")
    )
    ckpt = os.path.join(root, "prior.ckpt")
    save_objects(ckpt, dict(trainer.params))
    evaluate.main(evaluate.parser.parse_args([
        "--phase", "program_prior", "--config-yml", config_path,
        "--checkpoint-path", ckpt, "--num-devices", "8",
    ]))

    # inference: joint-style checkpoint served with a sharded engine.
    vocab = Vocabulary.from_files(os.path.join(root, "vocab"))
    config = make_fixture_config(root, "joint_training")
    pg_spec = program_generator.make_spec(vocab, config)
    nmn_spec = nmn_lib.make_spec(vocab, config)
    jt_ckpt = os.path.join(root, "jt.ckpt")
    save_objects(jt_ckpt, {
        "program_generator": program_generator.init_params(jax.random.PRNGKey(0), pg_spec),
        "nmn": nmn_lib.init_nmn_params(jax.random.PRNGKey(1), nmn_spec),
    })
    inf_config = os.path.join(root, "inf_config.yml")
    config.dump(inf_config)
    inference.main(inference.parser.parse_args([
        "--config-yml", inf_config, "--checkpoint-path", jt_ckpt,
        "--num-devices", "8",
    ]))
    predictions = json.load(open(os.path.join(root, "jt_predictions.json")))
    assert len(predictions) == 16
    assert {"question_index", "answer"} <= set(predictions[0].keys())


def test_auto_mesh_policy():
    from probnmn_tpu.parallel.mesh import auto_mesh

    assert auto_mesh(None) is None          # default: single device (like --gpu-ids 0)
    assert auto_mesh(1) is None
    m = auto_mesh(0, batch_size=16)         # 0 = all devices
    assert dict(m.shape) == {"data": 8, "model": 1}
    m = auto_mesh(8, batch_size=12)         # clamp to the largest divisor of batch
    assert dict(m.shape) == {"data": 6, "model": 1}


def test_evaluator_on_mesh_matches_single_device(tmp_path):
    """Evaluation shards val batches over the trainer's mesh and reproduces
    single-device metrics."""
    import os
    from tests.clevr_fixtures import build_fixture_data, make_fixture_config
    from probnmn_tpu.evaluators.program_prior_evaluator import ProgramPriorEvaluator
    from probnmn_tpu.training.program_prior_trainer import ProgramPriorTrainer

    root = str(tmp_path)
    build_fixture_data(root)
    config = make_fixture_config(root, "program_prior")
    results = {}
    for nd in (None, 8):
        np.random.seed(config.RANDOM_SEED)
        trainer = ProgramPriorTrainer(
            config, os.path.join(root, f"ev_{nd}"), num_devices=nd
        )
        evaluator = ProgramPriorEvaluator(config, trainer)
        results[nd] = evaluator.evaluate(num_batches=2)
    a = results[None]["program_prior"]["perplexity"]
    b = results[8]["program_prior"]["perplexity"]
    np.testing.assert_allclose(a, b, rtol=1e-4)

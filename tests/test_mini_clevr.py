"""Mini-CLEVR synthetic task (outcome-level convergence harness) invariants.

The task only proves anything about the REINFORCE/ELBO dynamics if its labels
are exact: every generated program must be VALID under the neural register
machine (reference ``nmn.py:197-238`` semantics), every answer must follow
from the scene by the same semantics, and the artifacts must flow through the
production data stack unchanged.
"""
import os

import numpy as np
import pytest

from probnmn_tpu.data import mini_clevr as mc
from probnmn_tpu.utils.clevr import make_clevr_like_vocabulary


@pytest.fixture(scope="module")
def vocab():
    return make_clevr_like_vocabulary()


def _gen_examples(n_scenes, seed=0, per_scene=2):
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(n_scenes):
        scene = mc.sample_scene(rs)
        for _ in range(per_scene):
            ex = mc.generate_example(rs, scene)
            if ex is not None:
                out.append((scene,) + ex)
    return out


def test_generated_tokens_always_in_vocabulary(vocab):
    unk_q = vocab.get_token_index("@@UNKNOWN@@", "questions")
    unk_p = vocab.get_token_index("@@UNKNOWN@@", "programs")
    for _, program, question, answer in _gen_examples(100):
        assert all(vocab.get_token_index(t, "programs") != unk_p for t in program)
        assert all(vocab.get_token_index(w, "questions") != unk_q for w in question)
        # answers is a non-padded namespace with @@UNKNOWN@@ appended last
        idx = vocab.get_token_index(answer, "answers")
        assert vocab.get_token_from_index(idx, "answers") == answer


def test_every_program_valid_under_neural_register_machine(vocab):
    """The symbolic executor's generation-time rejection must be at least as
    strict as the neural machine's invalid-program rules — a mini-CLEVR
    example marked valid symbolically but invalid neurally would train the
    NMN toward loss 3.33/@@UNKNOWN@@ on a 'correct' label."""
    import jax

    from probnmn_tpu.models import nmn as nmn_lib

    class _Cfg:  # minimal config surface for make_spec
        class NMN:
            IMAGE_FEATURE_SIZE = [mc.FEATURE_CHANNELS, 6, 6]
            MODULE_CHANNELS = 8
            CLASS_PROJECTION_CHANNELS = 16
            CLASSIFIER_LINEAR_SIZE = 12

    spec = nmn_lib.make_spec(vocab, _Cfg)
    params = nmn_lib.init_nmn_params(jax.random.PRNGKey(0), spec)

    examples = _gen_examples(60, seed=3)
    width = max(len(p) for _, p, _, _ in examples)
    ids = np.zeros((len(examples), width), np.int32)
    for i, (_, program, _, _) in enumerate(examples):
        ids[i, : len(program)] = [
            vocab.get_token_index(t, "programs") for t in program
        ]
    feats = np.random.RandomState(0).randn(len(examples), 6, 6, mc.FEATURE_CHANNELS)
    stem = nmn_lib.apply_stem(params["stem"], feats.astype(np.float32))
    _, invalid = jax.jit(
        lambda s, p: nmn_lib.execute_programs(params, spec, s, p)
    )(stem, ids)
    assert not bool(np.asarray(invalid).any()), (
        "mini-CLEVR emitted a program the neural machine rejects: "
        f"{[examples[i][1] for i in np.nonzero(np.asarray(invalid))[0]]}"
    )


def test_executor_ground_truth_on_hand_built_scene():
    scene = [
        {"row": 2, "col": 2, "color": "red", "material": "metal",
         "shape": "cube", "size": "large"},
        {"row": 2, "col": 8, "color": "blue", "material": "rubber",
         "shape": "sphere", "size": "small"},
        {"row": 8, "col": 5, "color": "red", "material": "rubber",
         "shape": "cylinder", "size": "small"},
    ]
    ex = mc.execute_program
    assert ex(["count", "filter_color[red]", "scene"], scene) == "2"
    assert ex(["exist", "filter_shape[sphere]", "scene"], scene) == "yes"
    assert ex(["exist", "filter_color[green]", "scene"], scene) == "no"
    assert ex(["query_shape", "unique", "filter_color[blue]", "scene"], scene) == "sphere"
    # relate: objects right of the red cube (col > 2): sphere and cylinder
    assert ex(["count", "relate[right]", "unique",
               "filter_shape[cube]", "scene"], scene) == "2"
    # same_color as the cube: the cylinder (red), excluding the anchor
    assert ex(["query_shape", "unique", "same_color", "unique",
               "filter_shape[cube]", "scene"], scene) == "cylinder"
    # behind = smaller row: nothing is behind the cube (row 2 ties don't count)
    assert ex(["count", "relate[behind]", "unique",
               "filter_shape[cube]", "scene"], scene) == "0"
    assert ex(["equal_color",
               "query_color", "unique", "filter_shape[cube]", "scene",
               "query_color", "unique", "filter_shape[cylinder]", "scene"],
              scene) == "yes"
    # first prefix argument is `a` in a<b: count(blue)=1 vs count(red)=2
    assert ex(["less_than", "count", "filter_color[blue]", "scene",
               "count", "filter_color[red]", "scene"], scene) == "yes"
    assert ex(["greater_than", "count", "filter_color[blue]", "scene",
               "count", "filter_color[red]", "scene"], scene) == "no"
    assert ex(["count", "union", "filter_color[red]", "scene",
               "filter_shape[sphere]", "scene"], scene) == "3"
    assert ex(["count", "intersect", "filter_color[red]", "scene",
               "filter_material[rubber]", "scene"], scene) == "1"
    # ill-defined under strict semantics: query over two objects
    assert ex(["query_shape", "unique", "filter_color[red]", "scene"], scene) is None
    # final attention => invalid (reference nmn.py:231-232)
    assert ex(["filter_color[red]", "scene"], scene) is None


def test_question_program_mapping_is_deterministic_and_distinct():
    """Distinct programs must map to distinct questions (injectivity on the
    emitted population) or q(z|x) has no exact function to learn."""
    examples = _gen_examples(400, seed=7)
    q_to_p = {}
    for _, program, question, _ in examples:
        key = tuple(question)
        prog = tuple(program)
        assert q_to_p.setdefault(key, prog) == prog, (
            f"question {' '.join(key)} maps to two programs"
        )
        # deterministic rendering
        assert mc.question_for_program(program) == list(question)


def test_write_mini_clevr_flows_through_production_datasets(tmp_path):
    from probnmn_tpu.data.datasets import (
        ModuleTrainingDataset,
        QuestionCodingDataset,
    )

    root = str(tmp_path / "mini")
    vocab = mc.write_mini_clevr(
        root, n_train_images=20, n_val_images=8, n_test_images=4,
        questions_per_image=2, seed=0, height=6, width=6,
    )
    qc = QuestionCodingDataset(
        os.path.join(root, "train_tokens.h5"), num_supervision=10,
        supervision_question_max_length=40,
    )
    assert len(qc) == 40
    batch = qc.get_batch(np.arange(8))
    assert batch["supervision"].sum() <= 10

    mt = ModuleTrainingDataset(
        os.path.join(root, "train_tokens.h5"),
        os.path.join(root, "train_features.h5"),
    )
    batch = mt.get_batch(np.arange(4))
    assert batch["image"].shape == (4, mc.FEATURE_CHANNELS, 6, 6)

    # Every stored (program, answer) pair re-validates against its image's
    # scene-free executor contract: decode ids back to tokens and check the
    # answer namespace id round-trips.
    import h5py

    with h5py.File(os.path.join(root, "train_tokens.h5"), "r") as f:
        programs = f["programs"][:]
        answers = f["answers"][:]
    for row, ans_id in zip(programs[:10], answers[:10]):
        toks = [vocab.get_token_from_index(int(i), "programs")
                for i in row if i != 0]
        assert toks[-1] == "scene"
        assert vocab.get_token_from_index(int(ans_id), "answers") != "@@UNKNOWN@@"


def test_run_mini_clevr_hparam_overrides_apply_last(tmp_path):
    """--hparam KEY VALUE lands after the per-phase table (run_mini_clevr.py
    phase_config), so production recipe adaptations like ALPHA=500 stick."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import run_mini_clevr as rmc

    args = rmc.parser.parse_args([
        "--root", str(tmp_path / "data"), "--runs", str(tmp_path / "runs"),
        "--hparam", "ALPHA", "500.0",
        "--hparam", "OPTIM.LR_INITIAL", "0.0005",
    ])
    config = rmc.phase_config(args, "question_coding", 100)
    assert config.ALPHA == 500.0          # per-phase table says 100.0
    assert config.OPTIM.LR_INITIAL == 0.0005
    assert config.OPTIM.NUM_ITERATIONS == 100
    # no hparams -> per-phase table untouched
    args0 = rmc.parser.parse_args(
        ["--root", str(tmp_path / "d2"), "--runs", str(tmp_path / "r2")]
    )
    assert rmc.phase_config(args0, "question_coding", 100).ALPHA == 100.0

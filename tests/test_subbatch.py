"""Static supervised/unsupervised sub-batch windows (training/_subbatch.py).

The semi-supervised trainers sort each batch supervised-first and run every
pass on a static head/tail window, reproducing the reference's per-subset
passes (reference question_coding_trainer.py:112-113,
joint_training_trainer.py:131-132) with jit-static shapes. The windowed step
must be numerically equivalent to the full-batch masked step whenever the
counts fit the windows, and the trainers must fall back to the full-batch step
when they don't.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probnmn_tpu.training import _subbatch
from tests.clevr_fixtures import build_fixture_data, make_fixture_config

BATCH = 32  # cap = 24: windows genuinely smaller than the batch


def test_subbatch_cap_values():
    from probnmn_tpu.parallel import mesh as mesh_lib

    assert _subbatch.subbatch_cap(256, None) == 192
    assert _subbatch.subbatch_cap(32, None) == 24
    # Tiny batches: the rounded cap reaches the batch -> windowing off.
    assert _subbatch.subbatch_cap(8, None) is None
    m = mesh_lib.make_mesh(8)
    cap = _subbatch.subbatch_cap(256, m)
    assert cap == 192 and cap % 8 == 0  # divides over the data axis
    assert _subbatch.subbatch_cap(32, m) == 24

    assert _subbatch.fits(10, 32, 24)
    assert not _subbatch.fits(25, 32, 24)   # supervised overflow
    assert not _subbatch.fits(4, 32, 24)    # unsupervised overflow (28 > 24)
    assert not _subbatch.fits(None, 32, 24)
    assert not _subbatch.fits(10, 32, None)


def test_batch_iterator_sorts_and_attaches_count(tmp_path):
    from probnmn_tpu.data.datasets import QuestionCodingDataset
    from probnmn_tpu.data.pipeline import BatchIterator
    from probnmn_tpu.data.samplers import SupervisionWeightedRandomSampler

    root = str(tmp_path)
    build_fixture_data(root, n_train=96)
    config = make_fixture_config(root, "question_coding",
                                 ["SUPERVISION", 48, "OPTIM.BATCH_SIZE", BATCH])
    np.random.seed(config.RANDOM_SEED)
    dataset = QuestionCodingDataset(config.DATA.TRAIN_TOKENS, num_supervision=48)
    sampler = SupervisionWeightedRandomSampler(dataset.get_supervision_list(), seed=0)
    it = iter(BatchIterator(dataset, sampler, BATCH,
                            sort_descending_by=_subbatch.SORT_KEY))
    for _ in range(3):
        batch = next(it)
        n_sup = batch.pop(_subbatch.COUNT_KEY)
        assert isinstance(n_sup, int)  # host metadata, not a device array
        sup = np.asarray(batch["supervision"])
        assert int(sup.sum()) == n_sup
        assert (np.diff(sup) <= 0).all()  # supervised-first
        assert 0 < n_sup < BATCH  # the 50/50 sampler mixes both subsets


def _degenerate_sampling_params(params, token_index=5):
    """Output projection forced to a huge margin on one token: the sampling
    decode emits that token with probability ~1 regardless of the noise draw,
    making the free-running passes independent of the rng's SHAPE — which is
    the only thing that differs between the windowed and full-batch steps."""
    proj = params["program_generator"]["output_projection"]
    b = np.full(proj["b"].shape, -1e4, np.float32)
    b[token_index] = 1e4
    params = dict(params)
    params["program_generator"] = dict(params["program_generator"])
    params["program_generator"]["output_projection"] = {
        "w": jnp.zeros_like(proj["w"]),
        "b": jnp.asarray(b),
    }
    return params


def _fitting_batch(trainer):
    while True:
        batch = next(trainer._batches)
        n_sup = batch.pop(_subbatch.COUNT_KEY)
        if _subbatch.fits(n_sup, BATCH, trainer._sub_cap):
            return batch


def _run_step(step, trainer, batch, params):
    out = step(
        params, trainer._opt_state, trainer._baseline, jax.random.PRNGKey(7),
        batch, trainer._prior_params,
    )
    new_params, _, new_baseline, logs = out
    return new_params, float(new_baseline), logs


@pytest.mark.parametrize("phase", ["question_coding", "joint_training"])
def test_windowed_step_matches_full_batch(tmp_path, phase):
    from probnmn_tpu.training.program_prior_trainer import make_prior_spec
    from probnmn_tpu.utils.checkpointing import save_objects
    from probnmn_tpu.data.vocabulary import Vocabulary
    from probnmn_tpu.models import nmn as nmn_lib
    from probnmn_tpu.models import program_generator, question_reconstructor
    from probnmn_tpu.models.program_prior import init_program_prior_params

    root = str(tmp_path)
    build_fixture_data(root, n_train=96)
    config = make_fixture_config(root, phase,
                                 ["SUPERVISION", 48, "OPTIM.BATCH_SIZE", BATCH])
    np.random.seed(config.RANDOM_SEED)
    vocab = Vocabulary.from_files(config.DATA.VOCABULARY)

    # Fresh-init upstream checkpoints (only shapes matter here).
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    save_objects(config.CHECKPOINTS.PROGRAM_PRIOR, {
        "program_prior": init_program_prior_params(k1, make_prior_spec(config, vocab)),
    })
    save_objects(config.CHECKPOINTS.QUESTION_CODING, {
        "program_generator": program_generator.init_params(
            k2, program_generator.make_spec(vocab, config)),
        "question_reconstructor": question_reconstructor.init_params(
            k3, question_reconstructor.make_spec(vocab, config)),
    })
    save_objects(config.CHECKPOINTS.MODULE_TRAINING, {
        "nmn": nmn_lib.init_nmn_params(k4, nmn_lib.make_spec(vocab, config)),
    })

    if phase == "question_coding":
        from probnmn_tpu.training.question_coding_trainer import QuestionCodingTrainer

        trainer = QuestionCodingTrainer(config, os.path.join(root, "run"))
    else:
        from probnmn_tpu.training.joint_training_trainer import JointTrainingTrainer

        trainer = JointTrainingTrainer(config, os.path.join(root, "run"))
    assert trainer._sub_cap == 24

    params = _degenerate_sampling_params(trainer._params)
    batch = _fitting_batch(trainer)

    full_step = trainer._build_step_fn(None)
    p_win, b_win, logs_win = _run_step(trainer._train_step, trainer, batch, params)
    p_full, b_full, logs_full = _run_step(full_step, trainer, batch, params)

    np.testing.assert_allclose(b_win, b_full, rtol=1e-5, atol=1e-6)
    for lw, lf in zip(jax.tree_util.tree_leaves(logs_win),
                      jax.tree_util.tree_leaves(logs_full)):
        np.testing.assert_allclose(np.asarray(lw), np.asarray(lf),
                                   rtol=2e-4, atol=1e-5)
    flat_w = jax.tree_util.tree_leaves(p_win)
    flat_f = jax.tree_util.tree_leaves(p_full)
    for aw, af in zip(flat_w, flat_f):
        np.testing.assert_allclose(np.asarray(aw), np.asarray(af),
                                   rtol=2e-4, atol=2e-5)


def test_overflow_falls_back_to_full_step(tmp_path):
    """Fully-supervised data: every batch overflows the supervised window, so
    _select_step must hand back the lazily-built full-batch step."""
    from probnmn_tpu.models.program_prior import init_program_prior_params
    from probnmn_tpu.training.program_prior_trainer import make_prior_spec
    from probnmn_tpu.training.question_coding_trainer import QuestionCodingTrainer
    from probnmn_tpu.utils.checkpointing import save_objects
    from probnmn_tpu.data.vocabulary import Vocabulary

    root = str(tmp_path)
    build_fixture_data(root, n_train=96)
    config = make_fixture_config(root, "question_coding",
                                 ["SUPERVISION", 96, "OPTIM.BATCH_SIZE", BATCH])
    np.random.seed(config.RANDOM_SEED)
    vocab = Vocabulary.from_files(config.DATA.VOCABULARY)
    save_objects(config.CHECKPOINTS.PROGRAM_PRIOR, {
        "program_prior": init_program_prior_params(
            jax.random.PRNGKey(0), make_prior_spec(config, vocab)),
    })
    trainer = QuestionCodingTrainer(config, os.path.join(root, "run"))
    assert trainer._sub_cap == 24
    assert trainer._train_step_full is None
    trainer.step(0)  # n_sup == BATCH > cap -> full-batch fallback compiled
    assert trainer._train_step_full is not None
    assert trainer._train_step_full is not trainer._train_step


def test_windowed_qc_on_mesh_matches_single_device(tmp_path):
    """The windowed step composes with the data mesh: slicing the sharded batch
    plus the shard_map DP kernels reproduces single-device results."""
    from probnmn_tpu.models.program_prior import init_program_prior_params
    from probnmn_tpu.training.program_prior_trainer import make_prior_spec
    from probnmn_tpu.training.question_coding_trainer import QuestionCodingTrainer
    from probnmn_tpu.utils.checkpointing import save_objects
    from probnmn_tpu.data.vocabulary import Vocabulary

    root = str(tmp_path)
    build_fixture_data(root, n_train=96)
    config = make_fixture_config(root, "question_coding",
                                 ["SUPERVISION", 48, "OPTIM.BATCH_SIZE", BATCH])
    vocab = Vocabulary.from_files(config.DATA.VOCABULARY)
    save_objects(config.CHECKPOINTS.PROGRAM_PRIOR, {
        "program_prior": init_program_prior_params(
            jax.random.PRNGKey(0), make_prior_spec(config, vocab)),
    })
    losses = {}
    for nd in (None, 8):
        np.random.seed(config.RANDOM_SEED)
        trainer = QuestionCodingTrainer(
            config, os.path.join(root, f"run_{nd}"), num_devices=nd
        )
        assert trainer._sub_cap == 24
        ls = []
        for _ in range(2):
            logs = trainer._do_iteration(next(trainer._batches))
            ls.append(float(logs["loss"]["program_generation_gt"]))
        losses[nd] = ls
    np.testing.assert_allclose(losses[None], losses[8], rtol=2e-4)

"""Interpret-mode equivalence of the fused Pallas NMN interpreter against the
XLA register machine (which itself is validated against a torch reference
interpreter in test_nmn.py). On-device equivalence is additionally exercised by
bench/verify runs on real TPU hardware."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probnmn_tpu.data.vocabulary import SPECIAL_TOKENS, Vocabulary
from probnmn_tpu.models import nmn
from probnmn_tpu.ops.pallas.nmn_interpreter import (
    build_kernel_tables,
    execute_programs_pallas,
)

from tests.test_nmn import PROGRAM_CASES, PROGRAM_TOKENS, _programs


@pytest.fixture(scope="module")
def setup():
    vocab = Vocabulary(
        {
            "questions": SPECIAL_TOKENS + ["w"],
            "programs": PROGRAM_TOKENS,
            "answers": [f"a{i}" for i in range(5)] + ["@@UNKNOWN@@"],
        }
    )
    spec = nmn.make_spec(vocab)
    spec.feature_channels = 12
    spec.height = spec.width = 6
    spec.module_channels = 8
    spec.class_projection_channels = 16
    spec.classifier_linear_size = 10
    params = nmn.init_nmn_params(jax.random.PRNGKey(0), spec)
    return vocab, spec, params


def test_pallas_interpreter_matches_xla_machine(setup):
    vocab, spec, params = setup
    programs = jnp.asarray(_programs(vocab, PROGRAM_CASES))
    rs = np.random.RandomState(0)
    feats = jnp.asarray(
        rs.randn(len(PROGRAM_CASES), spec.height, spec.width, spec.feature_channels)
        .astype(np.float32)
    )
    stem = nmn.apply_stem(params["stem"], feats)
    ref_out, ref_invalid = nmn.execute_programs(params, spec, stem, programs)

    banks, tables = build_kernel_tables(params, spec, dtype=jnp.float32)
    out, invalid = execute_programs_pallas(
        banks, tables, spec, stem, programs, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(invalid), np.asarray(ref_invalid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)


def test_fast_inference_fn_matches_nmn_forward(setup):
    vocab, spec, params = setup
    programs = jnp.asarray(_programs(vocab, PROGRAM_CASES))
    rs = np.random.RandomState(1)
    feats = jnp.asarray(
        rs.randn(len(PROGRAM_CASES), spec.height, spec.width, spec.feature_channels)
        .astype(np.float32)
    )
    answers = jnp.asarray(rs.randint(0, spec.num_answers, (len(PROGRAM_CASES),)))

    ref = nmn.nmn_forward(params, spec, feats, programs, answers)
    fast = nmn.make_fast_inference_fn(params, spec, interpret=True)
    out = fast(feats, programs, answers)

    np.testing.assert_array_equal(np.asarray(out["invalid"]), np.asarray(ref["invalid"]))
    np.testing.assert_array_equal(
        np.asarray(out["predictions"]), np.asarray(ref["predictions"])
    )
    np.testing.assert_allclose(np.asarray(out["loss"]), np.asarray(ref["loss"]), atol=1e-5)


def test_fused_lstm_layer_matches_scan():
    """Experimental fused LSTM kernel == the scan reference (interpret mode)."""
    from probnmn_tpu.ops import rnn
    from probnmn_tpu.ops.pallas.lstm import lstm_encode_pallas

    B, T, D, H, L = 4, 7, 8, 12, 2
    params = rnn.init_lstm_params(jax.random.PRNGKey(0), D, H, L)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    lengths = np.array([7, 5, 3, 1])
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    ref_out, ref_finals = rnn.lstm_encode(params, x, mask)
    out, finals = lstm_encode_pallas(params, x, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    for layer in range(L):
        np.testing.assert_allclose(
            np.asarray(finals[layer][0]), np.asarray(ref_finals[layer][0]), atol=1e-5
        )

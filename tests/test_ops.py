"""Numerical parity of core ops against torch (CPU) and behavioral spec tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from probnmn_tpu.ops import rnn
from probnmn_tpu.ops.common import (
    add_boundary,
    sequence_cross_entropy,
    trim_at_end,
    sample_with_blocked_tokens,
    length_normalized_logprob_loss,
)


def _to_torch_lstm(params, input_size, hidden_size, num_layers):
    m = torch.nn.LSTM(input_size, hidden_size, num_layers, batch_first=True)
    state = {}
    for layer, p in enumerate(params):
        state[f"weight_ih_l{layer}"] = torch.tensor(np.asarray(p["w_ih"]))
        state[f"weight_hh_l{layer}"] = torch.tensor(np.asarray(p["w_hh"]))
        state[f"bias_ih_l{layer}"] = torch.tensor(np.asarray(p["b_ih"]))
        state[f"bias_hh_l{layer}"] = torch.tensor(np.asarray(p["b_hh"]))
    m.load_state_dict(state)
    return m


def test_lstm_matches_torch_packed_semantics():
    B, T, D, H, L = 4, 7, 8, 12, 2
    key = jax.random.PRNGKey(0)
    params = rnn.init_lstm_params(key, D, H, L)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    lengths = np.array([7, 5, 3, 1])
    mask = np.arange(T)[None, :] < lengths[:, None]

    out, finals = rnn.lstm_encode(params, x, jnp.asarray(mask))

    m = _to_torch_lstm(params, D, H, L)
    xt = torch.tensor(np.asarray(x))
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        xt, torch.tensor(lengths), batch_first=True, enforce_sorted=False
    )
    pout, (hn, cn) = m(packed)
    tout, _ = torch.nn.utils.rnn.pad_packed_sequence(pout, batch_first=True, total_length=T)

    np.testing.assert_allclose(np.asarray(out), tout.detach().numpy(), atol=1e-5)
    # final states per layer == packed LSTM final states
    for layer in range(L):
        np.testing.assert_allclose(
            np.asarray(finals[layer][0]), hn[layer].detach().numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(finals[layer][1]), cn[layer].detach().numpy(), atol=1e-5
        )


def test_lstm_cell_matches_torch():
    B, D, H = 3, 10, 6
    params = rnn.init_lstm_cell_params(jax.random.PRNGKey(0), D, H)
    cell = torch.nn.LSTMCell(D, H)
    cell.load_state_dict(
        {
            "weight_ih": torch.tensor(np.asarray(params["w_ih"])),
            "weight_hh": torch.tensor(np.asarray(params["w_hh"])),
            "bias_ih": torch.tensor(np.asarray(params["b_ih"])),
            "bias_hh": torch.tensor(np.asarray(params["b_hh"])),
        }
    )
    x = np.random.RandomState(0).randn(B, D).astype(np.float32)
    h0 = np.random.RandomState(1).randn(B, H).astype(np.float32)
    c0 = np.random.RandomState(2).randn(B, H).astype(np.float32)
    h, c = rnn.lstm_cell(params, jnp.asarray(x), (jnp.asarray(h0), jnp.asarray(c0)))
    ht, ct = cell(torch.tensor(x), (torch.tensor(h0), torch.tensor(c0)))
    np.testing.assert_allclose(np.asarray(h), ht.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), ct.detach().numpy(), atol=1e-5)


def test_add_boundary():
    tokens = jnp.array([[5, 6, 7, 0, 0], [9, 0, 0, 0, 0], [4, 4, 4, 4, 4]])
    out = add_boundary(tokens, pad_index=0, start_index=2, end_index=3)
    expected = np.array(
        [
            [2, 5, 6, 7, 3, 0, 0],
            [2, 9, 3, 0, 0, 0, 0],
            [2, 4, 4, 4, 4, 4, 3],
        ]
    )
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_sequence_cross_entropy_matches_manual():
    B, T, V = 3, 5, 11
    rs = np.random.RandomState(0)
    logits = rs.randn(B, T, V).astype(np.float32)
    targets = rs.randint(0, V, (B, T))
    weights = (rs.rand(B, T) > 0.3).astype(np.float32)

    got = sequence_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights))

    lp = torch.log_softmax(torch.tensor(logits), dim=-1)
    nll = -lp.gather(-1, torch.tensor(targets).unsqueeze(-1)).squeeze(-1)
    expected = (nll * torch.tensor(weights)).sum(-1) / (torch.tensor(weights).sum(-1) + 1e-13)
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-5)


def test_trim_at_end_reference_semantics():
    end = 3
    preds = jnp.array(
        [
            [5, 6, 3, 9, 9],   # trim after first @end@ (inclusive)
            [3, 5, 6, 7, 8],   # @end@ at position 0 -> all zeros
            [5, 6, 7, 8, 9],   # no @end@ -> kept whole
            [5, 3, 3, 5, 3],   # only first @end@ matters
        ]
    )
    out = np.asarray(trim_at_end(preds, end))
    expected = np.array(
        [
            [5, 6, 3, 0, 0],
            [0, 0, 0, 0, 0],
            [5, 6, 7, 8, 9],
            [5, 3, 0, 0, 0],
        ]
    )
    np.testing.assert_array_equal(out, expected)


def test_sampling_never_emits_blocked_tokens():
    V = 10
    logits = jnp.ones((512, V)) * 2.0
    samples = sample_with_blocked_tokens(jax.random.PRNGKey(0), logits, (0, 1, 2))
    assert not np.isin(np.asarray(samples), [0, 1, 2]).any()
    # distribution over the remaining tokens is ~uniform
    counts = np.bincount(np.asarray(samples), minlength=V)
    assert counts[3:].min() > 20


def test_length_normalized_logprob_loss():
    logprobs = jnp.array([[-1.0, -2.0, -3.0], [-1.0, -1.0, -1.0]])
    preds = jnp.array([[5, 3, 0], [0, 0, 0]])  # second row fully padded
    loss = np.asarray(length_normalized_logprob_loss(logprobs, preds, pad_index=0))
    np.testing.assert_allclose(loss[0], (1.0 + 2.0) / 2, rtol=1e-6)
    np.testing.assert_allclose(loss[1], 0.0, atol=1e-6)


def test_lstm_interlayer_dropout_torch_semantics():
    """Dropout applies between layers (not after the last), training only."""
    B, T, D, H, L = 3, 5, 6, 8, 2
    params = rnn.init_lstm_params(jax.random.PRNGKey(0), D, H, L)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))
    mask = jnp.ones((B, T), bool)

    out_eval, _ = rnn.lstm_encode(params, x, mask, dropout=0.5, dropout_rng=None)
    out_ref, _ = rnn.lstm_encode(params, x, mask)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_ref))  # eval = no-op

    out_a, _ = rnn.lstm_encode(params, x, mask, dropout=0.5, dropout_rng=jax.random.PRNGKey(2))
    out_b, _ = rnn.lstm_encode(params, x, mask, dropout=0.5, dropout_rng=jax.random.PRNGKey(3))
    assert (np.asarray(out_a) != np.asarray(out_ref)).any()   # training changes outputs
    assert (np.asarray(out_a) != np.asarray(out_b)).any()     # rng-dependent
    # single layer: no dropout position exists -> identical to eval
    one_layer = [params[0]]
    o1, _ = rnn.lstm_encode(one_layer, x, mask, dropout=0.5, dropout_rng=jax.random.PRNGKey(2))
    o2, _ = rnn.lstm_encode(one_layer, x, mask)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_tpu_fused_kernels_supported_gates_on_generation(monkeypatch):
    """ADVICE r2: the fused paths must not be selected on ~16 MB-VMEM TPU
    generations (v2/v3), where their vmem_limit_bytes requests would fail to
    compile instead of falling back to the scan paths."""
    import jax as jax_mod
    from probnmn_tpu.ops import common

    class FakeDev:
        def __init__(self, kind):
            self.device_kind = kind

    cases = {
        "TPU v2": False,
        "TPU v3": False,
        "TPU v4": True,
        "TPU v5 lite": True,
        "TPU v5p": True,
        "TPU v6e": True,
    }
    monkeypatch.setattr(jax_mod, "default_backend", lambda: "tpu")
    for kind, want in cases.items():
        monkeypatch.setattr(jax_mod, "devices", lambda kind=kind: [FakeDev(kind)])
        assert common.tpu_fused_kernels_supported() == want, kind

    monkeypatch.setattr(jax_mod, "default_backend", lambda: "cpu")
    assert not common.tpu_fused_kernels_supported()

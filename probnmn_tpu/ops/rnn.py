r"""
Multi-layer LSTM primitives with PyTorch ``nn.LSTM`` semantics, built on ``lax.scan``.

These reproduce the behavior the reference gets from ``nn.LSTM`` /
``allennlp.modules.seq2seq_encoders.PytorchSeq2SeqWrapper`` (reference
``seq2seq_base.py:77-79``, ``program_prior.py:54-58``) in a TPU-friendly form:

- Gate order (i, f, g, o), two bias vectors (``b_ih`` + ``b_hh``), uniform
  :math:`\pm 1/\sqrt{H}` init — exactly torch's parameterization, so reference
  checkpoints port weight-for-weight.
- Masked sequences behave like packed sequences: outputs at padded positions are
  zero and the final state of each sequence is its state at the last *valid* step.
- The input projection ``x @ W_ih^T`` for all timesteps is hoisted out of the scan
  into one large batched matmul (MXU), so the scan body only carries the small
  recurrent matmul.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


def uniform_init(key: jax.Array, shape: Tuple[int, ...], scale: float) -> jax.Array:
    return jax.random.uniform(key, shape, minval=-scale, maxval=scale, dtype=jnp.float32)


def init_lstm_params(
    key: jax.Array, input_size: int, hidden_size: int, num_layers: int
) -> List[Dict[str, jax.Array]]:
    r"""Torch-style per-layer params: w_ih (4H, D), w_hh (4H, H), b_ih, b_hh (4H,)."""
    scale = 1.0 / (hidden_size ** 0.5)
    layers = []
    for layer in range(num_layers):
        in_size = input_size if layer == 0 else hidden_size
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        layers.append(
            {
                "w_ih": uniform_init(k1, (4 * hidden_size, in_size), scale),
                "w_hh": uniform_init(k2, (4 * hidden_size, hidden_size), scale),
                "b_ih": uniform_init(k3, (4 * hidden_size,), scale),
                "b_hh": uniform_init(k4, (4 * hidden_size,), scale),
            }
        )
    return layers


def init_lstm_cell_params(key: jax.Array, input_size: int, hidden_size: int) -> Dict[str, jax.Array]:
    return init_lstm_params(key, input_size, hidden_size, 1)[0]


def lstm_cell(
    params: Dict[str, jax.Array], x: jax.Array, state: Tuple[jax.Array, jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    r"""One torch-``LSTMCell`` step. x: (B, D); state: ((B, H), (B, H))."""
    h, c = state
    gates = (
        x @ params["w_ih"].T + params["b_ih"] + h @ params["w_hh"].T + params["b_hh"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _lstm_layer(
    params: Dict[str, jax.Array], x: jax.Array, mask: jax.Array
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    r"""Run one LSTM layer over time with packed-sequence masking.

    x: (B, T, D); mask: (B, T) float/bool. Returns (outputs (B, T, H), (h_T, c_T)).
    State freezes (carries through) at masked steps, so the final state equals the
    state at each sequence's last valid step — matching packed ``nn.LSTM``.
    """
    batch, _, _ = x.shape
    hidden = params["w_hh"].shape[1]
    # Hoist the input projection out of the scan: one big MXU matmul.
    # shape: (B, T, 4H) -> scanned over T as (T, B, 4H)
    x_proj = x @ params["w_ih"].T + params["b_ih"]
    x_proj = jnp.swapaxes(x_proj, 0, 1)
    mask_t = jnp.swapaxes(mask.astype(x.dtype), 0, 1)[:, :, None]  # (T, B, 1)

    def step(carry, inputs):
        h, c = carry
        xp, m = inputs
        gates = xp + h @ params["w_hh"].T + params["b_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        # Freeze state at padded steps; emit zeros there (packed-sequence semantics).
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        return (h, c), h_new * m

    init = (
        jnp.zeros((batch, hidden), x.dtype),
        jnp.zeros((batch, hidden), x.dtype),
    )
    (h_final, c_final), outputs = jax.lax.scan(step, init, (x_proj, mask_t))
    return jnp.swapaxes(outputs, 0, 1), (h_final, c_final)


def lstm_encode(
    params: List[Dict[str, jax.Array]],
    x: jax.Array,
    mask: jax.Array,
    dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, List[Tuple[jax.Array, jax.Array]]]:
    r"""Multi-layer masked LSTM. Returns (top-layer outputs (B, T, H), per-layer finals).

    ``dropout`` follows torch ``nn.LSTM`` semantics: applied to each layer's
    outputs EXCEPT the last, training-time only (pass ``dropout_rng`` to enable;
    evaluation passes None).
    """
    outputs = x
    finals = []
    for layer, layer_params in enumerate(params):
        outputs, final = _lstm_layer(layer_params, outputs, mask)
        finals.append(final)
        if dropout > 0.0 and dropout_rng is not None and layer + 1 < len(params):
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, layer), 1.0 - dropout, outputs.shape
            )
            outputs = jnp.where(keep, outputs / (1.0 - dropout), 0.0)
    return outputs, finals


def lstm_step_stacked(
    params: List[Dict[str, jax.Array]],
    x: jax.Array,
    hs: jax.Array,
    cs: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    r"""One time-step through all layers (free-running decode, e.g. prior sampling).

    x: (B, D); hs, cs: (L, B, H). Returns (top output (B, H), new hs, new cs).
    """
    new_hs, new_cs = [], []
    out = x
    for layer, layer_params in enumerate(params):
        h, c = lstm_cell(layer_params, out, (hs[layer], cs[layer]))
        new_hs.append(h)
        new_cs.append(c)
        out = h
    return out, jnp.stack(new_hs), jnp.stack(new_cs)

r"""
Fused Pallas LSTM layer: the whole masked recurrence in one kernel.

The XLA `lax.scan` LSTM spends ~30us per timestep on op-dispatch latency and
intermediate HBM buffers (measured; unrolling does not help). This kernel keeps
the recurrent weights and (h, c) state in VMEM for the whole sequence, streams
the precomputed input projections from HBM with a double-buffered DMA, and runs
each step as one MXU matmul + fused VPU gate math.

STATUS: experimental opt-in. On v5e at batch 256 this currently runs ~1.5x
SLOWER than the XLA scan (the per-step f32 transcendental gate math dominates;
bf16 gate math trips Mosaic lowering bugs as of jax 0.9). Kept as correct,
tested infrastructure for future tuning; no production path uses it yet.

Semantics match ``probnmn_tpu.ops.rnn._lstm_layer`` exactly (packed-sequence
masking: state freezes and outputs are zeroed at padded steps); the input
projection ``x @ W_ih^T + b_ih + b_hh`` is hoisted to one big XLA matmul by the
wrapper, exactly as in the scan path. Inference path (not differentiable);
training keeps the scan.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_layer_kernel(
    x_proj_ref,   # (T, B, 4H) HBM: x @ W_ih^T + b_ih + b_hh
    w_hh_t_ref,   # (H, 4H) VMEM (transposed recurrent weights)
    mask_ref,     # (T, 8, B) VMEM; row 0 holds the (B,) step mask
    outs_ref,     # (T, B, H) VMEM output
    h_final_ref,  # (B, H) VMEM
    c_final_ref,  # (B, H) VMEM
    h_scr,        # (B, H) f32
    c_scr,        # (B, H) f32
    xp_buf,       # (2, B, 4H) VMEM DMA double buffer
    sems,         # DMA semaphores (2,)
):
    T = x_proj_ref.shape[0]
    B, H = h_final_ref.shape
    dtype = outs_ref.dtype

    h_scr[...] = jnp.zeros_like(h_scr)
    c_scr[...] = jnp.zeros_like(c_scr)

    def dma(t, slot):
        return pltpu.make_async_copy(x_proj_ref.at[t], xp_buf.at[slot], sems.at[slot])

    dma(0, 0).start()

    def step(t, _):
        cur = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < T)
        def _():
            dma(t + 1, nxt).start()

        dma(t, cur).wait()
        gates = xp_buf[cur].astype(jnp.float32) + jnp.dot(
            h_scr[...].astype(dtype), w_hh_t_ref[...],
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c_scr[...] + i * g
        h_new = o * jnp.tanh(c_new)
        m = mask_ref[t][0].astype(jnp.float32)[:, None]  # (B, 1); cast before the
        # minor-dim insert (Mosaic supports that for 32-bit types only)
        h_scr[...] = m * h_new + (1.0 - m) * h_scr[...]
        c_scr[...] = m * c_new + (1.0 - m) * c_scr[...]
        outs_ref[t] = (h_new * m).astype(dtype)
        return ()

    jax.lax.fori_loop(0, T, step, (), unroll=False)
    h_final_ref[...] = h_scr[...].astype(dtype)
    c_final_ref[...] = c_scr[...].astype(dtype)


def lstm_layer_pallas(
    layer_params: Dict[str, jax.Array],
    x: jax.Array,      # (B, T, D)
    mask: jax.Array,   # (B, T) bool/float
    interpret: bool = False,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    r"""One masked LSTM layer via the fused kernel. Same contract as
    ``rnn._lstm_layer``: returns (outputs (B, T, H), (h_T, c_T))."""
    B, T, _ = x.shape
    H = layer_params["w_hh"].shape[1]
    dtype = x.dtype

    # Hoisted input projection (both biases folded; the recurrence adds none).
    x_proj = (
        x @ layer_params["w_ih"].T.astype(dtype)
        + (layer_params["b_ih"] + layer_params["b_hh"]).astype(dtype)
    )
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H)
    mask_plane = jnp.zeros((T, 8, B), jnp.float32)
    mask_plane = mask_plane.at[:, 0, :].set(jnp.swapaxes(mask.astype(jnp.float32), 0, 1))
    w_hh_t = layer_params["w_hh"].T.astype(dtype)  # (H, 4H)

    outs, h_final, c_final = pl.pallas_call(
        _lstm_layer_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # x_proj stays in HBM
                pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh_t
                pl.BlockSpec(memory_space=pltpu.VMEM),  # mask
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((B, H), jnp.float32),
                pltpu.VMEM((2, B, 4 * H), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
            jax.ShapeDtypeStruct((B, H), dtype),
        ],
        interpret=interpret,
    )(x_proj, w_hh_t, mask_plane)
    return jnp.swapaxes(outs, 0, 1), (h_final, c_final)


def lstm_encode_pallas(
    params: List[Dict[str, jax.Array]],
    x: jax.Array,
    mask: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, List[Tuple[jax.Array, jax.Array]]]:
    r"""Multi-layer fused-LSTM encoder (same contract as ``rnn.lstm_encode``)."""
    outputs = x
    finals = []
    for layer_params in params:
        outputs, final = lstm_layer_pallas(layer_params, outputs, mask, interpret)
        finals.append(final)
    return outputs, finals

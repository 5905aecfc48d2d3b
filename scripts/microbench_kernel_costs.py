r"""
Microbenchmarks for the primitive costs that decide whether a fused Pallas
seq2seq decode kernel can beat the XLA ``lax.scan`` path:

1. VPU transcendental throughput (sigmoid/tanh/exp) on LSTM-gate-shaped tiles.
2. Small-matmul serial latency on the MXU (the decode step's gate matmul).
3. A fused LSTM-cell step loop (matmul + gates) — the decode kernel's core.

Run: python scripts/microbench_kernel_costs.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_slope(make_fn, lo=256, hi=2048, reps=3):
    r"""Per-inner-iteration cost via the SLOPE between two repeat counts.

    Through the device tunnel ``block_until_ready`` returns before remote
    execution completes, and a host scalar fetch costs a fixed ~30 ms RTT
    (PERF.md "Measurement lesson"). Timing the DIFFERENCE between ``hi`` and
    ``lo`` inner iterations of the same kernel cancels the RTT and every other
    fixed dispatch cost. ``make_fn(iters)`` must return a zero-arg jitted
    callable whose result depends on all ``iters`` iterations; a scalar is
    fetched from it to truly synchronize."""
    fns = {n: make_fn(n) for n in (lo, hi)}
    for f in fns.values():
        float(jnp.sum(f()))  # compile + warm

    def median_time(f):
        times = []
        for _ in range(reps):
            t0 = time.time()
            float(jnp.sum(f()))
            times.append(time.time() - t0)
        return sorted(times)[len(times) // 2]

    return (median_time(fns[hi]) - median_time(fns[lo])) / (hi - lo)


def transcendental_kernel(x_ref, o_ref, *, iters, op):
    def body(i, acc):
        # Loop-variant so Mosaic cannot hoist: shift by a tiny i-dependent amount.
        return op(acc + 1e-7 * i)

    o_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])


def bench_transcendental(op_name, op, shape=(256, 1024), dtype=jnp.float32):
    x = jnp.ones(shape, dtype) * 0.1

    def make_fn(iters):
        kern = pl.pallas_call(
            functools.partial(transcendental_kernel, iters=iters, op=op),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(lambda: kern(x))

    t = timed_slope(make_fn, lo=1024, hi=8192)
    elems = np.prod(shape)
    print(f"  {op_name:10s} {dtype.__name__:9s} {shape}: {t*1e6:8.3f} us/iter, "
          f"{elems/t/1e9:8.2f} G elem/s")


def matmul_kernel(a_ref, b_ref, o_ref, *, iters):
    def body(i, acc):
        # Serial chain: each matmul depends on the previous result.
        out = jnp.dot(acc, b_ref[:], preferred_element_type=jnp.float32) * 1e-3
        return out.astype(acc.dtype)

    o_ref[:] = jax.lax.fori_loop(0, iters, body, a_ref[:]).astype(jnp.float32)


def bench_matmul(m, k, dtype=jnp.float32):
    # Square-ish chain a@(k,k) so it can loop; measures serial MXU latency.
    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, k), dtype) * (1.0 / k)

    def make_fn(iters):
        kern = pl.pallas_call(
            functools.partial(matmul_kernel, iters=iters),
            out_shape=jax.ShapeDtypeStruct((m, k), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(lambda: kern(a, b))

    t = timed_slope(make_fn, lo=1024, hi=8192)
    flops = 2 * m * k * k
    print(f"  serial ({m},{k})x({k},{k}) {dtype.__name__:9s}: {t*1e6:8.2f} us/matmul, "
          f"{flops/t/1e12:6.2f} TFLOP/s")


def lstm_step_kernel(x_ref, wih_ref, whh_ref, h_ref, c_ref, o_ref, *, iters, hidden):
    def body(i, hc):
        h, c = hc
        xg = jnp.dot(x_ref[:], wih_ref[:], preferred_element_type=jnp.float32)
        hg = jnp.dot(h.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32)
        gates = xg + hg
        i_g = jax.nn.sigmoid(gates[:, :hidden])
        f_g = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
        g_g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
        o_g = jax.nn.sigmoid(gates[:, 3 * hidden:])
        c = f_g * c + i_g * g_g
        h = o_g * jnp.tanh(c)
        return (h, c)

    h, c = jax.lax.fori_loop(0, iters, body, (h_ref[:], c_ref[:]))
    o_ref[:] = h + c


def bench_lstm_steps(batch=256, input_size=512, hidden=256, dtype=jnp.float32):
    x = jnp.ones((batch, input_size), dtype) * 0.01
    wih = jnp.ones((input_size, 4 * hidden), dtype) * 0.001
    whh = jnp.ones((hidden, 4 * hidden), dtype) * 0.001
    h = jnp.zeros((batch, hidden), jnp.float32)
    c = jnp.zeros((batch, hidden), jnp.float32)

    def make_fn(iters):
        kern = pl.pallas_call(
            functools.partial(lstm_step_kernel, iters=iters, hidden=hidden),
            out_shape=jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.jit(lambda: kern(x, wih, whh, h, c))

    t = timed_slope(make_fn, lo=512, hi=4096)
    print(f"  LSTM cell (B={batch},D={input_size},H={hidden}) {dtype.__name__}: "
          f"{t*1e6:7.2f} us/step")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    print("transcendental throughput (fori_loop inside one kernel):")
    bench_transcendental("sigmoid", jax.nn.sigmoid)
    bench_transcendental("tanh", jnp.tanh)
    bench_transcendental("exp", jnp.exp)
    print("serial MXU matmul latency:")
    bench_matmul(256, 256)
    bench_matmul(256, 512)
    bench_matmul(256, 256, jnp.bfloat16)
    print("fused LSTM-cell step loop:")
    bench_lstm_steps()
    bench_lstm_steps(dtype=jnp.bfloat16)
    bench_lstm_steps(input_size=256)

r"""
Dot-packing roofline experiment (VERDICT r3 item 6, carried through r4): the
fused interpreter's 3x3 conv is 9 accumulating (sl, C) x (C, C) dots over
static tap slices of the flat-layout image (``_flat_conv_helpers``), measured
at ~86 TFLOP/s — the short-matrix MXU ceiling for M=224, K=N=128. Is there a
packing that buys more of the MXU?

Candidates measured here, inside one Pallas kernel each, at exactly the
production geometry (d=1: sl=224, C=128, bf16 weights, f32 accumulation):

  ninedot   the production formulation: 9 accumulating dots from 9 STATIC
            tap slices of the flat value (no operand materialization).
  bigdot    im2col-in-VMEM: lane-concat the 9 tap slices into one (sl, 9C)
            operand, then ONE (sl, 9C) x (9C, C) dot — 4.5x the K dimension
            per dot at the cost of materializing a 9C-lane operand per conv.
  twopack   M-packing across examples: two independent images' tap slices
            stacked along sublanes -> 9 accumulating (2*sl, C) x (C, C) dots.
            This is the "pack rows of bank-coincident examples" idea — it
            requires two examples executing the SAME bank slot at the same
            step, which the serial per-example interpreter cannot arrange in
            general (programs differ per example); the number bounds what
            perfect coincidence WOULD buy.

Each kernel chains ``m`` conv applications (weights indexed k % S so nothing
hoists, output feeding the next input), per-conv time = slope between two
chain lengths; the tunnel RTT and kernel prologue cancel (PERF.md
"Measurement lesson").

Run on the chip: python scripts/bench_dot_packing.py
"""
import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probnmn_tpu.ops.pallas.nmn_interpreter import _flat_conv_helpers

parser = argparse.ArgumentParser(description="3x3-conv dot-packing experiment.")
parser.add_argument("--m-lo", type=int, default=1024)
parser.add_argument("--m-hi", type=int, default=8192)
parser.add_argument("--reps", type=int, default=11)
parser.add_argument("--slots", type=int, default=16)
parser.add_argument("--channels", type=int, default=128)
parser.add_argument("--interpret", action="store_true")
parser.add_argument("--out", default="", help="Append one JSON line here too.")

H = W = 14


def make_kernel(variant: str, m: int, C: int, S: int):
    # Geometry INTS may be computed host-side; the helper's validity masks are
    # iota-built arrays that must be created INSIDE the kernel (Pallas kernels
    # cannot capture host array constants) — hence the second call below.
    g0 = _flat_conv_helpers(H, W, C)["G1"]
    sl, base, flat, pitch = g0["sl"], g0["base"], g0["flat"], g0["pitch"]

    def tap_start(k):
        ky, kx = divmod(k, 3)
        return base + (ky - 1) * pitch + (kx - 1)

    def kernel(x_ref, w_ref, o_ref, acc, patches_ref=None):
        r"""x_ref (P, flat, C) bf16 flat images (P=2 for twopack else 1);
        w_ref (S, 9C, C) bf16 weight bank; o_ref (8, 128) f32 checksum;
        patches_ref (sl, 9C) bf16 scratch (bigdot only) — the im2col operand is
        materialized through a VMEM ref because Mosaic cannot lane-concat
        vectors whose sublane offsets differ (the 9 tap slices start at 9
        different rows of the flat value)."""
        fh = _flat_conv_helpers(H, W, C)
        g = fh["G1"]
        acc[...] = jnp.zeros_like(acc)

        def body(i, carry):
            # carry: (P*sl or sl, C) f32 running activation; re-folded into a
            # fresh flat value each iteration so taps stay static slices.
            slot = i % S
            if variant == "twopack":
                outs = []
                for p in range(2):
                    flat_v = fh["refold"](carry[p * sl:(p + 1) * sl], g).astype(
                        jnp.bfloat16
                    )
                    outs.append(flat_v)
                tot = jnp.zeros((2 * sl, C), jnp.float32)
                for k in range(9):
                    s = tap_start(k)
                    stacked = jnp.concatenate(
                        [o[s:s + sl, :] for o in outs], axis=0
                    )  # (2*sl, C): both examples' tap-k slices in one dot
                    tot = tot + jax.lax.dot(
                        stacked, w_ref[slot, k * C:(k + 1) * C, :],
                        preferred_element_type=jnp.float32,
                    )
                new = jnp.tanh(tot * 0.25)
            else:
                flat_v = fh["refold"](carry, g).astype(jnp.bfloat16)
                if variant == "ninedot":
                    tot = fh["conv"](flat_v, w_ref, slot, 1, g)
                else:  # bigdot: one (sl, 9C) x (9C, C) dot
                    for k in range(9):
                        s = tap_start(k)
                        patches_ref[:, k * C:(k + 1) * C] = flat_v[s:s + sl, :]
                    tot = jax.lax.dot(
                        patches_ref[...], w_ref[slot],
                        preferred_element_type=jnp.float32,
                    )  # (sl, 9C) x (9C, C) — im2col via scratch stores
                new = jnp.tanh(tot * 0.25)
            return new

        if variant == "twopack":
            init = jnp.concatenate(
                [x_ref[0, base:base + sl, :].astype(jnp.float32),
                 x_ref[1, base:base + sl, :].astype(jnp.float32)], axis=0,
            )
        else:
            init = x_ref[0, base:base + sl, :].astype(jnp.float32)
        final = jax.lax.fori_loop(0, m, body, init, unroll=False)
        acc[...] = jnp.zeros((8, 128), jnp.float32) + jnp.sum(final)
        o_ref[...] = acc[...]

    P = 2 if variant == "twopack" else 1
    return kernel, P, flat, sl


def build_fn(variant: str, m: int, C: int, S: int, interpret: bool):
    kernel, P, flat, sl = make_kernel(variant, m, C, S)
    scratch = [pltpu.VMEM((8, 128), jnp.float32)]
    if variant == "bigdot":
        scratch.append(pltpu.VMEM((sl, 9 * C), jnp.bfloat16))

    @jax.jit
    def fn(x, w):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((P, flat, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(x, w)

    return fn, P, flat


def main(args):
    C, S = args.channels, args.slots
    rs = np.random.RandomState(0)
    results = {}
    for variant in ("ninedot", "bigdot", "twopack"):
        fns = {}
        try:
            for m in (args.m_lo, args.m_hi):
                fn, P, flat = build_fn(variant, m, C, S, args.interpret)
                x = jnp.asarray(rs.randn(P, flat, C) * 0.1, jnp.bfloat16)
                w = jnp.asarray(rs.randn(S, 9 * C, C) * 0.05, jnp.bfloat16)
                fns[m] = (fn, x, w)
                float(np.asarray(fn(x, w)).ravel()[0])  # compile + warm
        except Exception as e:  # one variant failing to lower is itself data
            results[variant] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps({"variant": variant,
                              "error": results[variant]["error"]}), flush=True)
            continue

        def median_time(m):
            fn, x, w = fns[m]
            times = []
            for _ in range(args.reps):
                t0 = time.time()
                float(np.asarray(fn(x, w)).ravel()[0])
                times.append(time.time() - t0)
            return sorted(times)[len(times) // 2]

        per_conv_s = (median_time(args.m_hi) - median_time(args.m_lo)) / (
            args.m_hi - args.m_lo
        )
        convs_per_call = 2 if variant == "twopack" else 1
        sl = 224 if C == 128 else None
        flops = 2 * 224 * 9 * C * C * convs_per_call  # MACs*2 over valid window
        results[variant] = {
            "us_per_iter": round(1e6 * per_conv_s, 3),
            "us_per_conv": round(1e6 * per_conv_s / convs_per_call, 3),
            "tflops": round(flops / per_conv_s / 1e12, 1),
        }
        print(json.dumps({"variant": variant, **results[variant]}), flush=True)

    line = json.dumps({
        "bench": "dot_packing", "C": C, "sl": 224,
        "backend": jax.devices()[0].platform,
        "results": results,
    })
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(parser.parse_args())

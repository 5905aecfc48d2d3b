r"""
Beam-search decode cost at production shapes (VERDICT r4 weak #4): the beam
docstring in ``probnmn_tpu/models/seq2seq.py`` claims the pure-XLA beam is
cheap enough that no Pallas kernel is warranted — this benchmark puts the
number behind that claim (or refutes it).

Measures the ProgramGenerator free-decode forward at batch 256 for
greedy / sampling / beam K in {1, 4, 8, 16}, slope method (PERF.md
"Measurement lesson": per-call time is the slope between two chained-call
counts inside one jitted fori_loop, cancelling the tunnel RTT).

Run on the chip: python scripts/bench_beam.py
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from probnmn_tpu.config import Config
from probnmn_tpu.utils.clevr import MAX_QUESTION_LENGTH, make_clevr_like_vocabulary

parser = argparse.ArgumentParser(description="Beam decode cost, batch 256.")
parser.add_argument("--batch-size", type=int, default=256)
parser.add_argument("--beams", type=int, nargs="*", default=[1, 4, 8, 16])
parser.add_argument("--m-lo", type=int, default=8)
parser.add_argument("--m-hi", type=int, default=32)
parser.add_argument("--reps", type=int, default=5)
parser.add_argument("--out", default="", help="Append one JSON line here too.")


def main(args):
    from probnmn_tpu.models import program_generator
    from probnmn_tpu.models.seq2seq import beam_search_forward, seq2seq_forward
    from probnmn_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    vocab = make_clevr_like_vocabulary()
    config = Config(None, [])
    spec = program_generator.make_spec(vocab, config)
    params = program_generator.init_params(jax.random.PRNGKey(0), spec)
    params = jax.device_put(params)

    rs = np.random.RandomState(0)
    B = args.batch_size
    questions_np = np.zeros((B, MAX_QUESTION_LENGTH), np.int32)
    for i in range(B):
        qlen = rs.randint(6, MAX_QUESTION_LENGTH + 1)
        questions_np[i, :qlen] = rs.randint(4, vocab.get_vocab_size("questions"), qlen)
    questions = jnp.asarray(questions_np)

    def chain(body, m):
        @jax.jit
        def fn(q):
            def step(i, acc):
                # Loop-variant source (roll by i) so XLA cannot hoist the decode.
                q_i = jnp.roll(q, i, axis=0)
                return acc + body(q_i, i)

            return jax.lax.fori_loop(0, m, step, jnp.float32(0.0))

        return fn

    def slope(body):
        fns = {m: chain(body, m) for m in (args.m_lo, args.m_hi)}
        for fn in fns.values():
            float(np.asarray(fn(questions)).ravel()[0])  # compile + warm

        def median_time(m):
            times = []
            for _ in range(args.reps):
                t0 = time.time()
                float(np.asarray(fns[m](questions)).ravel()[0])
                times.append(time.time() - t0)
            return sorted(times)[len(times) // 2]

        return (median_time(args.m_hi) - median_time(args.m_lo)) / (
            args.m_hi - args.m_lo
        )

    results = {}

    def greedy_body(q, i):
        out = seq2seq_forward(params, spec, q, None, "greedy")
        return out["loss"].sum().astype(jnp.float32)

    def sampling_body(q, i):
        out = seq2seq_forward(
            params, spec, q, None, "sampling", rng=jax.random.fold_in(
                jax.random.PRNGKey(0), i)
        )
        return out["loss"].sum().astype(jnp.float32)

    for name, body in (("greedy_xla", greedy_body), ("sampling_xla", sampling_body)):
        sec = slope(body)
        results[name] = round(1e3 * sec, 3)
        print(json.dumps({"decode": name, "ms_per_batch": results[name],
                          "qps": round(B / sec)}), flush=True)

    for K in args.beams:
        def beam_body(q, i, K=K):
            out = beam_search_forward(params, spec, q, K)
            return out["loss"].sum().astype(jnp.float32)

        sec = slope(beam_body)
        results[f"beam_{K}"] = round(1e3 * sec, 3)
        print(json.dumps({"decode": f"beam_{K}", "ms_per_batch": results[f"beam_{K}"],
                          "qps": round(B / sec)}), flush=True)

    line = json.dumps({
        "bench": "beam_decode", "batch_size": B,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "ms_per_batch": results,
    })
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(parser.parse_args())

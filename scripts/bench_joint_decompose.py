r"""
Joint-training step cost decomposition (slope method, production shapes).

The converged-regime joint step is the weakest perf number (PERF.md round 3:
22.8-23.8 ms/batch-256). This benchmark slope-measures each component in
isolation at batch 256 so optimization is aimed at measured costs, not guesses:

- stem fwd / fwd+bwd                      (dense 1024->128 convs)
- NMN interpreter fwd / fwd+bwd           (valid programs, fused path on TPU)
- classifier fwd+bwd                      (the 50M-param 1024*7*7->1024 linear)
- bank stacking (build_banks) fwd / VJP   (per-step unified-bank rebuild)
- Adam update on the full joint tree      (optimizer HBM traffic)
- Adam with bf16 first moment             (candidate lever: mu_dtype)

Methodology per PERF.md "Measurement lesson": each component is chained M
times inside one jitted fori_loop with loop-variant inputs (rng-perturbed so
XLA cannot hoist), a scalar fetched once; per-call time is the slope between
two chain lengths, cancelling the tunnel RTT.

Run on the chip: python scripts/bench_joint_decompose.py
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
import optax

from probnmn_tpu.config import Config
from probnmn_tpu.utils.clevr import (
    MAX_PROGRAM_LENGTH,
    make_clevr_like_vocabulary,
    sample_clevr_like_programs,
)

parser = argparse.ArgumentParser(description="Joint-step component decomposition.")
parser.add_argument("--batch-size", type=int, default=256)
parser.add_argument("--m-lo", type=int, default=8)
parser.add_argument("--m-hi", type=int, default=32)
parser.add_argument("--reps", type=int, default=5)
parser.add_argument("--components", nargs="*", default=[],
                    help="Subset to run (default: all).")


def slope(fn_maker, args_, m_lo, m_hi, reps):
    r"""fn_maker(m) -> jitted chain running the component m times; returns
    per-call seconds from the (m_hi - m_lo) slope."""
    fns = {m: fn_maker(m) for m in (m_lo, m_hi)}
    for fn in fns.values():
        float(np.asarray(fn(*args_)).ravel()[0])  # compile + warm

    def median_time(m):
        times = []
        for _ in range(reps):
            t0 = time.time()
            float(np.asarray(fns[m](*args_)).ravel()[0])
            times.append(time.time() - t0)
        return sorted(times)[len(times) // 2]

    return (median_time(m_hi) - median_time(m_lo)) / (m_hi - m_lo)


def chain(body, m):
    r"""Standard loop-variant chain: the iteration index perturbs the input
    through the carried scalar so XLA cannot hoist the body."""
    @jax.jit
    def fn(*args_):
        def step(i, acc):
            return acc + body(i, acc, *args_)

        return jax.lax.fori_loop(0, m, step, jnp.float32(0.0))

    return fn


def main(args):
    if args.m_hi <= args.m_lo:
        parser.error(f"--m-hi ({args.m_hi}) must exceed --m-lo ({args.m_lo})")
    from probnmn_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    vocab = make_clevr_like_vocabulary()
    config = Config(None, [])
    B = args.batch_size

    from probnmn_tpu.models import nmn as nmn_lib
    from probnmn_tpu.models import program_generator

    nmn_spec = nmn_lib.make_spec(vocab, config)
    dtype = jnp.dtype(nmn_spec.compute_dtype)
    params = nmn_lib.init_nmn_params(jax.random.PRNGKey(0), nmn_spec)
    rs = np.random.RandomState(0)
    feats = jnp.asarray(rs.randn(B, 14, 14, 1024), dtype)
    programs_np = np.zeros((B, MAX_PROGRAM_LENGTH), np.int32)
    z = np.asarray(sample_clevr_like_programs(vocab, B, seed=7))
    programs_np[:, : z.shape[1]] = z
    programs = jnp.asarray(programs_np)
    answers = jnp.asarray(rs.randint(0, nmn_spec.num_answers, (B,)))

    stem_p = jax.tree_util.tree_map(lambda x: x.astype(dtype), params["stem"])
    cls_p = jax.tree_util.tree_map(lambda x: x.astype(dtype), params["classifier"])

    results = {}
    want = set(args.components)

    def measure(name, fn_maker, args_):
        if want and name not in want:
            return
        sec = slope(fn_maker, args_, args.m_lo, args.m_hi, args.reps)
        results[name] = round(1e3 * sec, 3)
        print(json.dumps({"component": name, "ms": results[name]}), flush=True)

    def perturb(x, i, acc=None):
        r"""Loop-variant + (optionally) chain-dependent input: folding the
        carried accumulator in (scaled by 0) forces a serial dependency
        between iterations, so the loop cannot be pipelined/hoisted."""
        out = x + 0.0 * jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(1), i), (), dtype=jnp.float32
        ).astype(x.dtype)
        if acc is not None:
            out = out + (0.0 * acc).astype(x.dtype)
        return out

    # ---- stem
    measure("stem_fwd", lambda m: chain(
        lambda i, acc, f: nmn_lib.apply_stem(stem_p, perturb(f, i, acc)).sum().astype(jnp.float32),
        m), (feats,))

    def stem_loss(p, f):
        return nmn_lib.apply_stem(p, f).sum().astype(jnp.float32)

    measure("stem_fwd_bwd", lambda m: chain(
        lambda i, acc, f: jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum().astype(jnp.float32),
            jax.grad(stem_loss)(stem_p, perturb(f, i, acc)), jnp.float32(0.0)),
        m), (feats,))

    # ---- interpreter (fused on TPU, XLA machine elsewhere), valid programs
    stem_feats = nmn_lib.apply_stem(stem_p, feats)
    use_fast = nmn_lib.fast_training_available(nmn_spec)
    if use_fast:
        from probnmn_tpu.ops.pallas.nmn_interpreter import (
            build_banks,
            build_tables,
            execute_programs_pallas_diff,
        )

        banks = build_banks(params, nmn_spec, dtype)
        tables = build_tables(nmn_spec)

        def interp_fwd(i, acc, sf, pr):
            final, invalid = execute_programs_pallas_diff(
                banks, tables, nmn_spec, perturb(sf, i, acc), pr
            )
            return final.sum().astype(jnp.float32)

        def interp_loss(bk, sf, pr):
            final, _ = execute_programs_pallas_diff(bk, tables, nmn_spec, sf, pr)
            return final.sum().astype(jnp.float32)

        def interp_bwd(i, acc, sf, pr):
            g = jax.grad(interp_loss)(banks, perturb(sf, i, acc), pr)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum().astype(jnp.float32), g, jnp.float32(0.0)
            )
    else:
        def interp_fwd(i, acc, sf, pr):
            final, _ = nmn_lib.execute_programs(params, nmn_spec, perturb(sf, i, acc), pr)
            return final.sum().astype(jnp.float32)

        def interp_loss(p, sf, pr):
            final, _ = nmn_lib.execute_programs(p, nmn_spec, sf, pr)
            return final.sum().astype(jnp.float32)

        def interp_bwd(i, acc, sf, pr):
            g = jax.grad(interp_loss)(params, perturb(sf, i, acc), pr)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum().astype(jnp.float32), g, jnp.float32(0.0)
            )

    measure("interpreter_fwd", lambda m: chain(interp_fwd, m), (stem_feats, programs))
    measure("interpreter_fwd_bwd", lambda m: chain(interp_bwd, m), (stem_feats, programs))

    if use_fast:
        # The TRAINING forward (residual-streaming, what jax.grad actually runs
        # as the VJP's fwd) is a different kernel from the inference forward
        # measured above — its residual writes are the HBM-traffic component
        # the round-5 atraj-trimming work targets. Measuring it alone splits
        # interpreter_fwd_bwd into its fwd and bwd kernels.
        from probnmn_tpu.ops.pallas.nmn_interpreter import (
            _execute_train_fwd_pallas,
        )

        def interp_train_fwd(i, acc, sf, pr):
            final, invalid, otraj, atraj = _execute_train_fwd_pallas(
                banks, tables, perturb(sf, i, acc), pr
            )
            # Touch the residuals so they cannot be dead-code-eliminated.
            return (final.sum() + otraj[:, 0].sum() + atraj[:, 0, 0].sum()
                    ).astype(jnp.float32)

        measure("interpreter_train_fwd", lambda m: chain(interp_train_fwd, m),
                (stem_feats, programs))

    # ---- classifier
    def cls_loss(p, x, ans):
        logits = nmn_lib.apply_classifier(p, x).astype(jnp.float32)
        return -jnp.take_along_axis(
            jax.nn.log_softmax(logits), ans[:, None], axis=-1
        ).mean()

    final_enc = jnp.asarray(rs.randn(B, 14, 14, 128), dtype)
    measure("classifier_fwd_bwd", lambda m: chain(
        lambda i, acc, x, ans: jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum().astype(jnp.float32),
            jax.grad(cls_loss)(cls_p, perturb(x, i, acc), ans), jnp.float32(0.0)),
        m), (final_enc, answers))

    # ---- bank stacking (per-step rebuild) + its VJP
    if use_fast:
        from probnmn_tpu.ops.pallas.nmn_interpreter import build_banks as _bb

        def stack_fwd(i, acc, p):
            p2 = jax.tree_util.tree_map(lambda x: perturb(x, i, acc), p)
            bk = _bb(p2, nmn_spec, dtype)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum().astype(jnp.float32), bk, jnp.float32(0.0)
            )

        def stack_loss(p):
            bk = _bb(p, nmn_spec, dtype)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum().astype(jnp.float32), bk, jnp.float32(0.0)
            )

        def stack_bwd(i, acc, p):
            p2 = jax.tree_util.tree_map(lambda x: perturb(x, i, acc), p)
            g = jax.grad(stack_loss)(p2)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + b.sum().astype(jnp.float32), g, jnp.float32(0.0)
            )

        measure("bank_stack_fwd", lambda m: chain(stack_fwd, m), (params,))
        measure("bank_stack_fwd_bwd", lambda m: chain(stack_bwd, m), (params,))

    # ---- Adam on a joint-sized tree (PG + QR + NMN ~ the production union)
    pg_spec = program_generator.make_spec(vocab, config)
    pg_params = program_generator.init_params(jax.random.PRNGKey(1), pg_spec)
    joint_tree = {"program_generator": pg_params, "nmn": params}

    for name, mu_dtype in (("adam_f32", None), ("adam_mu_bf16", jnp.bfloat16)):
        opt = optax.chain(
            optax.clip(5.0),
            optax.scale_by_adam(mu_dtype=mu_dtype),
            optax.scale(-1e-4),
        )
        opt_state = opt.init(joint_tree)

        def adam_body(i, acc, p, s):
            grads = jax.tree_util.tree_map(lambda x: perturb(x, i, acc) * 1e-3, p)
            updates, s2 = opt.update(grads, s, p)
            p2 = optax.apply_updates(p, updates)
            # Reduce over EVERY leaf of params and moments — anything not
            # feeding the fetched scalar would be dead-code-eliminated and
            # silently drop out of the measurement.
            tot = jax.tree_util.tree_reduce(
                lambda a, b: a + b.astype(jnp.float32).sum(), p2, jnp.float32(0.0)
            )
            return jax.tree_util.tree_reduce(
                lambda a, b: a + b.astype(jnp.float32).sum(), s2, tot
            )

        measure(name, lambda m, b=adam_body: chain(b, m), (joint_tree, opt_state))

    print(json.dumps({"decomposition_ms": results,
                      "batch_size": B,
                      "fused_interpreter": bool(use_fast)}))


if __name__ == "__main__":
    main(parser.parse_args())

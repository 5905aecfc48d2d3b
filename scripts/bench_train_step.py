r"""
Full-scale training-step benchmark for question_coding / joint_training.

Constructs the PRODUCTION phase trainers (reference scale: 256-d LSTMs, 128-ch
NMN over (14,14,1024) features, batch 256 — ``configs/*.yml`` defaults) on
synthetic CLEVR-shaped data (``probnmn_tpu.utils.clevr``: real vocabulary, real
program-length mix) and measures the jitted train step — the number PERF.md's
"training device-step throughput" table tracks.

Methodology (PERF.md "Measurement lesson"): through the axon device tunnel,
``block_until_ready`` is unreliable and a host scalar fetch costs a fixed ~30 ms
RTT, so per-step time is the SLOPE between two chained-step counts (the same
batch threaded through M dependent train_step calls, a scalar fetched once at
the end): slope = (t_hi - t_lo) / (M_hi - M_lo) cancels the RTT and every other
fixed dispatch cost.

Run: python scripts/bench_train_step.py [--phase joint_training|question_coding]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import jax
import numpy as np

from probnmn_tpu.config import Config
from probnmn_tpu.utils.clevr import (
    MAX_PROGRAM_LENGTH,
    MAX_QUESTION_LENGTH,
    make_clevr_like_vocabulary,
    sample_clevr_like_programs,
)

N_TRAIN = 2048
N_IMAGES = 16


def build_data(root: str, vocab) -> None:
    rs = np.random.RandomState(0)
    programs = np.asarray(sample_clevr_like_programs(vocab, N_TRAIN, seed=1))
    padded = np.zeros((N_TRAIN, MAX_PROGRAM_LENGTH), np.int64)
    padded[:, : programs.shape[1]] = programs
    questions = np.zeros((N_TRAIN, MAX_QUESTION_LENGTH), np.int64)
    for i in range(N_TRAIN):
        qlen = rs.randint(8, MAX_QUESTION_LENGTH + 1)
        questions[i, :qlen] = rs.randint(
            4, vocab.get_vocab_size("questions"), qlen
        )
    answers = rs.randint(0, vocab.get_vocab_size("answers") - 1, (N_TRAIN,))
    image_indices = rs.randint(0, N_IMAGES, (N_TRAIN,))
    with h5py.File(os.path.join(root, "train_tokens.h5"), "w") as f:
        f.attrs["split"] = "train"
        f.create_dataset("programs", data=padded)
        f.create_dataset("questions", data=questions)
        f.create_dataset("answers", data=answers)
        f.create_dataset("image_indices", data=image_indices)
    feats = rs.randn(N_IMAGES, 1024, 14, 14).astype(np.float32)
    with h5py.File(os.path.join(root, "train_features.h5"), "w") as f:
        f.attrs["split"] = "train"
        f.create_dataset("features", data=feats)
    vocab.save_to_files(os.path.join(root, "vocab"))


def build_checkpoints(root: str, vocab, config: Config) -> None:
    r"""Freshly-initialized upstream checkpoints (weights only matter for
    numerics, not step cost)."""
    from probnmn_tpu.models import nmn as nmn_lib
    from probnmn_tpu.models import program_generator, question_reconstructor
    from probnmn_tpu.models.program_prior import init_program_prior_params
    from probnmn_tpu.training.program_prior_trainer import make_prior_spec
    from probnmn_tpu.utils.checkpointing import save_objects

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    prior = init_program_prior_params(k1, make_prior_spec(config, vocab))
    pg = program_generator.init_params(k2, program_generator.make_spec(vocab, config))
    qr = question_reconstructor.init_params(
        k3, question_reconstructor.make_spec(vocab, config)
    )
    nmn = nmn_lib.init_nmn_params(k4, nmn_lib.make_spec(vocab, config))
    save_objects(os.path.join(root, "program_prior.ckpt"), {"program_prior": prior})
    save_objects(
        os.path.join(root, "question_coding.ckpt"),
        {"program_generator": pg, "question_reconstructor": qr},
    )
    save_objects(os.path.join(root, "module_training.ckpt"), {"nmn": nmn})


def make_config(root: str, phase: str, batch_size: int,
                mu_dtype: str = "float32") -> Config:
    return Config(
        None,
        [
            "PHASE", phase,
            "OPTIM.ADAM_MU_DTYPE", mu_dtype,
            "DATA.VOCABULARY", os.path.join(root, "vocab"),
            "DATA.TRAIN_TOKENS", os.path.join(root, "train_tokens.h5"),
            "DATA.TRAIN_FEATURES", os.path.join(root, "train_features.h5"),
            "CHECKPOINTS.PROGRAM_PRIOR", os.path.join(root, "program_prior.ckpt"),
            "CHECKPOINTS.QUESTION_CODING", os.path.join(root, "question_coding.ckpt"),
            "CHECKPOINTS.MODULE_TRAINING", os.path.join(root, "module_training.ckpt"),
            "OPTIM.BATCH_SIZE", batch_size,
            "SUPERVISION", 1000,
        ],
    )


def measure_step(trainer, m_lo: int = 8, m_hi: int = 32, reps: int = 5) -> float:
    r"""Slope-method per-step seconds on the trainer's production train step.

    The whole m-step chain runs inside ONE jitted ``fori_loop`` (per-step
    dispatch through the tunnel is itself tens of ms and far too noisy), and a
    scalar that depends on every step through the optimizer chain is fetched
    once at the end. The slope between the two chain lengths cancels the fetch
    RTT and any other per-dispatch constant."""
    import jax.numpy as jnp

    batch = next(trainer._batches)
    step = trainer._select_step(batch)  # windowed step (pops the host count)
    assert step is trainer._train_step, "batch overflowed the sub-batch window"
    prior = (
        (trainer._prior_params,) if hasattr(trainer, "_prior_params") else ()
    )
    # Freshly-constructed trainers hold HOST parameter/optimizer pytrees (the
    # first production step replaces them with device outputs); pin them to the
    # device once so timed runs don't re-upload ~1 GB through the tunnel.
    trainer._params = jax.device_put(trainer._params)
    trainer._opt_state = jax.device_put(trainer._opt_state)

    def make_chain(m):
        @jax.jit
        def chain(params, opt_state, baseline, rng, batch):
            def body(i, carry):
                params, opt_state, baseline, acc = carry
                params, opt_state, baseline, logs = step(
                    params, opt_state, baseline, jax.random.fold_in(rng, i),
                    batch, *prior,
                )
                scalar = jax.tree_util.tree_leaves(logs)[0]
                return params, opt_state, baseline, acc + scalar

            init = (params, opt_state, jnp.float32(baseline), jnp.float32(0.0))
            return jax.lax.fori_loop(0, m, body, init)[-1]

        return chain

    fns = {m: make_chain(m) for m in (m_lo, m_hi)}

    def run(fn, seed):
        return float(fn(
            trainer._params, trainer._opt_state, trainer._baseline,
            jax.random.PRNGKey(seed), batch,
        ))

    for fn in fns.values():
        run(fn, 0)  # compile + warm

    def median_time(m):
        times = []
        for rep in range(reps):
            t0 = time.time()
            run(fns[m], 1 + rep)
            times.append(time.time() - t0)
        return sorted(times)[len(times) // 2]

    return (median_time(m_hi) - median_time(m_lo)) / (m_hi - m_lo)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--phase", default="joint_training",
        choices=["question_coding", "joint_training"],
    )
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--serialization-dir", default=None)
    parser.add_argument(
        "--mu-dtype", default="float32", choices=["float32", "bfloat16"],
        help="OPTIM.ADAM_MU_DTYPE for the step (bf16 first-moment lever).",
    )
    parser.add_argument(
        "--regime", default="random", choices=["random", "converged"],
        help="random: z is whatever the (untrained) PG samples — mostly "
        "invalid programs, cheap via the interpreter's early-abort. "
        "converged: valid CLEVR-like programs are substituted for z (the "
        "sampling decode still runs and its cost is kept) — every program "
        "pays its full module chains forward AND backward, the honest "
        "late-training bound.",
    )
    args = parser.parse_args()

    # Persistent XLA cache: the joint graph compiles in 3-10 min cold; repeat
    # bench runs (regime/mu-dtype sweeps) should pay that once per signature.
    from probnmn_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    root = args.serialization_dir or tempfile.mkdtemp(prefix="bench_train_")
    os.makedirs(root, exist_ok=True)
    vocab = make_clevr_like_vocabulary()
    config = make_config(root, args.phase, args.batch_size, args.mu_dtype)
    if not os.path.exists(os.path.join(root, "train_tokens.h5")):
        build_data(root, vocab)
        build_checkpoints(root, vocab, config)

    if args.regime == "converged":
        # Swap the sampled z for realistic VALID programs at the sampling-kernel
        # boundary, keeping the decode's own cost in the step (its predictions
        # feed the substitution so XLA cannot dead-code it). Everything
        # downstream — REINFORCE replay, reconstruction, prior, the NMN's full
        # module chains fwd+bwd — runs exactly as a converged model would.
        import jax.numpy as jnp

        from probnmn_tpu.ops.pallas import seq2seq_decode as decode_mod

        z_valid = jnp.asarray(
            np.asarray(sample_clevr_like_programs(vocab, args.batch_size, seed=7))
        )

        def _substitute(tokens):
            z = z_valid[: tokens.shape[0]]
            width = min(z.shape[1], tokens.shape[1])
            out = jnp.zeros_like(tokens)
            return out.at[:, :width].set(
                z[:, :width] + 0 * tokens[:, :1].astype(z.dtype)
            )

        orig_sample, orig_sample_dp = (
            decode_mod.fused_sampling_forward, decode_mod.fused_sampling_forward_dp,
        )

        def patched(params, spec, source, key, **kw):
            out = dict(orig_sample(params, spec, source, key, **kw))
            out["predictions"] = _substitute(out["predictions"])
            return out

        def patched_dp(mesh, params, spec, source, key, **kw):
            return _substitute(orig_sample_dp(mesh, params, spec, source, key, **kw))

        decode_mod.fused_sampling_forward = patched
        decode_mod.fused_sampling_forward_dp = patched_dp

    if args.phase == "joint_training":
        from probnmn_tpu.training.joint_training_trainer import JointTrainingTrainer

        trainer = JointTrainingTrainer(config, root)
    else:
        from probnmn_tpu.training.question_coding_trainer import QuestionCodingTrainer

        trainer = QuestionCodingTrainer(config, root)

    sec = measure_step(trainer)
    print(
        json.dumps(
            {
                "phase": args.phase,
                "batch_size": args.batch_size,
                "regime": args.regime,
                "mu_dtype": args.mu_dtype,
                "nmn_bwd": "replay" if os.environ.get(
                    "PROBNMN_NMN_REPLAY_BWD") == "1" else "residual",
                "ms_per_step": round(1e3 * sec, 2),
                "examples_per_sec": round(args.batch_size / sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

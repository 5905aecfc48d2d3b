r"""
Scale-hardening of the parity harness (SURVEY.md §6): exercise the
``.pth``-port -> evaluate pipeline at PRODUCTION shapes, not fixture shapes.

The real v1.0 release checkpoints are not downloadable in this environment, so
this script synthesizes reference-format torch-serialized ``.pth`` checkpoints
at the real scale instead — real CLEVR namespace inventories
(~90 question words / ~50 program functions / 29 answers, matching the
reference's ``build_vocabulary.py`` output), 256-d/2-layer LSTMs, full NMN
banks at 1024-channel image features (reference ``configs/*.yml`` defaults) —
and runs all FOUR phase evaluators from them at batch 256 through
``scripts/verify_parity.py``. What this proves beyond the fixture-scale test
(``tests/test_training.py::test_verify_parity_all_phases_from_reference_pth``):
the torch interop, bank stacking, fused kernels, and eval paths hold at the
shapes the real release files would arrive in.

Writes a JSON artifact (default ``REALSCALE_PARITY.json``) recording per-phase
metrics and wall time. Metric VALUES are those of random-weight networks
(real weights are unavailable); the parity CONTRACT being exercised is
port-fidelity + pipeline execution at scale, and the self-check mode
(--self-check) re-evaluates one phase twice and requires identical metrics.
"""
import argparse
import json
import logging
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

parser = argparse.ArgumentParser(description="Parity harness at production shapes.")
parser.add_argument("--work-dir", default="", help="Default: a fresh temp dir.")
parser.add_argument("--val-examples", type=int, default=1024)
parser.add_argument("--num-images", type=int, default=96,
                    help="Distinct 1024x14x14 feature maps (96 ~ 75 MB H5).")
parser.add_argument("--batch-size", type=int, default=256)
parser.add_argument("--num-val-batches", type=int, default=0, help="0 = full split.")
parser.add_argument("--output", default="REALSCALE_PARITY.json")
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--self-check", action="store_true",
                    help="Evaluate module_training twice; metrics must match "
                    "exactly (greedy decode + fixed seeds are deterministic).")


def build_realscale_data(root: str, args) -> None:
    import h5py

    from probnmn_tpu.utils.clevr import (
        MAX_PROGRAM_LENGTH,
        MAX_QUESTION_LENGTH,
        make_clevr_like_vocabulary,
        sample_clevr_like_programs,
    )

    vocab = make_clevr_like_vocabulary()
    vocab.save_to_files(os.path.join(root, "vocab"))
    rs = np.random.RandomState(args.seed)
    n = args.val_examples

    programs = sample_clevr_like_programs(vocab, n, seed=args.seed)
    questions = np.zeros((n, MAX_QUESTION_LENGTH), np.int64)
    for i in range(n):
        qlen = rs.randint(6, MAX_QUESTION_LENGTH + 1)
        questions[i, :qlen] = rs.randint(
            4, vocab.get_vocab_size("questions"), qlen
        )
    answers = rs.randint(0, vocab.get_vocab_size("answers") - 1, (n,))
    image_indices = rs.randint(0, args.num_images, (n,))

    with h5py.File(os.path.join(root, "val_tokens.h5"), "w") as f:
        f.attrs["split"] = "val"
        f.create_dataset("programs", data=programs.astype(np.int64))
        f.create_dataset("questions", data=questions)
        f.create_dataset("answers", data=answers)
        f.create_dataset("image_indices", data=image_indices)
    # The trainers build (unused for eval) train datasets too — reuse the file.
    with h5py.File(os.path.join(root, "val_features.h5"), "w") as f:
        f.attrs["split"] = "val"
        f.create_dataset(
            "features",
            data=rs.randn(args.num_images, 1024, 14, 14).astype(np.float32),
        )


def synthesize_checkpoints(root: str, args) -> dict:
    from probnmn_tpu.config import Config
    from probnmn_tpu.data.vocabulary import Vocabulary
    from probnmn_tpu.models import nmn as nmn_lib
    from tests.ref_checkpoints import (
        make_nmn_state,
        make_prior_state,
        make_seq2seq_state,
        save_reference_pth,
    )

    vocab = Vocabulary.from_files(os.path.join(root, "vocab"))
    nq = vocab.get_vocab_size("questions")
    np_ = vocab.get_vocab_size("programs")
    nmn_spec = nmn_lib.make_spec(vocab, Config(None, []))  # production defaults

    prior = make_prior_state(np_, 256, 256, 2, seed=1)
    pg = make_seq2seq_state(nq, np_, 256, 256, 2, seed=2)
    qr = make_seq2seq_state(np_, nq, 256, 256, 2, seed=3)
    nmn = make_nmn_state(vocab, nmn_spec, seed=4)

    paths = {}
    save_reference_pth(os.path.join(root, "program_prior_best.pth"),
                       {"program_prior": prior})
    save_reference_pth(os.path.join(root, "question_coding_best.pth"),
                       {"program_generator": pg, "question_reconstructor": qr})
    save_reference_pth(os.path.join(root, "module_training_best.pth"),
                       {"nmn": nmn, "program_generator": pg})
    save_reference_pth(os.path.join(root, "joint_training_best.pth"),
                       {"program_generator": pg, "question_reconstructor": qr,
                        "nmn": nmn})
    for phase in ("program_prior", "question_coding", "module_training",
                  "joint_training"):
        paths[phase] = os.path.join(root, f"{phase}_best.pth")
    return paths


def main(args):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    logger = logging.getLogger("realscale_parity")
    root = args.work_dir or tempfile.mkdtemp(prefix="probnmn_realscale_")
    os.makedirs(root, exist_ok=True)

    t0 = time.time()
    build_realscale_data(root, args)
    logger.info("real-scale val data in %.1fs (%s)", time.time() - t0, root)
    t0 = time.time()
    ckpts = synthesize_checkpoints(root, args)
    logger.info("reference-format .pth checkpoints in %.1fs", time.time() - t0)

    from scripts import verify_parity

    overrides = [
        "DATA.VOCABULARY", os.path.join(root, "vocab"),
        "DATA.VAL_TOKENS", os.path.join(root, "val_tokens.h5"),
        "DATA.VAL_FEATURES", os.path.join(root, "val_features.h5"),
        # trainers construct train datasets from these (never stepped here)
        "DATA.TRAIN_TOKENS", os.path.join(root, "val_tokens.h5"),
        "DATA.TRAIN_FEATURES", os.path.join(root, "val_features.h5"),
        "CHECKPOINTS.PROGRAM_PRIOR", ckpts["program_prior"],
        "CHECKPOINTS.QUESTION_CODING", ckpts["question_coding"],
        "CHECKPOINTS.MODULE_TRAINING", ckpts["module_training"],
        "OPTIM.BATCH_SIZE", args.batch_size,
        "SUPERVISION", 1000,
    ]
    report_path = os.path.join(root, "parity_report.json")
    cli = [
        "--checkpoints",
    ] + [f"{p}={path}" for p, path in ckpts.items()] + [
        "--config-override", *[str(o) for o in overrides],
        "--num-val-batches", str(args.num_val_batches),
        "--output", report_path,
    ]
    t0 = time.time()
    status = verify_parity.main(verify_parity.parser.parse_args(cli))
    eval_s = time.time() - t0
    if status != 0:
        logger.error("verify_parity returned %d", status)
        return status

    import jax

    from probnmn_tpu.ops.common import tpu_fused_kernels_supported

    device = jax.devices()[0]
    report = json.load(open(report_path))
    artifact = {
        "backend": {
            "platform": device.platform,
            "device_kind": device.device_kind,
            "fused_pallas_path": bool(tpu_fused_kernels_supported()),
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        },
        "shapes": {
            "batch_size": args.batch_size,
            "lstm": "256d x 2 layers",
            "nmn": "1024ch features, 128ch modules, 1024 classifier",
            "val_examples": args.val_examples,
        },
        "eval_seconds_all_phases": round(eval_s, 1),
        "phases": report,
    }

    if args.self_check:
        t0 = time.time()
        cli2 = [
            "--checkpoints", f"module_training={ckpts['module_training']}",
            "--config-override", *[str(o) for o in overrides],
            "--num-val-batches", str(args.num_val_batches),
            "--output", report_path + ".2",
        ]
        verify_parity.main(verify_parity.parser.parse_args(cli2))
        second = json.load(open(report_path + ".2"))
        same = second["module_training"] == report["module_training"]
        artifact["self_check_deterministic"] = bool(same)
        logger.info("self-check (module_training re-eval, %.1fs): %s",
                    time.time() - t0, "IDENTICAL" if same else "MISMATCH")

    # Write the artifact BEFORE the failure return — the evidence matters
    # most exactly when the self-check mismatches.
    json.dump(artifact, open(args.output, "w"), indent=2)
    logger.info("artifact written to %s", args.output)
    print(json.dumps({
        "artifact": args.output,
        "backend": artifact["backend"]["platform"],
        "fused_pallas_path": artifact["backend"]["fused_pallas_path"],
        "eval_seconds_all_phases": artifact["eval_seconds_all_phases"],
        "self_check_deterministic": artifact.get("self_check_deterministic"),
    }))
    return 1 if artifact.get("self_check_deterministic") is False else 0


if __name__ == "__main__":
    sys.exit(main(parser.parse_args()))

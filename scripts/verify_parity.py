r"""
Accuracy-parity verification against reference checkpoints (SURVEY.md §6).

Given reference v1.0 ``.pth`` checkpoints (kdexd/probnmn-clevr GitHub release)
and preprocessed CLEVR H5 data, this script ports each checkpoint's weights
into the JAX parameter pytrees (``utils/torch_interop.py`` — weight-for-weight,
incl. NMN per-token banks and NHWC permutes), runs the corresponding phase
evaluator over the validation split, and reports per-phase metrics. With
``--expected`` it checks each metric against the reference-reported value at
the ±0.5% tolerance from BASELINE.md.

Usage (paths are examples):

    python scripts/verify_parity.py \
        --checkpoints program_prior=ckpts/program_prior_best.pth \
                      question_coding=ckpts/question_coding_ours_best.pth \
                      module_training=ckpts/module_training_best.pth \
                      joint_training=ckpts/joint_training_ours_best.pth \
        --config-override DATA.VOCABULARY data/vocabulary \
                          DATA.VAL_TOKENS data/val_tokens.h5 \
                          DATA.VAL_FEATURES data/val_features.h5 \
        --expected expected_metrics.json \
        --output parity_report.json

``expected_metrics.json``: {"module_training": {"nmn": {"answer_accuracy": 0.9x}}, ...}
Exit status is non-zero if any expected metric misses tolerance.
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DEFAULT_CONFIGS = {
    "program_prior": "configs/program_prior.yml",
    "question_coding": "configs/question_coding_ours.yml",
    "module_training": "configs/module_training.yml",
    "joint_training": "configs/joint_training_ours.yml",
}

parser = argparse.ArgumentParser(description="Verify metric parity vs reference checkpoints.")
parser.add_argument(
    "--checkpoints",
    nargs="+",
    required=True,
    metavar="PHASE=PATH",
    help="phase=checkpoint pairs; .pth (reference, ported) or .ckpt (native).",
)
parser.add_argument(
    "--configs",
    nargs="*",
    default=[],
    metavar="PHASE=YAML",
    help="Override the default per-phase config YAMLs.",
)
parser.add_argument("--config-override", nargs="*", default=[])
parser.add_argument("--num-val-batches", type=int, default=0, help="0 = full val split.")
parser.add_argument("--expected", default="", help="JSON of reference metrics to check against.")
parser.add_argument("--tolerance", type=float, default=0.005, help="±0.5%% of BASELINE.md.")
parser.add_argument("--output", default="", help="Write the report JSON here.")


def _parse_pairs(pairs):
    out = {}
    for pair in pairs:
        phase, _, path = pair.partition("=")
        if not path:
            raise ValueError(f"Expected PHASE=PATH, got {pair!r}")
        out[phase] = path
    return out


def main(args):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    logger = logging.getLogger("verify_parity")

    from probnmn_tpu.config import Config
    from scripts.train import EVALUATORS, TRAINERS

    checkpoints = _parse_pairs(args.checkpoints)
    configs = dict(DEFAULT_CONFIGS, **_parse_pairs(args.configs))
    unknown = set(checkpoints) - set(TRAINERS)
    if unknown:
        raise ValueError(f"Unknown phases: {sorted(unknown)}")

    report = {}
    for phase in ("program_prior", "question_coding", "module_training", "joint_training"):
        if phase not in checkpoints:
            continue
        config = Config(configs[phase], list(args.config_override) + ["PHASE", phase])
        np.random.seed(config.RANDOM_SEED)
        trainer = TRAINERS[phase](config, serialization_dir="/tmp/probnmn_parity")
        evaluator = EVALUATORS[phase](config, trainer)
        trainer.load_checkpoint(checkpoints[phase])
        metrics = evaluator.evaluate(
            num_batches=args.num_val_batches or None
        )
        metrics = {
            model: {k: float(v) for k, v in m.items()}
            for model, m in metrics.items()
            if isinstance(m, dict)
        }
        report[phase] = metrics
        for model, m in metrics.items():
            for name, value in m.items():
                logger.info("%s / %s / %s = %.6f", phase, model, name, value)

    failures = []
    if args.expected:
        expected = json.load(open(args.expected))
        for phase, models in expected.items():
            for model, metrics in models.items():
                for name, want in metrics.items():
                    got = report.get(phase, {}).get(model, {}).get(name)
                    if got is None:
                        failures.append(f"{phase}/{model}/{name}: not measured")
                        continue
                    # ±tolerance relative to the reference value (BASELINE.md ±0.5%).
                    ok = abs(got - want) <= args.tolerance * max(abs(want), 1e-12)
                    logger.info(
                        "%s/%s/%s: got %.6f want %.6f (±%.3f%%) -> %s",
                        phase, model, name, got, want, 100 * args.tolerance,
                        "OK" if ok else "FAIL",
                    )
                    if not ok:
                        failures.append(
                            f"{phase}/{model}/{name}: got {got:.6f}, want {want:.6f}"
                        )

    if args.output:
        json.dump(report, open(args.output, "w"), indent=2)
        logger.info("report written to %s", args.output)

    if failures:
        for f in failures:
            logger.error("PARITY FAIL: %s", f)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(parser.parse_args()))

r"""
Evaluation CLI (reference ``scripts/evaluate.py``): build the phase trainer (for
model construction + checkpoint load) and evaluator, run the full val split, log
all metrics.
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from probnmn_tpu.config import Config
from scripts.train import EVALUATORS, TRAINERS

parser = argparse.ArgumentParser(description="Evaluate a checkpoint of a particular phase.")
parser.add_argument(
    "--phase",
    required=True,
    choices=["program_prior", "question_coding", "module_training", "joint_training"],
)
parser.add_argument("--config-yml", required=True)
parser.add_argument("--config-override", nargs="*", default=[])
parser.add_argument("--gpu-ids", nargs="+", type=int, default=[0], help="Ignored.")
parser.add_argument(
    "--compilation-cache-dir",
    default="",
    help="Enable JAX's persistent XLA compilation cache rooted here "
    "('auto' = $PROBNMN_COMPILATION_CACHE or ~/.cache/probnmn_tpu/xla).",
)
parser.add_argument("--cpu-workers", type=int, default=0)
parser.add_argument(
    "--streaming-features",
    action="store_true",
    help="Stream image features from the H5 store instead of loading it into "
    "RAM (module_training / joint_training phases only).",
)
parser.add_argument("--checkpoint-path", required=True)
parser.add_argument(
    "--num-devices", type=int, default=1,
    help="Data-parallel device count: 1 = single device, 0 = all visible, "
    "N = first N; val batches shard over the mesh.",
)


def main(args):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    if args.compilation_cache_dir:
        from probnmn_tpu.utils.compilation_cache import enable_compilation_cache

        logging.info(
            "Persistent XLA compilation cache: %s",
            enable_compilation_cache(
                None if args.compilation_cache_dir == "auto"
                else args.compilation_cache_dir
            ),
        )
    logger = logging.getLogger(__name__)
    config = Config(args.config_yml, args.config_override)
    if args.phase != config.PHASE:
        raise ValueError(
            f"Provided `--phase` as {args.phase}, expected config PHASE to match, "
            f"found {config.PHASE}"
        )
    print(config)
    np.random.seed(config.RANDOM_SEED)

    serialization_dir = os.path.dirname(args.checkpoint_path) or "/tmp/probnmn_eval"
    feature_kwargs = (
        {"in_memory_features": not args.streaming_features}
        if args.phase in ("module_training", "joint_training")
        else {}
    )
    trainer = TRAINERS[args.phase](
        config, serialization_dir=serialization_dir, cpu_workers=args.cpu_workers,
        num_devices=args.num_devices, **feature_kwargs,
    )
    evaluator = EVALUATORS[args.phase](config, trainer, **feature_kwargs)
    trainer.load_checkpoint(args.checkpoint_path)

    val_metrics = evaluator.evaluate()
    for model_name, metrics in val_metrics.items():
        if not isinstance(metrics, dict):
            continue
        for metric_name, value in metrics.items():
            logger.info("%s %s: %s", model_name, metric_name, value)


if __name__ == "__main__":
    main(parser.parse_args())

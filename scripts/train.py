r"""
Training CLI (reference ``scripts/train.py``): same argument surface, same
phase dispatch, same loop structure — ``trainer.step()`` every iteration,
evaluate + ``after_validation`` every ``--checkpoint-every`` iterations.

``--gpu-ids`` is accepted for CLI compatibility but ignored; its role is taken
by ``--num-devices``: the trainers build a ``jax.sharding.Mesh`` over that many
devices, shard each batch over the 'data' axis, and let GSPMD insert the
gradient all-reduce over ICI (data-parallel sharding replaces nn.DataParallel,
reference ``_trainer.py:92-100``).
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from tqdm import tqdm

from probnmn_tpu.config import Config
from probnmn_tpu.evaluators.joint_training_evaluator import JointTrainingEvaluator
from probnmn_tpu.evaluators.module_training_evaluator import ModuleTrainingEvaluator
from probnmn_tpu.evaluators.program_prior_evaluator import ProgramPriorEvaluator
from probnmn_tpu.evaluators.question_coding_evaluator import QuestionCodingEvaluator
from probnmn_tpu.training.joint_training_trainer import JointTrainingTrainer
from probnmn_tpu.training.module_training_trainer import ModuleTrainingTrainer
from probnmn_tpu.training.program_prior_trainer import ProgramPriorTrainer
from probnmn_tpu.training.question_coding_trainer import QuestionCodingTrainer

parser = argparse.ArgumentParser(description="Train a specified phase of ProbNMN (TPU).")
parser.add_argument(
    "--phase",
    required=True,
    choices=["program_prior", "question_coding", "module_training", "joint_training"],
)
parser.add_argument("--config-yml", required=True, help="Path to a config file.")
parser.add_argument(
    "--config-override",
    nargs="*",
    default=[],
    help="A sequence of key-value pairs overriding the config.",
)
parser.add_argument("--gpu-ids", nargs="+", type=int, default=[0], help="Ignored (JAX devices).")
parser.add_argument(
    "--num-devices",
    type=int,
    default=1,
    help="Data-parallel device count (replaces --gpu-ids): 1 = single device, "
    "0 = all visible devices, N = first N devices; batches shard over the mesh "
    "and GSPMD all-reduces gradients over ICI.",
)
parser.add_argument(
    "--profile-dir",
    default="",
    help="Capture a jax.profiler trace of --profile-steps training steps "
    "(after warmup/compilation) into this directory; view with TensorBoard's "
    "profile plugin or Perfetto.",
)
parser.add_argument(
    "--profile-steps", type=int, default=5,
    help="Number of steps to trace when --profile-dir is set.",
)
parser.add_argument(
    "--model-parallel",
    type=int,
    default=1,
    help="Devices per data shard reserved for the 'model' mesh axis (NMN bank "
    "expert-parallelism / classifier sharding); must divide --num-devices.",
)
parser.add_argument(
    "--compilation-cache-dir",
    default="",
    help="Enable JAX's persistent XLA compilation cache rooted here (or at "
    "$PROBNMN_COMPILATION_CACHE / ~/.cache/probnmn_tpu/xla when given as "
    "'auto'): later runs skip the multi-second first-step compile.",
)
parser.add_argument(
    "--streaming-features",
    action="store_true",
    help="Stream image features from the H5 store (in_memory=False readers + "
    "background chunked prefetch) instead of loading the full store into RAM. "
    "Required at the reference's 50-100 GB feature-store scale (reference "
    "readers.py:86); per-step losses are identical to in-memory and the "
    "prefetch hides disk behind compute (PERF.md round-5 H5-streaming note). "
    "Only module_training / joint_training read features.",
)
parser.add_argument("--cpu-workers", type=int, default=0)
parser.add_argument("--serialization-dir", default="checkpoints/experiment")
parser.add_argument("--checkpoint-every", type=int, default=500)
parser.add_argument("--start-from-checkpoint", default="")
parser.add_argument("--num-val-batches", type=int, default=256)

TRAINERS = {
    "program_prior": ProgramPriorTrainer,
    "question_coding": QuestionCodingTrainer,
    "module_training": ModuleTrainingTrainer,
    "joint_training": JointTrainingTrainer,
}
EVALUATORS = {
    "program_prior": ProgramPriorEvaluator,
    "question_coding": QuestionCodingEvaluator,
    "module_training": ModuleTrainingEvaluator,
    "joint_training": JointTrainingEvaluator,
}


def main(args):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    if args.compilation_cache_dir:
        from probnmn_tpu.utils.compilation_cache import enable_compilation_cache

        path = enable_compilation_cache(
            None if args.compilation_cache_dir == "auto"
            else args.compilation_cache_dir
        )
        logging.info("Persistent XLA compilation cache: %s", path)
    config = Config(args.config_yml, args.config_override)
    if args.phase != config.PHASE:
        raise ValueError(
            f"Provided `--phase` as {args.phase}, expected config PHASE to match, "
            f"found {config.PHASE}"
        )
    print(config)

    os.makedirs(args.serialization_dir, exist_ok=True)
    config.dump(os.path.join(args.serialization_dir, "config.yml"))

    # The supervision subset selection depends on this global seed
    # (reference train.py:104-110).
    np.random.seed(config.RANDOM_SEED)

    # Only the feature-reading phases accept the switch (program_prior /
    # question_coding never open a features H5).
    feature_kwargs = (
        {"in_memory_features": not args.streaming_features}
        if args.phase in ("module_training", "joint_training")
        else {}
    )
    trainer = TRAINERS[args.phase](
        config, serialization_dir=args.serialization_dir, cpu_workers=args.cpu_workers,
        num_devices=args.num_devices, model_parallel=args.model_parallel,
        **feature_kwargs,
    )
    evaluator = EVALUATORS[args.phase](config, trainer, **feature_kwargs)

    if args.start_from_checkpoint:
        trainer.load_checkpoint(args.start_from_checkpoint)

    # Profile window: trace steps [start+2, start+2+K) — the first steps pay
    # compilation and would bury the steady-state timeline.
    from probnmn_tpu.utils.observability import profile_trace

    start_iteration = trainer.iteration + 1
    profile_window = (
        range(start_iteration + 2, start_iteration + 2 + args.profile_steps)
        if args.profile_dir else range(0)
    )
    profiling = None
    for iteration in tqdm(
        range(start_iteration, config.OPTIM.NUM_ITERATIONS), desc="training"
    ):
        if profile_window and iteration == profile_window.start:
            profiling = profile_trace(args.profile_dir)
            profiling.__enter__()
        trainer.step(iteration)
        if profiling is not None and iteration == profile_window.stop - 1:
            profiling.__exit__(None, None, None)
            profiling = None
        if (iteration + 1) % args.checkpoint_every == 0:
            val_metrics = evaluator.evaluate(num_batches=args.num_val_batches)
            trainer.after_validation(val_metrics, iteration)
    if profiling is not None:
        profiling.__exit__(None, None, None)


if __name__ == "__main__":
    main(parser.parse_args())

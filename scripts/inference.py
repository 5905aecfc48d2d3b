r"""
Test-split inference CLI (reference ``scripts/inference.py``): load PG + NMN from a
joint-training checkpoint, sample programs from questions (the reference's default
decoding strategy at inference is *sampling* — ``seq2seq_base.py:105``,
``inference.py:80``), execute the NMN, and write ``{checkpoint}_predictions.json``
with ``[{"question_index", "answer"}]`` entries.
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from tqdm import tqdm

from probnmn_tpu.config import Config
from probnmn_tpu.data.datasets import JointTrainingDataset
from probnmn_tpu.data.pipeline import EpochIterator
from probnmn_tpu.serving import InferenceEngine

parser = argparse.ArgumentParser(
    description="Run inference on CLEVR v1.0 test split with a joint_training checkpoint."
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
    help="Stream test-split image features from the H5 store instead of "
    "loading it into RAM.",
)
parser.add_argument("--checkpoint-path", required=True)
parser.add_argument(
    "--num-devices", type=int, default=1,
    help="Serve each batch sharded over this many devices (0 = all visible).",
)
parser.add_argument(
    "--decoding-strategy", default="sampling",
    choices=["sampling", "greedy", "beam"],
    help="Program decode at inference: 'sampling' is the reference default "
    "(reference inference.py:80); 'greedy'/'beam' are deterministic "
    "alternatives (beam is a beyond-reference extension).",
)
parser.add_argument(
    "--beam-size", type=int, default=4,
    help="Beam width when --decoding-strategy beam (1 == greedy).",
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
    config = Config(args.config_yml, args.config_override)
    np.random.seed(config.RANDOM_SEED)

    dataset = JointTrainingDataset(
        config.DATA.TEST_TOKENS, config.DATA.TEST_FEATURES,
        in_memory=not args.streaming_features,
    )
    # include_last: the predictions JSON must cover EVERY test example (an
    # incomplete CLEVR submission is unusable); the engine pads the tail
    # partial batch to its compiled batch size internally.
    batches = EpochIterator(
        dataset, config.OPTIM.BATCH_SIZE, device_put=False, include_last=True
    )

    # The production serving engine: fused Pallas kernels on supported TPUs,
    # XLA paths elsewhere; sampling at inference is the reference's (quirky)
    # default decoding strategy (seq2seq_base.py:105, inference.py:80).
    engine = InferenceEngine.from_checkpoint(
        config, args.checkpoint_path, num_devices=args.num_devices,
        decoding=args.decoding_strategy, beam_size=args.beam_size,
    )

    predictions = []
    for batch in tqdm(iter(batches), total=len(batches), desc="inference"):
        answers = engine.predict(batch["question"], batch["image"])
        for question_index, answer in zip(np.asarray(batch["question_index"]), answers):
            predictions.append(
                {"question_index": int(question_index), "answer": answer}
            )

    output_path = args.checkpoint_path.rsplit(".", 1)[0] + "_predictions.json"
    with open(output_path, "w") as f:
        json.dump(predictions, f)
    logging.getLogger(__name__).info("Wrote %d predictions to %s", len(predictions), output_path)


if __name__ == "__main__":
    main(parser.parse_args())

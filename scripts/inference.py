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

import jax
import numpy as np
from tqdm import tqdm

from probnmn_tpu.config import Config
from probnmn_tpu.data.datasets import JointTrainingDataset
from probnmn_tpu.data.pipeline import EpochIterator, image_to_nhwc
from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.models import nmn as nmn_lib
from probnmn_tpu.models import program_generator
from probnmn_tpu.models.seq2seq import sampling_forward_serving
from probnmn_tpu.utils.checkpointing import load_objects

parser = argparse.ArgumentParser(
    description="Run inference on CLEVR v1.0 test split with a joint_training checkpoint."
)
parser.add_argument("--config-yml", required=True)
parser.add_argument("--config-override", nargs="*", default=[])
parser.add_argument("--gpu-ids", nargs="+", type=int, default=[0], help="Ignored.")
parser.add_argument("--cpu-workers", type=int, default=0)
parser.add_argument("--checkpoint-path", required=True)


def main(args):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    config = Config(args.config_yml, args.config_override)
    np.random.seed(config.RANDOM_SEED)

    vocabulary = Vocabulary.from_files(config.DATA.VOCABULARY)
    dataset = JointTrainingDataset(config.DATA.TEST_TOKENS, config.DATA.TEST_FEATURES)
    batches = EpochIterator(dataset, config.OPTIM.BATCH_SIZE)

    pg_spec = program_generator.make_spec(vocabulary, config)
    nmn_spec = nmn_lib.make_spec(vocabulary, config)
    templates = {
        "program_generator": program_generator.init_params(jax.random.PRNGKey(0), pg_spec),
        "nmn": nmn_lib.init_nmn_params(jax.random.PRNGKey(0), nmn_spec),
    }
    restored, _, _ = load_objects(args.checkpoint_path, templates)
    pg_params = jax.device_put(restored["program_generator"])
    nmn_params = jax.device_put(restored["nmn"])

    # Serving path: the fused Pallas NMN interpreter (bf16) — ~10x the XLA
    # register machine's inference throughput on TPU.
    nmn_spec.compute_dtype = "bfloat16"
    # Pallas TPU kernels need interpret mode on CPU backends.
    nmn_fast = nmn_lib.make_fast_inference_fn(
        nmn_params, nmn_spec, interpret=jax.default_backend() == "cpu"
    )

    @jax.jit
    def infer_step(pg_p, questions, images, rng):
        # Sampling at inference is the reference's (quirky) default; the fused
        # Pallas sampling kernel serves it on TPU, the XLA scan elsewhere.
        pg_out = sampling_forward_serving(pg_p, pg_spec, questions, rng)
        nmn_out = nmn_fast(image_to_nhwc(images), pg_out["predictions"])
        return nmn_out["predictions"]

    rng = jax.random.PRNGKey(config.RANDOM_SEED)
    predictions = []
    for batch in tqdm(iter(batches), total=len(batches), desc="inference"):
        rng, sub = jax.random.split(rng)
        answers = infer_step(pg_params, batch["question"], batch["image"], sub)
        for question_index, answer in zip(
            np.asarray(batch["question_index"]), np.asarray(answers)
        ):
            predictions.append(
                {
                    "question_index": int(question_index),
                    "answer": vocabulary.get_token_from_index(int(answer), "answers"),
                }
            )

    output_path = args.checkpoint_path.rsplit(".", 1)[0] + "_predictions.json"
    with open(output_path, "w") as f:
        json.dump(predictions, f)
    logging.getLogger(__name__).info("Wrote %d predictions to %s", len(predictions), output_path)


if __name__ == "__main__":
    main(parser.parse_args())

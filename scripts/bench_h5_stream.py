r"""
Scale-realistic data-path evidence (VERDICT r4 item 4): stream a multi-GB
features H5 through the PRODUCTION module_training trainer with
``in_memory=False`` and prove that

(a) the streaming reader is numerically invisible — per-step losses are
    IDENTICAL to an ``in_memory=True`` run with the same seed,
(b) the host pipeline keeps up — ``prefetch_wait_ms`` ~ 0 at steady state
    (the consumer never blocks on the gather thread), and
(c) the raw gather rates (streaming vs in-memory) are on record in MB/s.

The reference's operating reality is 50-100 GB feature stores per split
(reference ``probnmn/data/readers.py:86``), which is exactly why its
``in_memory=False`` reopen-per-item path exists; this repo's equivalent is a
chunked h5py read inside ``BatchIterator``'s background gather thread
(``data/pipeline.py``), previously proven equivalent only at fixture scale
(``tests/test_pipeline.py``).

The features file is synthesized at real CLEVR geometry ((N, 1024, 14, 14)
float32, ~0.77 MB/image), sized by ``--gb``. The NMN is narrowed via
``--nmn-channels`` so the loss-equality leg is tractable on the CPU backend
(the data path under test is identical; the model width is not part of it).

Run: python scripts/bench_h5_stream.py --gb 4 --steps 200
"""
import argparse
import json
import logging
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import numpy as np

from probnmn_tpu.config import Config
from probnmn_tpu.utils.clevr import (
    MAX_PROGRAM_LENGTH,
    MAX_QUESTION_LENGTH,
    make_clevr_like_vocabulary,
    sample_clevr_like_programs,
)

parser = argparse.ArgumentParser(description="Multi-GB H5 streaming through the trainer.")
parser.add_argument("--root", default="/tmp/h5_stream_bench")
parser.add_argument("--gb", type=float, default=4.0,
                    help="Features H5 size in GiB (real CLEVR is 50-100 GB/split).")
parser.add_argument("--steps", type=int, default=200)
parser.add_argument("--batch-size", type=int, default=128)
parser.add_argument("--nmn-channels", type=int, default=32,
                    help="NMN module width for the loss-equality leg (the data "
                    "path is identical at any width; 32 keeps CPU steps ~1s).")
parser.add_argument("--gather-batches", type=int, default=64,
                    help="Batches for the raw gather-rate measurement.")
parser.add_argument("--examples", type=int, default=20000)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--keep", action="store_true", help="Keep the synthesized H5s.")
parser.add_argument("--out", default="", help="Append one JSON line here too.")

BYTES_PER_IMAGE = 1024 * 14 * 14 * 4


def synthesize(args) -> dict:
    os.makedirs(args.root, exist_ok=True)
    n_images = max(int(args.gb * 2**30 // BYTES_PER_IMAGE), 64)
    feats_path = os.path.join(args.root, "train_features.h5")
    marker = os.path.join(args.root, "SPEC.json")
    spec = {"n_images": n_images, "examples": args.examples, "seed": args.seed}
    if not (os.path.exists(marker) and json.load(open(marker)) == spec):
        logging.info("writing %d images (%.2f GiB) to %s ...",
                     n_images, n_images * BYTES_PER_IMAGE / 2**30, feats_path)
        rs = np.random.RandomState(args.seed)
        t0 = time.time()
        with h5py.File(feats_path, "w") as f:
            f.attrs["split"] = "train"
            d = f.create_dataset("features", shape=(n_images, 1024, 14, 14),
                                 dtype=np.float32)
            chunk = 256
            for start in range(0, n_images, chunk):
                stop = min(start + chunk, n_images)
                d[start:stop] = rs.randn(stop - start, 1024, 14, 14).astype(
                    np.float32
                )
        logging.info("features written in %.1fs", time.time() - t0)

        vocab = make_clevr_like_vocabulary()
        vocab.save_to_files(os.path.join(args.root, "vocab"))
        n = args.examples
        programs = np.asarray(sample_clevr_like_programs(vocab, n, seed=args.seed))
        padded = np.zeros((n, MAX_PROGRAM_LENGTH), np.int64)
        padded[:, : programs.shape[1]] = programs
        questions = np.zeros((n, MAX_QUESTION_LENGTH), np.int64)
        for i in range(n):
            qlen = rs.randint(6, MAX_QUESTION_LENGTH + 1)
            questions[i, :qlen] = rs.randint(4, vocab.get_vocab_size("questions"), qlen)
        with h5py.File(os.path.join(args.root, "train_tokens.h5"), "w") as f:
            f.attrs["split"] = "train"
            f.create_dataset("programs", data=padded)
            f.create_dataset("questions", data=questions)
            f.create_dataset("answers",
                             data=rs.randint(0, 28, (n,)).astype(np.int64))
            f.create_dataset("image_indices",
                             data=rs.randint(0, n_images, (n,)).astype(np.int64))
        json.dump(spec, open(marker, "w"))
    return {"n_images": n_images,
            "gib": round(n_images * BYTES_PER_IMAGE / 2**30, 2)}


def gather_rate(args, in_memory: bool) -> dict:
    r"""Raw dataset gather rate (the work BatchIterator's background thread
    does), isolated from model compute."""
    from probnmn_tpu.data.datasets import ModuleTrainingDataset

    t_open0 = time.time()
    dataset = ModuleTrainingDataset(
        os.path.join(args.root, "train_tokens.h5"),
        os.path.join(args.root, "train_features.h5"),
        in_memory=in_memory,
    )
    open_s = time.time() - t_open0
    rs = np.random.RandomState(1)
    t0 = time.time()
    n_bytes = 0
    for _ in range(args.gather_batches):
        idx = rs.randint(0, len(dataset), args.batch_size)
        batch = dataset.get_batch(idx)
        n_bytes += batch["image"].nbytes
    elapsed = time.time() - t0
    return {
        "open_s": round(open_s, 2),
        "batches_per_s": round(args.gather_batches / elapsed, 2),
        "mb_per_s": round(n_bytes / 2**20 / elapsed, 1),
    }


def trainer_run(args, in_memory: bool) -> dict:
    r"""args.steps production ModuleTrainingTrainer steps; returns the loss
    trajectory and the pipeline's per-stage timers."""
    import jax

    from probnmn_tpu.models import program_generator
    from probnmn_tpu.training.module_training_trainer import ModuleTrainingTrainer
    from probnmn_tpu.utils.checkpointing import save_objects
    from probnmn_tpu.data.vocabulary import Vocabulary

    config = Config(None, [
        "PHASE", "module_training",
        "RANDOM_SEED", args.seed,
        "DATA.VOCABULARY", os.path.join(args.root, "vocab"),
        "DATA.TRAIN_TOKENS", os.path.join(args.root, "train_tokens.h5"),
        "DATA.TRAIN_FEATURES", os.path.join(args.root, "train_features.h5"),
        "DATA.VAL_TOKENS", os.path.join(args.root, "train_tokens.h5"),
        "DATA.VAL_FEATURES", os.path.join(args.root, "train_features.h5"),
        "CHECKPOINTS.QUESTION_CODING", os.path.join(args.root, "qc.ckpt"),
        "NMN.MODULE_CHANNELS", args.nmn_channels,
        "OPTIM.BATCH_SIZE", args.batch_size,
        "OPTIM.NUM_ITERATIONS", args.steps,
    ])
    if not os.path.exists(config.CHECKPOINTS.QUESTION_CODING):
        vocab = Vocabulary.from_files(config.DATA.VOCABULARY)
        pg_spec = program_generator.make_spec(vocab, config)
        save_objects(config.CHECKPOINTS.QUESTION_CODING, {
            "program_generator": program_generator.init_params(
                jax.random.PRNGKey(2), pg_spec)
        })

    ser_dir = os.path.join(args.root, f"run_{'mem' if in_memory else 'stream'}")
    shutil.rmtree(ser_dir, ignore_errors=True)
    os.makedirs(ser_dir)
    trainer = ModuleTrainingTrainer(
        config, serialization_dir=ser_dir, in_memory_features=in_memory
    )
    losses = []
    t0 = time.time()
    batches = iter(trainer._batches) if not hasattr(trainer._batches, "__next__") \
        else trainer._batches
    for _ in range(args.steps):
        batch = next(batches)
        out = trainer._do_iteration(batch)
        losses.append(float(np.asarray(out["loss"])))
    wall = time.time() - t0
    stage = trainer._batch_source.stage_metrics() \
        if hasattr(trainer._batch_source, "stage_metrics") else {}
    return {
        "losses": losses,
        "wall_s": round(wall, 1),
        "ms_per_step": round(1e3 * wall / args.steps, 1),
        "stage_metrics": {k: round(v, 3) for k, v in stage.items()},
    }


def main(args):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    import jax

    size = synthesize(args)
    logging.info("dataset: %s", size)

    rates = {"stream": gather_rate(args, in_memory=False)}
    # In-memory open loads the whole file into RAM; rate is the fancy-index copy.
    rates["in_memory"] = gather_rate(args, in_memory=True)
    logging.info("gather rates: %s", rates)

    stream = trainer_run(args, in_memory=False)
    mem = trainer_run(args, in_memory=True)
    identical = stream["losses"] == mem["losses"]
    max_dev = max(
        (abs(a - b) for a, b in zip(stream["losses"], mem["losses"])), default=0.0
    )
    result = {
        "bench": "h5_stream",
        "backend": jax.devices()[0].platform,
        "features_gib": size["gib"],
        "n_images": size["n_images"],
        "steps": args.steps,
        "batch_size": args.batch_size,
        "nmn_channels": args.nmn_channels,
        "gather": rates,
        "stream_run": {k: v for k, v in stream.items() if k != "losses"},
        "in_memory_run": {k: v for k, v in mem.items() if k != "losses"},
        "losses_identical": identical,
        "loss_max_abs_dev": max_dev,
    }
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    if not args.keep:
        shutil.rmtree(args.root, ignore_errors=True)
    if not identical:
        logging.error("streaming losses deviated from in-memory (max %g)", max_dev)
        sys.exit(1)


if __name__ == "__main__":
    main(parser.parse_args())

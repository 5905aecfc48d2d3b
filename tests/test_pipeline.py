"""Host->device batch pipeline: background-thread prefetch determinism, error
propagation, and the in_memory=False streaming feature-reader path (the
reference's 50-100 GB H5 case, reference readers.py:86 + multi-worker
DataLoader, reference scripts/train.py:52-54)."""
import os
import threading

import numpy as np
import pytest

from probnmn_tpu.data.pipeline import BatchIterator
from probnmn_tpu.data.readers import ClevrImageFeaturesReader
from probnmn_tpu.data.samplers import RandomSampler

from tests.clevr_fixtures import build_fixture_data, make_fixture_config


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipe"))
    build_fixture_data(root)
    return root


def test_streaming_reader_matches_in_memory(data_root):
    """Batched fancy-index reads with unsorted, duplicated indices through the
    persistent-handle streaming path equal the in-memory array."""
    path = os.path.join(data_root, "train_features.h5")
    mem = ClevrImageFeaturesReader(path, in_memory=True)
    stream = ClevrImageFeaturesReader(path, in_memory=False)
    assert len(mem) == len(stream)

    rs = np.random.RandomState(0)
    for _ in range(3):
        idx = rs.randint(0, len(mem), size=8)  # unsorted, with duplicates
        np.testing.assert_array_equal(stream[idx], mem[idx])
    np.testing.assert_array_equal(stream[3], mem[3])


def test_batch_iterator_background_thread_is_deterministic(data_root):
    """The worker-thread pipeline yields exactly the same batch stream as the
    synchronous path (seeded sampler; FIFO handoff), and actually runs the
    gather off the consumer thread."""
    from probnmn_tpu.data.datasets import ModuleTrainingDataset

    config = make_fixture_config(data_root, "module_training")
    gather_threads = set()

    class SpyDataset(ModuleTrainingDataset):
        def get_batch(self, indices):
            gather_threads.add(threading.current_thread().name)
            return super().get_batch(indices)

    def take(n, **kw):
        ds = SpyDataset(config.DATA.TRAIN_TOKENS, config.DATA.TRAIN_FEATURES)
        it = iter(BatchIterator(
            ds, RandomSampler(len(ds), seed=0), 8, device_put=False, **kw
        ))
        return [next(it) for _ in range(n)]

    sync = take(4, prefetch=0)
    gather_threads.clear()
    bg = take(4, prefetch=2)
    assert gather_threads == {"probnmn-batch-prefetch"}
    for a, b in zip(sync, bg):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_batch_iterator_propagates_worker_errors(data_root):
    from probnmn_tpu.data.datasets import ModuleTrainingDataset

    config = make_fixture_config(data_root, "module_training")

    class BoomDataset(ModuleTrainingDataset):
        def get_batch(self, indices):
            raise RuntimeError("boom in worker")

    ds = BoomDataset(config.DATA.TRAIN_TOKENS, config.DATA.TRAIN_FEATURES)
    it = iter(BatchIterator(ds, RandomSampler(len(ds), seed=0), 8, device_put=False))
    with pytest.raises(RuntimeError, match="boom in worker"):
        next(it)


def test_module_trainer_streaming_features_matches_in_memory(data_root):
    """ModuleTrainingTrainer(in_memory_features=False) — h5py streaming reads
    on the prefetch thread — reproduces the in-memory losses exactly."""
    import jax
    from probnmn_tpu.data.vocabulary import Vocabulary
    from probnmn_tpu.models import program_generator
    from probnmn_tpu.training.module_training_trainer import ModuleTrainingTrainer
    from probnmn_tpu.utils.checkpointing import save_objects

    config = make_fixture_config(data_root, "module_training")
    ckpt = os.path.join(data_root, "question_coding_best.ckpt")
    if not os.path.exists(ckpt):
        vocab = Vocabulary.from_files(config.DATA.VOCABULARY)
        pg_spec = program_generator.make_spec(vocab, config)
        save_objects(ckpt, {
            "program_generator": program_generator.init_params(
                jax.random.PRNGKey(3), pg_spec
            )
        })

    losses = {}
    for in_mem in (True, False):
        np.random.seed(config.RANDOM_SEED)
        trainer = ModuleTrainingTrainer(
            config, os.path.join(data_root, f"run_mem_{in_mem}"),
            in_memory_features=in_mem,
        )
        ls = []
        for _ in range(3):
            logs = trainer._do_iteration(next(trainer._batches))
            ls.append(float(logs["loss"]))
        losses[in_mem] = ls
    np.testing.assert_array_equal(losses[True], losses[False])


def test_epoch_iterator_include_last_covers_every_example(data_root):
    """include_last=True yields the tail partial batch so consumers that must
    cover EVERY example (test-split inference) don't silently drop up to
    batch_size-1 rows (ADVICE r3); the default still drops it for static
    shapes."""
    from probnmn_tpu.data.datasets import ModuleTrainingDataset
    from probnmn_tpu.data.pipeline import EpochIterator

    dataset = ModuleTrainingDataset(
        os.path.join(data_root, "train_tokens.h5"),
        os.path.join(data_root, "train_features.h5"),
    )
    n = len(dataset)
    batch = 16
    assert n % batch != 0  # fixture has a genuine tail (40 % 16 == 8)

    default = EpochIterator(dataset, batch, device_put=False)
    covered = sum(b["question"].shape[0] for b in default)
    assert covered == (n // batch) * batch
    assert len(default) == n // batch

    full = EpochIterator(dataset, batch, device_put=False, include_last=True)
    sizes = [b["question"].shape[0] for b in full]
    assert sum(sizes) == n
    assert sizes[-1] == n % batch
    assert len(full) == len(sizes)

r"""
Host->device batch pipeline.

Replaces the reference's multi-worker torch ``DataLoader`` + per-batch ``.to(device)``
(reference ``_trainer.py:272-287``) with a cyclic fixed-shape batch iterator over
vectorized dataset gathers, plus asynchronous ``jax.device_put`` double-buffering:
the next batch's host gather and H2D copy overlap with the current device step
(JAX dispatch is async, so simply staying one batch ahead suffices).

Image features arrive NCHW from the H5 files (reference layout (N, 1024, 14, 14))
and are shipped to the device AS-IS (a zero-copy slice of the in-memory array);
the NHWC transpose for the TPU-native activation layout happens inside the jitted
step (`image_to_nhwc`) where it fuses for free — a host-side transpose of
~100 MB/batch was the data-pipeline bottleneck on small hosts.
"""
from __future__ import annotations

import queue
import threading
import time
from collections import deque
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np


def image_to_nhwc(image):
    r"""NCHW -> NHWC, for use INSIDE jitted steps (fuses with the consumer)."""
    import jax.numpy as jnp

    return jnp.transpose(image, (0, 2, 3, 1))


class BatchIterator:
    r"""Cyclic iterator of fixed-size batches: sampler epochs are concatenated and the
    remainder at an epoch boundary is dropped forward (batches never straddle a
    partially-refilled epoch with dynamic size — shapes stay static for jit)."""

    def __init__(
        self,
        dataset,
        sampler,
        batch_size: int,
        transform: Optional[Callable] = None,
        device_put: bool = True,
        prefetch: int = 2,
        sharding=None,
        sort_descending_by: Optional[str] = None,
    ):
        self._dataset = dataset
        self._sampler = sampler
        self._batch_size = batch_size
        self._transform = transform
        self._device_put = device_put
        self._prefetch = max(prefetch, 0)
        # Optional jax.sharding.Sharding: place batches directly onto the mesh
        # (batch axis over 'data') instead of the default device.
        self._sharding = sharding
        # Optional key (e.g. "supervision"): stable-sort each batch's rows by
        # that field, descending, and attach the host-side count of nonzero
        # rows under "_num_<key>" (a plain int, never shipped to the device).
        # The semi-supervised trainers use this to run each pass on a static
        # supervised/unsupervised window (training/_subbatch.py). Sorting on
        # the gather thread is free relative to the h5py reads.
        self._sort_key = sort_descending_by
        # Per-stage pipeline timers (rolling): how long the consumer waited on
        # the prefetch queue (producer behind = host gather is the bottleneck)
        # and how long device_put dispatch took. Drained into TensorBoard by
        # the trainers (utils/observability.py StepTimer covers the total).
        self._wait_times: deque = deque(maxlen=50)
        self._put_times: deque = deque(maxlen=50)

    def stage_metrics(self) -> Dict[str, float]:
        r"""Rolling per-stage averages in ms: ``prefetch_wait_ms`` (consumer
        blocked on the host-gather queue) and ``h2d_dispatch_ms``
        (``jax.device_put`` call time; the copy itself is asynchronous)."""
        out = {}
        if self._wait_times:
            out["prefetch_wait_ms"] = 1e3 * sum(self._wait_times) / len(self._wait_times)
        if self._put_times:
            out["h2d_dispatch_ms"] = 1e3 * sum(self._put_times) / len(self._put_times)
        return out

    def _index_stream(self) -> Iterator[np.ndarray]:
        while True:
            order = self._sampler.epoch()
            for start in range(0, len(order) - self._batch_size + 1, self._batch_size):
                yield order[start : start + self._batch_size]

    def _host_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        for indices in self._index_stream():
            batch = self._dataset.get_batch(indices)
            if self._transform is not None:
                batch = self._transform(batch)
            if self._sort_key is not None:
                key_values = np.asarray(batch[self._sort_key])
                order = np.argsort(-key_values.astype(np.int64), kind="stable")
                batch = {k: v[order] for k, v in batch.items()}
                batch["_num_" + self._sort_key] = int(
                    np.count_nonzero(key_values)
                )
            yield batch

    def _put(self, batch):
        if not self._device_put:
            return batch
        t0 = time.perf_counter()
        # Keys starting with "_" are host-side metadata (plain Python scalars),
        # not batch arrays — they stay on the host.
        meta = {k: v for k, v in batch.items() if k.startswith("_")}
        if not meta:
            out = jax.device_put(batch, self._sharding)
        else:
            arrays = {k: v for k, v in batch.items() if not k.startswith("_")}
            out = jax.device_put(arrays, self._sharding)
            out.update(meta)
        self._put_times.append(time.perf_counter() - t0)
        return out

    def __iter__(self):
        it = self._host_batches()
        if self._prefetch == 0:
            for batch in it:
                yield self._put(batch)
            return
        # Background worker thread: the HOST gather (h5py reads for streaming
        # feature files, fancy-index copies) runs off the consumer thread,
        # bounded by a `prefetch`-deep queue — the TPU-native form of the
        # reference's multi-worker DataLoader (reference scripts/train.py:52-54),
        # essential with in_memory=False where each batch costs a
        # 50-100 GB-file h5py fancy-index read (reference readers.py:86) that
        # would otherwise block the train step. The device_put itself stays on
        # the CONSUMER thread (with a one-batch device-side lookahead so the
        # async H2D copy still overlaps compute): issuing device RPCs from a
        # second thread while the trainer blocks on a result fetch deadlocks
        # tunneled single-chip runtimes (reproduced on the axon v5e tunnel),
        # and dispatch is cheap — the expensive work is the host gather.
        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        stop = threading.Event()
        done = object()  # completion sentinel (the cyclic stream never ends,
        # but the protocol must terminate cleanly for any finite iterator)

        def worker():
            try:
                for batch in it:
                    if stop.is_set():
                        return
                    q.put(batch)
                q.put(done)
            except BaseException as e:  # surface reader errors on the consumer
                q.put(e)

        thread = threading.Thread(
            target=worker, daemon=True, name="probnmn-batch-prefetch"
        )
        thread.start()
        try:
            device_ahead = []
            while True:
                t0 = time.perf_counter()
                item = q.get()
                self._wait_times.append(time.perf_counter() - t0)
                if item is done:
                    break
                if isinstance(item, BaseException):
                    raise item
                device_ahead.append(self._put(item))
                if len(device_ahead) > 1:
                    yield device_ahead.pop(0)
            while device_ahead:
                yield device_ahead.pop(0)
            return
        finally:
            stop.set()
            # Unblock a worker stuck in q.put so it can observe `stop`.
            try:
                q.get_nowait()
            except queue.Empty:
                pass


class EpochIterator:
    r"""Single-pass (evaluation) iterator; by default drops the final partial
    batch to keep static shapes, mirroring the reference evaluator's fixed
    ``num_batches`` loop. ``include_last=True`` additionally yields the tail
    partial batch (smaller first axis) — required by consumers that must cover
    EVERY example, e.g. test-split inference, where the serving engine pads any
    ``n <= batch_size`` to its compiled batch anyway."""

    def __init__(self, dataset, batch_size: int, transform=None, device_put=True,
                 sharding=None, include_last: bool = False):
        self._dataset = dataset
        self._batch_size = batch_size
        self._transform = transform
        self._device_put = device_put
        self._sharding = sharding
        self._include_last = include_last

    def __len__(self):
        n_full = len(self._dataset) // self._batch_size
        if self._include_last and len(self._dataset) % self._batch_size:
            return n_full + 1
        return n_full

    def __iter__(self):
        n = len(self._dataset)
        stop = n if self._include_last else n - self._batch_size + 1
        for start in range(0, stop, self._batch_size):
            indices = np.arange(start, min(start + self._batch_size, n))
            batch = self._dataset.get_batch(indices)
            if self._transform is not None:
                batch = self._transform(batch)
            yield jax.device_put(batch, self._sharding) if self._device_put else batch

r"""
Production serving engine: question tokens + image features -> CLEVR answers.

The reference has no serving layer — its closest surface is
``scripts/inference.py`` (reference ``inference.py:74-95``), a batch script.
This module packages that pipeline as a long-lived engine for deployment:

- **A fixed set of compiled executables.** The engine pads every request
  batch to a compiled size — the full ``batch_size`` on the sync
  :meth:`predict` path, the smallest covering *bucket* on the dispatcher
  path — and un-pads the answers, so a handful of jitted pipelines serve all
  request sizes (static shapes are what keep XLA/Mosaic fast — recompiling
  per request size would stall the service). The pipeline is the production
  path: fused Pallas sampling kernel + fused Pallas NMN interpreter on
  supported TPUs (v4+), the XLA scan/register-machine paths elsewhere —
  identical semantics either way.
- **Sampling at inference** mirrors the reference's (quirky) default decoding
  strategy (reference ``seq2seq_base.py:105``, ``inference.py:80``); each
  batch advances an internal PRNG key chain.
- **Optional micro-batching.** ``submit()`` enqueues a single request and
  returns a ``concurrent.futures.Future``; a dispatcher thread coalesces
  queued requests up to ``batch_size`` or a max-latency deadline and runs them
  as one device batch — the standard continuous-batching pattern for small
  per-request payloads on accelerators.
- **Bucketed micro-batches.** The dispatcher pads each coalesced group to the
  smallest compiled *bucket* (a short ladder ``batch_size // 4**k``, e.g.
  4/16/64/256) rather than always to the full batch: at low offered load a
  lone request pays a 4-wide upload + pipeline instead of a 256-wide one —
  up to ``batch_size/bucket``× less host->device traffic and device compute
  per micro-batch. Buckets compile lazily on first use (or eagerly via
  :meth:`warmup`); the sync :meth:`predict` keeps the original
  single-executable fixed-batch contract.
- **Half-width feature uploads.** Feature batches cross host->device in the
  NMN compute dtype (bf16 on fused-kernel TPUs) — numerically identical to
  the on-device cast the pipeline performs anyway, at half the transfer
  bytes for the ~0.8 MB/example payload.
- **Warm restarts.** ``compilation_cache_dir=...`` persists the compiled
  pipeline across process restarts (see
  ``probnmn_tpu.utils.compilation_cache``).

Use :meth:`InferenceEngine.from_checkpoint` with a joint_training (or
module_training + question_coding) checkpoint — native ``.ckpt`` or reference
``.pth`` (ported weight-for-weight).
"""
from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from queue import Empty, Queue
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from probnmn_tpu.data.pipeline import image_to_nhwc
from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.models import nmn as nmn_lib
from probnmn_tpu.models import program_generator
from probnmn_tpu.models.seq2seq import sampling_forward_serving


class InferenceEngine:
    def __init__(
        self,
        vocabulary: Vocabulary,
        pg_spec,
        nmn_spec,
        pg_params,
        nmn_params,
        batch_size: int = 256,
        rng_seed: int = 0,
        num_devices: Optional[int] = None,
        compilation_cache_dir: Optional[str] = None,
        decoding: str = "sampling",
        beam_size: int = 1,
    ):
        r"""``decoding`` selects the program-decode strategy: ``"sampling"``
        (the reference inference default, ``inference.py:80``), ``"greedy"``
        (the reference evaluators' choice), or ``"beam"`` (beyond-reference;
        width ``beam_size``, XLA beam search over the same distribution —
        ``beam_size=1`` == greedy)."""
        if compilation_cache_dir is not None:
            # Persist the compiled pipeline across restarts (the first-batch
            # compile is tens of seconds): "auto" resolves to
            # $PROBNMN_COMPILATION_CACHE or ~/.cache/probnmn_tpu/xla.
            from probnmn_tpu.utils.compilation_cache import enable_compilation_cache

            enable_compilation_cache(
                None if compilation_cache_dir == "auto" else compilation_cache_dir
            )
        self._vocabulary = vocabulary
        self._pg_spec = pg_spec
        self._nmn_spec = nmn_spec
        self._batch_size = batch_size
        self._rng = jax.random.PRNGKey(rng_seed)

        # Upload feature batches in the NMN compute dtype: the pipeline casts
        # them to it on device anyway, so converting on HOST first is
        # numerically identical — and it halves the host->device bytes for
        # the ~0.8 MB/example feature payload, the serving bottleneck once
        # requests cross PCIe/network rather than staying device-resident.
        feat_dtype = nmn_spec.compute_dtype
        if feat_dtype == "auto":
            from probnmn_tpu.ops.common import tpu_fused_kernels_supported

            feat_dtype = (
                "bfloat16" if tpu_fused_kernels_supported() else "float32"
            )
        compute_dtype = jnp.dtype(feat_dtype)
        self._feature_dtype = compute_dtype

        # Multi-chip serving: shard each padded batch over a data mesh (same
        # policy as the trainers' --num-devices; the fused kernels route
        # through their shard_map wrappers, everything else under GSPMD).
        from probnmn_tpu.parallel.mesh import auto_mesh, batch_sharding

        self._mesh = auto_mesh(num_devices, batch_size)
        self._batch_sharding = batch_sharding(self._mesh) if self._mesh else None
        mesh = self._mesh
        self._pg_params = jax.device_put(pg_params)

        # Production NMN path: fused Pallas interpreter on supported TPUs; the
        # XLA register machine elsewhere (same contract — interpret-mode Pallas
        # on CPU would be orders of magnitude slower than the XLA machine).
        if nmn_lib.fast_training_available(nmn_spec):
            from probnmn_tpu.ops.pallas.nmn_interpreter import build_kernel_tables

            # Build the banks in the engine's resolved compute dtype — the
            # fused path derives its math dtype from the banks, so defaulting
            # here would silently ignore a caller-requested float32.
            banks, tables = build_kernel_tables(
                nmn_params, nmn_spec, dtype=compute_dtype
            )
            stem_p = nmn_params["stem"]
            cls_p = nmn_params["classifier"]

            def nmn_forward(features, programs):
                return nmn_lib.fast_forward_from_tables(
                    banks, tables, nmn_spec, stem_p, cls_p, features, programs,
                    mesh=mesh,
                )
        else:
            nmn_params = jax.device_put(nmn_params)

            def nmn_forward(features, programs):
                return nmn_lib.nmn_forward(nmn_params, nmn_spec, features, programs)

        if decoding not in ("sampling", "greedy", "beam"):
            raise ValueError(f"unknown decoding strategy: {decoding!r}")
        self._decoding = decoding
        self._beam_size = beam_size

        def decode_programs(pg_params, questions, rng):
            if decoding == "beam":
                from probnmn_tpu.models.seq2seq import beam_search_forward

                return beam_search_forward(pg_params, pg_spec, questions, beam_size)
            if decoding == "greedy":
                from probnmn_tpu.models.seq2seq import GREEDY, seq2seq_forward

                return seq2seq_forward(pg_params, pg_spec, questions, None, GREEDY)
            if mesh is not None:
                from probnmn_tpu.ops.pallas.seq2seq_decode import (
                    fused_sampling_forward_dp,
                )
                from probnmn_tpu.models.seq2seq import fast_sampling_available

                if fast_sampling_available(pg_spec):
                    z = fused_sampling_forward_dp(
                        mesh, pg_params, pg_spec, questions, rng
                    )
                    return {"predictions": z}
            return sampling_forward_serving(pg_params, pg_spec, questions, rng)

        def pipeline_fn(pg_params, questions, images, rng):
            pg_out = decode_programs(pg_params, questions, rng)
            nmn_out = nmn_forward(image_to_nhwc(images), pg_out["predictions"])
            return nmn_out["predictions"], nmn_out["invalid"]

        self._pipeline = jax.jit(pipeline_fn)

        # Bucket ladder for the dispatcher path: batch_size // 4**k, kept
        # divisible by the mesh's DATA axis (shard_map shards batches over
        # 'data' only — the model axis replicates them, so total device count
        # would over-constrain the ladder and could empty it entirely).
        # The ladder floors at max(2, mesh_step): a size-1 bucket (which
        # power-of-4 batch sizes would otherwise produce) buys negligible
        # latency over the next bucket up while costing one more compiled
        # executable at warmup. The sync predict() contract stays at the
        # full batch; only the request path right-sizes its micro-batches.
        mesh_step = (
            self._mesh.shape["data"] if self._mesh is not None else 1
        )
        bucket_floor = max(2, mesh_step)
        buckets = []
        b = batch_size
        while b >= bucket_floor or b == batch_size:
            if b % mesh_step == 0:
                buckets.append(b)
            if b // 4 < bucket_floor:
                break
            b //= 4
        self._buckets = sorted(set(buckets))

        # Micro-batching state.
        self._queue: Queue = Queue()
        self._dispatcher: Optional[threading.Thread] = None
        self._completer: Optional[threading.Thread] = None
        self._running = threading.Event()
        self._lock = threading.Lock()
        self._stats = {"requests": 0, "batches": 0, "padded_slots": 0}
        # Sliding window of dispatcher request latencies (submit -> result).
        self._latencies: deque = deque(maxlen=16384)
        # REQUEST-level backlog (Queue.qsize counts groups, which would
        # understate depth by the group size under submit_many traffic).
        self._queued_requests = 0
        self._started_at = time.monotonic()

    @property
    def vocabulary(self):
        return self._vocabulary

    @property
    def batch_size(self) -> int:
        r"""The one compiled device-batch size."""
        return self._batch_size

    # ------------------------------------------------------------------ build
    @classmethod
    def from_checkpoint(
        cls, config, checkpoint_path: str, batch_size: Optional[int] = None,
        compute_dtype: str = "auto", num_devices: Optional[int] = None,
        compilation_cache_dir: Optional[str] = None,
        decoding: str = "sampling", beam_size: int = 1,
    ) -> "InferenceEngine":
        r"""Load PG + NMN from a joint/module checkpoint (native ``.ckpt`` or
        reference ``.pth``) exactly like ``scripts/inference.py``.

        ``compute_dtype="auto"`` defers to ``make_spec``'s backend-aware
        resolution: bf16 only where the fused Pallas kernels run (TPU v4+),
        f32 elsewhere — matching the reference's torch numerics on
        CPU / register-machine backends."""
        from probnmn_tpu.utils.checkpointing import load_objects_flexible

        vocabulary = Vocabulary.from_files(config.DATA.VOCABULARY)
        pg_spec = program_generator.make_spec(vocabulary, config)
        nmn_spec = nmn_lib.make_spec(vocabulary, config)
        if compute_dtype != "auto":
            nmn_spec.compute_dtype = compute_dtype
        templates = {
            "program_generator": program_generator.init_params(
                jax.random.PRNGKey(0), pg_spec
            ),
            "nmn": nmn_lib.init_nmn_params(jax.random.PRNGKey(0), nmn_spec),
        }
        restored, _, _ = load_objects_flexible(
            checkpoint_path, templates,
            specs={"program_generator": pg_spec, "nmn": nmn_spec},
            vocabulary=vocabulary,
        )
        return cls(
            vocabulary, pg_spec, nmn_spec,
            restored["program_generator"], restored["nmn"],
            batch_size=batch_size or config.OPTIM.BATCH_SIZE,
            rng_seed=config.RANDOM_SEED,
            num_devices=num_devices,
            compilation_cache_dir=compilation_cache_dir,
            decoding=decoding,
            beam_size=beam_size,
        )

    # ------------------------------------------------------------------ sync
    def predict(
        self,
        questions: np.ndarray,   # (n, Tq) int tokens
        images: np.ndarray,      # (n, C, H, W) features (reference H5 layout)
        rng: Optional[jax.Array] = None,
    ) -> List[str]:
        r"""Answer ``n <= batch_size`` requests in one device call (padded to
        the compiled batch; answers detokenized via the vocabulary)."""
        questions = np.asarray(questions)
        images = np.asarray(images)
        n = questions.shape[0]
        if n == 0:
            return []
        if n > self._batch_size:
            starts = list(range(0, n, self._batch_size))
            # Decorrelate chunks: a single user-supplied key must not feed
            # identical sampling noise to every chunk.
            chunk_rngs = (
                jax.random.split(rng, len(starts)) if rng is not None
                else [None] * len(starts)
            )
            out: List[str] = []
            for start, chunk_rng in zip(starts, chunk_rngs):
                out.extend(self.predict(
                    questions[start:start + self._batch_size],
                    images[start:start + self._batch_size], chunk_rng,
                ))
            return out

        return self._run_padded(questions, images, rng, self._batch_size)

    def _run_padded(
        self,
        questions: np.ndarray,
        images: np.ndarray,
        rng: Optional[jax.Array],
        pad_to: int,
        count_stats: bool = True,
    ) -> List[str]:
        r"""Pad ``n <= pad_to`` requests to ``pad_to`` rows, run the compiled
        pipeline (one executable per distinct ``pad_to``), unpad and
        detokenize. ``predict`` always passes the full batch; the dispatcher
        passes the smallest bucket covering its coalesced group."""
        return self._run_padded_groups(
            [questions], [images], rng, pad_to, count_stats
        )

    def _run_padded_groups(
        self,
        q_groups: List[np.ndarray],
        im_groups: List[np.ndarray],
        rng: Optional[jax.Array],
        pad_to: int,
        count_stats: bool = True,
    ) -> List[str]:
        r"""Synchronous launch + fetch (``predict()`` / ``warmup()`` path);
        the dispatcher uses the split :meth:`_launch_padded_groups` /
        :meth:`_finish` pair so batch N+1's host assembly + upload can
        overlap batch N's device execution."""
        answers, n = self._launch_padded_groups(
            q_groups, im_groups, rng, pad_to, count_stats
        )
        return self._finish(answers, n)

    def _launch_padded_groups(
        self,
        q_groups: List[np.ndarray],
        im_groups: List[np.ndarray],
        rng: Optional[jax.Array],
        pad_to: int,
        count_stats: bool = True,
    ):
        r"""Assemble request groups into ONE padded host batch in a single
        pass and *dispatch* the compiled pipeline, returning the device-side
        answers array without blocking on it (JAX dispatch is asynchronous —
        the fetch happens in :meth:`_finish`). The groups are written
        straight into zero-initialized buffers already in their device
        dtypes, so concatenation, padding, and the f32->bf16 feature
        conversion happen in one memcpy-sized traversal of the request
        bytes; the previous concatenate -> pad -> astype chain traversed the
        ~100-200 MB padded feature batch three times (measured 240 -> 156 ms
        per 256-request batch on this 1-core host, outputs bitwise identical
        — PERF.md round 5). Pad rows stay untouched zero pages (np.zeros is
        lazily mapped). ``count_stats=False`` (warmup) keeps synthetic
        traffic out of the lifetime qps/padded_slots telemetry."""
        n = sum(g.shape[0] for g in q_groups)
        if rng is None:
            with self._lock:
                self._rng, rng = jax.random.split(self._rng)
        pad = pad_to - n
        # canonicalize_dtype mirrors what jnp.asarray() would have produced
        # for the callers' token dtype (int64 -> int32 under default x64-off),
        # so the compiled executable signature is unchanged.
        q = np.zeros(
            (pad_to, q_groups[0].shape[1]),
            jax.dtypes.canonicalize_dtype(q_groups[0].dtype),
        )
        im = np.zeros((pad_to,) + im_groups[0].shape[1:], self._feature_dtype)
        cursor = 0
        for qg, img in zip(q_groups, im_groups):
            q[cursor:cursor + qg.shape[0]] = qg
            im[cursor:cursor + img.shape[0]] = img  # converts dtype in-pass
            cursor += qg.shape[0]
        q_dev = jax.device_put(jnp.asarray(q), self._batch_sharding)
        im_dev = jax.device_put(jnp.asarray(im), self._batch_sharding)
        answers, _ = self._pipeline(self._pg_params, q_dev, im_dev, rng)
        if count_stats:
            with self._lock:
                self._stats["requests"] += n
                self._stats["batches"] += 1
                self._stats["padded_slots"] += pad
        return answers, n

    def _finish(self, answers: jax.Array, n: int) -> List[str]:
        r"""Block on the device answers (the only synchronization point of a
        batch) and detokenize the ``n`` valid rows."""
        answers = np.asarray(answers)[:n]
        return [
            self._vocabulary.get_token_from_index(int(a), "answers")
            for a in answers
        ]

    def bucket_for(self, n: int) -> int:
        r"""Smallest compiled micro-batch bucket covering ``n`` requests."""
        for b in self._buckets:
            if b >= n:
                return b
        return self._batch_size

    def warmup(self, question_length: Optional[int] = None) -> None:
        r"""Eagerly compile the pipeline at every bucket size (and the full
        batch) so no live request ever pays a compile. ``question_length``
        must match the callers' padded question width (the reference's
        fixed 45, :data:`probnmn_tpu.utils.clevr.MAX_QUESTION_LENGTH`, by
        default). With a persistent ``compilation_cache_dir`` this is a
        cache read after the first ever start."""
        if question_length is None:
            from probnmn_tpu.utils.clevr import MAX_QUESTION_LENGTH

            question_length = MAX_QUESTION_LENGTH
        spec = self._nmn_spec
        for b in self._buckets:
            self._run_padded(
                np.zeros((1, question_length), np.int64),
                np.zeros(
                    (1, spec.feature_channels, spec.height, spec.width),
                    np.float32,
                ),
                None, b, count_stats=False,
            )

    # ------------------------------------------------------------ micro-batch
    def start(
        self, max_batch_delay: float = 0.005, pipeline_depth: int = 2
    ) -> None:
        r"""Start the micro-batching dispatcher: queued ``submit()`` requests
        coalesce until the batch fills or ``max_batch_delay`` seconds pass
        since the oldest queued request.

        The dispatcher is a two-stage pipeline. A *launcher* thread
        coalesces, assembles, uploads, and dispatches each batch (JAX
        dispatch is asynchronous), then hands the in-flight device answers
        to a *completer* thread that blocks on the result and resolves the
        futures. Batch N+1's host assembly + H2D upload therefore overlaps
        batch N's device execution and D2H fetch — on a PCIe host, where
        batch assembly is the dominant per-cycle host cost (PERF.md round
        5), the stages run concurrently instead of serializing.
        ``pipeline_depth`` bounds in-flight device batches (launch blocks
        when the completion queue is full), capping device memory at
        ``depth`` padded batches and bounding result staleness;
        ``pipeline_depth=1`` disables the overlap entirely (single-thread
        launch-then-fetch, the pre-pipelining behavior — kept selectable so
        the overlap is A/B measurable)."""
        if self._dispatcher is not None:
            return
        self._running.set()
        pipelined = pipeline_depth > 1
        # maxsize gives backpressure: with depth D, at most D batches are
        # dispatched-but-unfetched (D-1 queued here + 1 inside the completer).
        completions: Queue = Queue(maxsize=max(1, pipeline_depth - 1))

        def launch():
            # A group pulled off the queue that would overflow the compiled
            # batch is carried to the NEXT cycle — one device batch per cycle,
            # never a second mostly-padded serial predict().
            carry = None
            while self._running.is_set():
                if carry is not None:
                    first, carry = carry, None
                else:
                    try:
                        first = self._queue.get(timeout=0.05)
                    except Empty:
                        continue
                # Queue items are GROUPS: (questions (n,Tq), images (n,...),
                # [n futures], t_submit) — submit() enqueues groups of 1,
                # submit_many() of n, so the per-request Python cost (queue
                # round-trip, deadline check) amortizes over the group.
                pending = [first]
                total = first[0].shape[0]
                deadline = time.monotonic() + max_batch_delay
                while total < self._batch_size:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    try:
                        group = self._queue.get(timeout=remaining)
                    except Empty:
                        break
                    if total + group[0].shape[0] > self._batch_size:
                        carry = group
                        break
                    pending.append(group)
                    total += group[0].shape[0]
                # Batch assembly stays inside the try: one mis-shaped request
                # must fail its batch's futures, not kill the dispatcher
                # threads (which would hang every later submit() forever).
                try:
                    # Groups are written straight into the padded device-dtype
                    # buffer (no intermediate concatenate), padded to the
                    # smallest compiled bucket covering the group, not the
                    # full batch: at low load this cuts the padded upload +
                    # device compute by batch_size/bucket (the request path's
                    # latency floor).
                    if total:
                        answers, n = self._launch_padded_groups(
                            [p[0] for p in pending], [p[1] for p in pending],
                            None, self.bucket_for(total),
                        )
                    else:
                        answers, n = None, 0
                except BaseException as e:
                    for p in pending:
                        for fut in p[2]:
                            fut.set_exception(e)
                    self._note_dequeued(total)
                    continue
                if pipelined:
                    completions.put((answers, n, pending, total))
                else:
                    resolve(answers, n, pending, total)
            if pipelined:
                completions.put(None)  # wake + stop the completer

        def resolve(answers, n, pending, total):
            # Fetch the device answers (the batch's only sync point) and
            # resolve its futures; shared by the completer thread and the
            # depth-1 synchronous path.
            try:
                resolved = self._finish(answers, n) if n else []
            except BaseException as e:
                for p in pending:
                    for fut in p[2]:
                        fut.set_exception(e)
                self._note_dequeued(total)
                return
            done = time.monotonic()
            latencies = []
            cursor = 0
            for p in pending:
                k = p[0].shape[0]
                latencies.extend([done - p[3]] * k)
                for fut, answer in zip(p[2], resolved[cursor:cursor + k]):
                    fut.set_result(answer)
                cursor += k
            with self._lock:
                self._latencies.extend(latencies)
            self._note_dequeued(total)

        def complete():
            while True:
                item = completions.get()
                if item is None:
                    return
                resolve(*item)

        self._dispatcher = threading.Thread(
            target=launch, daemon=True, name="probnmn-serving-launcher"
        )
        self._dispatcher.start()
        if pipelined:
            self._completer = threading.Thread(
                target=complete, daemon=True, name="probnmn-serving-completer"
            )
            self._completer.start()

    def stop(self) -> None:
        if self._dispatcher is None:
            return
        self._running.clear()
        # The launcher exits within its 50 ms poll (or after the in-flight
        # cycle) and enqueues the completer's stop sentinel behind any
        # still-in-flight batches, so completion drains before join returns.
        self._dispatcher.join(timeout=30)
        if self._completer is not None:
            self._completer.join(timeout=30)
            self._completer = None
        self._dispatcher = None

    def submit(self, question: np.ndarray, image: np.ndarray) -> Future:
        r"""Enqueue one request for the micro-batching dispatcher; returns a
        Future resolving to the answer string. ``start()`` must be running."""
        return self.submit_many(
            np.asarray(question)[None], np.asarray(image)[None]
        )[0]

    def submit_many(
        self, questions: np.ndarray, images: np.ndarray
    ) -> List[Future]:
        r"""Enqueue ``n`` requests as ONE dispatcher group (single queue
        round-trip, single concat) — the high-throughput form of ``submit``
        for callers that already hold several requests (front-end batchers,
        load generators). Returns one Future per request; groups coalesce
        with other pending requests up to the compiled batch size exactly
        like individual submits."""
        if self._dispatcher is None:
            raise RuntimeError("call start() before submit()")
        questions = np.asarray(questions)
        images = np.asarray(images)
        futures: List[Future] = [Future() for _ in range(questions.shape[0])]
        with self._lock:
            self._queued_requests += len(futures)
        self._queue.put((questions, images, futures, time.monotonic()))
        return futures

    def _note_dequeued(self, n: int) -> None:
        with self._lock:
            self._queued_requests -= n

    # ------------------------------------------------------------------ stats
    def stats(self) -> Dict[str, Any]:
        r"""Throughput counters plus request-latency percentiles (seconds,
        submit()-to-result over the dispatcher's sliding window of recent
        requests) and the instantaneous queue depth — the two axes of a
        serving layer: QPS alone says nothing about the wait a request sees
        under the micro-batching coalescing delay."""
        with self._lock:
            s = dict(self._stats)
            lat = np.asarray(self._latencies, np.float64)
        elapsed = max(time.monotonic() - self._started_at, 1e-9)
        s["qps"] = s["requests"] / elapsed
        with self._lock:
            s["queue_depth"] = self._queued_requests  # requests, not groups
        if lat.size:
            s["latency_p50"], s["latency_p95"], s["latency_p99"] = (
                float(np.percentile(lat, q)) for q in (50, 95, 99)
            )
            s["latency_count"] = int(lat.size)
        return s

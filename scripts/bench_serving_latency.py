r"""
Serving latency under load: drive ``InferenceEngine.submit()`` (the
micro-batching dispatcher) at controlled offered loads and report request
latency percentiles and queue stability — the second axis of a serving layer
next to throughput (the reference has no serving layer at all; its
``scripts/inference.py:74-95`` is an offline batch loop).

Protocol:
1. measure dispatcher CAPACITY: closed-loop saturation (a few feeder threads
   submitting as fast as futures resolve) for ``--measure-seconds``;
2. for each ``--loads`` fraction f, drive an open-loop paced arrival stream at
   ``f x capacity`` for ``--duration`` seconds; record submit->result latency
   per request and the queue depth once per second;
3. print one JSON line per load with p50/p95/p99 latency (ms), achieved/offered
   QPS, and max/final queue depth. Steady state = final depth ~ coalescing
   batch, not growing with time.

The dispatcher path is intentionally the HOST-side one (per-request numpy
payloads, Future switchboard) — its capacity is far below the fused device
pipeline's batch QPS (see bench.py); that gap is the cost of request-level
serving and is exactly what this benchmark makes visible.
"""
import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

parser = argparse.ArgumentParser(description="Serving latency under offered load.")
parser.add_argument("--batch-size", type=int, default=256)
parser.add_argument("--feature-channels", type=int, default=1024,
                    help="Per-request image feature depth (1024 = real CLEVR).")
parser.add_argument("--question-length", type=int, default=45)
parser.add_argument("--loads", type=float, nargs="*", default=[0.5, 0.9])
parser.add_argument("--duration", type=float, default=10.0)
parser.add_argument("--measure-seconds", type=float, default=5.0)
parser.add_argument("--max-batch-delay", type=float, default=0.005)
parser.add_argument("--pipeline-depth", type=int, default=2,
                    help="Dispatcher in-flight batches (1 = synchronous, "
                    "2 = assembly/upload overlapped with execution).")
parser.add_argument("--feeders", type=int, default=4)
parser.add_argument("--out", default="", help="Append JSON lines here too.")


def build_engine(args):
    import jax

    from probnmn_tpu.config import Config
    from probnmn_tpu.models import nmn as nmn_lib
    from probnmn_tpu.models import program_generator
    from probnmn_tpu.serving import InferenceEngine
    from probnmn_tpu.utils.clevr import make_clevr_like_vocabulary

    vocab = make_clevr_like_vocabulary()
    config = Config(None, [
        "NMN.IMAGE_FEATURE_SIZE", [args.feature_channels, 14, 14],
    ])
    pg_spec = program_generator.make_spec(vocab, config)
    nmn_spec = nmn_lib.make_spec(vocab, config)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    engine = InferenceEngine(
        vocab, pg_spec, nmn_spec,
        program_generator.init_params(k1, pg_spec),
        nmn_lib.init_nmn_params(k2, nmn_spec),
        batch_size=args.batch_size,
    )
    return engine


def measure_capacity(engine, args, question, image) -> float:
    r"""Closed-loop saturation: feeders keep ``2 x batch`` requests in flight."""
    stop_at = time.monotonic() + args.measure_seconds
    done = [0] * args.feeders

    def feeder(i):
        window = []
        q_block = np.repeat(question[None], 32, axis=0)
        im_block = np.repeat(image[None], 32, axis=0)
        while time.monotonic() < stop_at:
            while len(window) < 2 * args.batch_size // args.feeders:
                window.extend(engine.submit_many(q_block, im_block))
            window[0].result()
            window = [f for f in window if not f.done()]
            done[i] += 1  # count resolved head-of-line requests only
        for f in window:
            f.result()

    requests_before = engine.stats()["requests"]
    t0 = time.monotonic()
    threads = [threading.Thread(target=feeder, args=(i,)) for i in range(args.feeders)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.monotonic() - t0
    # Window delta, not the engine-lifetime counter (which includes warm-up
    # and any earlier traffic).
    return (engine.stats()["requests"] - requests_before) / elapsed


def drive_load_measured(engine, args, question, image, rate: float):
    r"""Open-loop paced arrivals at ``rate`` req/s for ``--duration`` seconds.
    Arrivals are emitted in ~10 ms bursts (Python cannot pace sub-millisecond
    gaps); each request's latency is measured from its SCHEDULED arrival time
    via a done-callback, so feeder lag counts against the system, not for
    it."""
    burst = max(1, int(rate * 0.01))
    interval = burst / rate
    stop_at = time.monotonic() + args.duration
    latencies = []
    lat_lock = threading.Lock()
    depth_samples = []

    def sampler():
        while time.monotonic() < stop_at:
            depth_samples.append(engine.stats()["queue_depth"])
            time.sleep(0.5)

    sampler_t = threading.Thread(target=sampler)
    sampler_t.start()

    pending = []
    next_burst = time.monotonic()
    submitted = 0
    while time.monotonic() < stop_at:
        now = time.monotonic()
        if now < next_burst:
            time.sleep(next_burst - now)
        sched = next_burst

        def make_cb(s):
            def cb(fut):
                with lat_lock:
                    latencies.append(time.monotonic() - s)
            return cb

        futs = engine.submit_many(
            np.repeat(question[None], burst, axis=0),
            np.repeat(image[None], burst, axis=0),
        )
        cb = make_cb(sched)
        for fut in futs:
            fut.add_done_callback(cb)
        pending.extend(futs)
        submitted += burst
        next_burst += interval
    for fut in pending:
        fut.result()
    sampler_t.join()
    lat = np.asarray(latencies)
    elapsed = args.duration
    return {
        "offered_qps": rate,
        "achieved_qps": submitted / elapsed,
        "latency_ms_p50": float(np.percentile(lat, 50) * 1e3),
        "latency_ms_p95": float(np.percentile(lat, 95) * 1e3),
        "latency_ms_p99": float(np.percentile(lat, 99) * 1e3),
        "queue_depth_max": int(max(depth_samples, default=0)),
        "queue_depth_final": int(depth_samples[-1]) if depth_samples else 0,
        "requests": submitted,
    }


def main(args):
    from probnmn_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    engine = build_engine(args)
    rs = np.random.RandomState(0)
    question = rs.randint(4, 90, (args.question_length,)).astype(np.int64)
    image = rs.randn(args.feature_channels, 14, 14).astype(np.float32)

    # Warm EVERY bucket's executable before any timing (a live compile inside
    # the measured window would dominate every percentile).
    engine.warmup(question_length=args.question_length)
    engine.start(max_batch_delay=args.max_batch_delay,
                 pipeline_depth=args.pipeline_depth)

    capacity = measure_capacity(engine, args, question, image)
    results = [{"metric": "dispatcher_capacity_qps", "value": round(capacity, 1),
                "batch_size": args.batch_size,
                "pipeline_depth": args.pipeline_depth,
                "feature_channels": args.feature_channels}]
    print(json.dumps(results[0]))

    for frac in args.loads:
        rate = capacity * frac
        out = drive_load_measured(engine, args, question, image, rate)
        out["load_fraction"] = frac
        results.append(out)
        print(json.dumps(out))
    engine.stop()

    if args.out:
        with open(args.out, "a") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main(parser.parse_args())

r"""
HTTP front-end latency on the chip at real scale (PERF.md round 5).

Synthesizes a 1024-channel serving fixture (vocab + features H5 + random-init
``.ckpt`` — the latency is weight-independent), spawns ``scripts/serve.py`` as
a subprocess on the default backend, and measures:

1. the first-request bucket compile (reported, not averaged in),
2. steady-state single-request ``/predict`` wall latency (p50/p95 over
   ``--singles`` requests via the ``image_index`` path — features resolve from
   the server's local H5, like a production deployment),
3. warm batch-``--batch-n`` request latency,
4. the server's own ``/stats`` percentiles.

Prints one JSON line. Run: python scripts/bench_http_latency.py
"""
import argparse
import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

parser = argparse.ArgumentParser(description="HTTP /predict latency on the chip.")
parser.add_argument("--root", default="/tmp/http_latency_bench")
parser.add_argument("--port", type=int, default=8093)
parser.add_argument("--feature-channels", type=int, default=1024)
parser.add_argument("--num-images", type=int, default=32)
parser.add_argument("--singles", type=int, default=30)
parser.add_argument("--batch-n", type=int, default=16)
parser.add_argument("--compile-timeout", type=float, default=600.0,
                    help="First request may pay a multi-minute bucket compile "
                    "through the tunnel; use --compilation-cache-dir on "
                    "serve.py restarts to pay it once.")
parser.add_argument("--compilation-cache-dir", default="")


def build_fixture(args) -> None:
    import h5py
    import jax

    from probnmn_tpu.config import Config
    from probnmn_tpu.models import nmn as nmn_lib
    from probnmn_tpu.models import program_generator
    from probnmn_tpu.utils.checkpointing import save_objects
    from probnmn_tpu.utils.clevr import make_clevr_like_vocabulary

    os.makedirs(args.root, exist_ok=True)
    vocab = make_clevr_like_vocabulary()
    vocab.save_to_files(os.path.join(args.root, "vocab"))
    config = Config(None, [
        "DATA.VOCABULARY", os.path.join(args.root, "vocab"),
        "DATA.TEST_FEATURES", os.path.join(args.root, "test_features.h5"),
        "NMN.IMAGE_FEATURE_SIZE", [args.feature_channels, 14, 14],
    ])
    rs = np.random.RandomState(0)
    with h5py.File(os.path.join(args.root, "test_features.h5"), "w") as f:
        f.create_dataset("features", data=rs.randn(
            args.num_images, args.feature_channels, 14, 14).astype(np.float32))
        f.attrs["split"] = "test"
    pg_spec = program_generator.make_spec(vocab, config)
    nmn_spec = nmn_lib.make_spec(vocab, config)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    save_objects(os.path.join(args.root, "serve.ckpt"), {
        "program_generator": program_generator.init_params(k1, pg_spec),
        "nmn": nmn_lib.init_nmn_params(k2, nmn_spec),
    })
    config.dump(os.path.join(args.root, "config.yml"))


def post(port: int, payload: dict, timeout: float):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", json.dumps(payload).encode(),
        {"Content-Type": "application/json"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        body = json.load(r)
    return (time.perf_counter() - t0) * 1e3, body


def main(args) -> int:
    # The fixture build pins JAX to CPU in a subprocess so the serve.py child
    # owns the chip alone (two processes on the tunnel corrupt timings).
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "import sys; sys.path.insert(0, %r);"
            "from scripts.bench_http_latency import build_fixture, parser;"
            "build_fixture(parser.parse_args(%r))"
            % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
               sys.argv[1:]))
    subprocess.run([sys.executable, "-c", code], check=True)

    cmd = [sys.executable, os.path.join(os.path.dirname(__file__), "serve.py"),
           "--config-yml", os.path.join(args.root, "config.yml"),
           "--checkpoint", os.path.join(args.root, "serve.ckpt"),
           "--port", str(args.port)]
    if args.compilation_cache_dir:
        cmd += ["--compilation-cache-dir", args.compilation_cache_dir]
    server = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                              stderr=subprocess.DEVNULL)
    try:
        for _ in range(120):
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{args.port}/healthz", timeout=2):
                    break
            except (urllib.error.URLError, OSError):
                time.sleep(2)
        else:
            raise RuntimeError("server never became healthy")

        q = "how many large red metal cubes are there"
        compile_ms, _ = post(args.port, {"question": q, "image_index": 0},
                             args.compile_timeout)
        singles = []
        for i in range(args.singles):
            wall, _ = post(args.port,
                           {"question": q, "image_index": i % args.num_images},
                           60)
            singles.append(wall)
        batch_payload = {"questions": [q] * args.batch_n,
                         "image_indices": list(range(args.batch_n))}
        post(args.port, batch_payload, args.compile_timeout)  # bucket compile
        batch_walls = [post(args.port, batch_payload, 120)[0] for _ in range(3)]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{args.port}/stats", timeout=10) as r:
            stats = json.load(r)
        print(json.dumps({
            "bench": "http_latency",
            "feature_channels": args.feature_channels,
            "first_request_compile_ms": round(compile_ms, 1),
            "single_wall_ms_p50": round(float(np.percentile(singles, 50)), 1),
            "single_wall_ms_p95": round(float(np.percentile(singles, 95)), 1),
            "batch_n": args.batch_n,
            "batch_wall_ms_warm_min": round(min(batch_walls), 1),
            "batch_ms_per_question": round(min(batch_walls) / args.batch_n, 1),
            "server_stats_p50_s": stats.get("latency_p50"),
        }))
        return 0
    finally:
        server.terminate()
        server.wait(timeout=10)


if __name__ == "__main__":
    sys.exit(main(parser.parse_args()))

r"""
One-command evidence driver (VERDICT r4 item 8): runs the full measurement
suite in sequence and accumulates everything into ONE resumable artifact,
``EVIDENCE.json``. Rounds keep losing chip windows to tunnel outages; this
driver maximizes what a window yields — re-running it skips stages that
already succeeded (state lives in the artifact itself), so an interrupted
window resumes where it stopped.

Stages (in order; each is a subprocess so backends don't leak between them):

  tests            pytest suite (CPU via tests/conftest.py)
  bench            bench.py headline (serving q/s, two regimes)
  train_converged  bench_train_step --regime converged --mu-dtype bfloat16
  train_random     bench_train_step --regime random
  decompose        bench_joint_decompose (per-component slopes)
  serving_latency  bench_serving_latency (p50/p95/p99 under offered load)
  http_latency     bench_http_latency (scripts/serve.py end-to-end /predict
                   wall latency at 1024-ch scale, chip)
  beam             bench_beam (beam decode cost vs greedy/sampling)
  dot_packing      bench_dot_packing (conv formulation roofline: ninedot/
                   bigdot/twopack at production geometry)
  multichip        __graft_entry__.dryrun_multichip on an 8-device CPU mesh
  h5_stream        bench_h5_stream (multi-GB streaming through the trainer, CPU)

Run: python scripts/run_evidence.py [--stages bench beam ...] [--force]
"""
import argparse
import json
import logging
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

parser = argparse.ArgumentParser(description="Run the full evidence suite.")
parser.add_argument("--output", default=os.path.join(ROOT, "EVIDENCE.json"))
parser.add_argument("--stages", nargs="*", default=[],
                    help="Subset to run (default: all).")
parser.add_argument("--skip", nargs="*", default=[], help="Stages to skip.")
parser.add_argument("--force", action="store_true",
                    help="Re-run stages that already succeeded.")
parser.add_argument("--timeout", type=int, default=7200,
                    help="Per-stage timeout (seconds).")

PY = sys.executable

STAGES = [
    ("tests", [PY, "-m", "pytest", "tests/", "-q", "--tb=line"], {}),
    ("bench", [PY, "bench.py"], {}),
    ("train_converged",
     [PY, "scripts/bench_train_step.py", "--regime", "converged",
      "--mu-dtype", "bfloat16"], {}),
    ("train_random", [PY, "scripts/bench_train_step.py", "--regime", "random"], {}),
    ("decompose", [PY, "scripts/bench_joint_decompose.py"], {}),
    ("serving_latency", [PY, "scripts/bench_serving_latency.py"], {}),
    # End-to-end HTTP /predict wall latency through scripts/serve.py at
    # 1024-channel scale (PERF.md round 5 "HTTP front-end" numbers).
    ("http_latency", [PY, "scripts/bench_http_latency.py"], {}),
    ("beam", [PY, "scripts/bench_beam.py"], {}),
    ("dot_packing",
     [PY, "scripts/bench_dot_packing.py",
      # Chain-length gap must be >>tunnel jitter: 61440 convs x ~0.5 us
      # => ~30-50 ms slope signal vs the ~1-3 ms RTT noise floor.
      "--m-lo", "4096", "--m-hi", "65536", "--reps", "15"], {}),
    ("multichip",
     [PY, "-c",
      "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8); "
      "print('{\"multichip_dryrun\": \"ok\", \"n_devices\": 8}')"],
     {"JAX_PLATFORMS": "cpu",
      "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}),
    ("h5_stream",
     [PY, "scripts/bench_h5_stream.py", "--gb", "2", "--steps", "100"],
     {"JAX_PLATFORMS": "cpu"}),
    # VERDICT r4 item 5: the real-scale .pth-port parity artifact must carry
    # chip provenance (backend + fused-Pallas-path flags) and a deterministic
    # self-check. Regenerates REALSCALE_PARITY.json in place.
    ("realscale",
     [PY, "scripts/verify_parity_realscale.py", "--self-check"], {}),
]


def parse_json_lines(text: str):
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def run_stage(name, cmd, extra_env, timeout):
    env = dict(os.environ, **extra_env)
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, cwd=ROOT, env=env, capture_output=True, text=True,
            timeout=timeout,
        )
        status = "ok" if proc.returncode == 0 else "failed"
        stdout, stderr, rc = proc.stdout, proc.stderr, proc.returncode
    except subprocess.TimeoutExpired as e:
        status, rc = "timeout", -1
        stdout = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
        stderr = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) \
            else (e.stderr or "")
    return {
        "status": status,
        "returncode": rc,
        "wall_s": round(time.time() - t0, 1),
        "cmd": " ".join(cmd if len(cmd) < 8 else cmd[:8] + ["..."]),
        "json": parse_json_lines(stdout),
        "stdout_tail": stdout[-2000:],
        "stderr_tail": stderr[-2000:],
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


def main(args):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    # Always load the existing ledger: --force means "re-run stages that are
    # already ok", never "discard every other stage's banked result" (losing
    # a full ledger to one forced re-run is exactly the failure this driver
    # exists to prevent).
    evidence = {}
    if os.path.exists(args.output):
        evidence = json.load(open(args.output))

    want = set(args.stages) if args.stages else {n for n, _, _ in STAGES}
    want -= set(args.skip)
    unknown = want - {n for n, _, _ in STAGES}
    if unknown:
        parser.error(f"unknown stages: {sorted(unknown)}")

    for name, cmd, extra_env in STAGES:
        if name not in want:
            continue
        prior = evidence.get("stages", {}).get(name)
        if prior and prior.get("status") == "ok" and not args.force:
            logging.info("stage %s: already ok (%.0fs on %s) — skipping",
                         name, prior.get("wall_s", 0), prior.get("timestamp"))
            continue
        logging.info("stage %s: running ...", name)
        result = run_stage(name, cmd, extra_env, args.timeout)
        evidence.setdefault("stages", {})[name] = result
        evidence["updated"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(args.output, "w") as f:
            json.dump(evidence, f, indent=1)
        logging.info("stage %s: %s in %.0fs", name, result["status"],
                     result["wall_s"])

    statuses = {n: s.get("status") for n, s in evidence.get("stages", {}).items()}
    print(json.dumps({"evidence": args.output, "stages": statuses}))
    if any(v != "ok" for v in statuses.values()):
        sys.exit(1)


if __name__ == "__main__":
    main(parser.parse_args())

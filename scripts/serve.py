r"""
Production serving CLI: an HTTP JSON front-end over
:class:`probnmn_tpu.serving.InferenceEngine`.

The reference ships only a batch test-split script (reference
``scripts/inference.py:74-95``); this server is the online counterpart the
BASELINE north star asks for: raw-question requests are tokenized (native C++
tokenizer when built, Python fallback), routed through the micro-batching
dispatcher onto the one compiled fixed-batch TPU pipeline, and answered with
per-request latency. Stdlib-only (``http.server``) — no extra dependencies.

Endpoints:
  GET  /healthz         -> {"ok": true}
  GET  /stats           -> engine.stats() (QPS, batch counts, p50/p95/p99)
  POST /predict         -> one request or a batch:
      {"question": "how many red cubes ...", "image_index": 3}
      {"questions": [...], "image_indices": [...]}
      {"question_tokens": [[...]], "features": [[[...]]]}   # pre-encoded
    Answers: {"answers": ["2", ...], "latency_ms": 4.1}

Image features are resolved from ``--features-h5`` (default: the config's
DATA.TEST_FEATURES) by ``image_index``, or passed inline as ``features``.

Example:
    python scripts/serve.py --config-yml configs/joint_training.yml \
        --checkpoint runs/joint/checkpoint_best.ckpt --port 8090
"""
import argparse
import json
import logging
import os
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from probnmn_tpu.config import Config

logger = logging.getLogger(__name__)

parser = argparse.ArgumentParser(description="Serve a joint-training checkpoint over HTTP.")
parser.add_argument("--config-yml", required=True)
parser.add_argument("--config-override", nargs="*", default=[])
parser.add_argument("--checkpoint", required=True,
                    help="Native .ckpt or reference-format .pth with PG + NMN.")
parser.add_argument("--host", default="127.0.0.1")
parser.add_argument("--port", type=int, default=8090)
parser.add_argument("--batch-size", type=int, default=0,
                    help="Compiled serving batch (0 = config OPTIM.BATCH_SIZE).")
parser.add_argument("--decoding", default="sampling",
                    choices=["sampling", "greedy", "beam"])
parser.add_argument("--beam-size", type=int, default=1)
parser.add_argument("--compute-dtype", default="auto")
parser.add_argument("--num-devices", type=int, default=None)
parser.add_argument("--compilation-cache-dir", default=None)
parser.add_argument("--max-batch-delay", type=float, default=0.005,
                    help="Dispatcher coalescing window (seconds).")
parser.add_argument("--pipeline-depth", type=int, default=2,
                    help="In-flight device batches: 2 overlaps batch N+1's "
                    "assembly+upload with batch N's execution; 1 = no overlap.")
parser.add_argument("--features-h5", default="",
                    help="H5 with a (N, C, H, W) 'features' dataset for "
                    "image_index requests (default: config DATA.TEST_FEATURES).")
parser.add_argument("--in-memory-features", action="store_true",
                    help="Load the whole features H5 into RAM.")
parser.add_argument("--max-question-length", type=int, default=45,
                    help="Token budget per question (reference "
                    "question_reconstructor.py:34 uses 45); fixes the "
                    "compiled question shape.")


class ServingContext:
    r"""Engine + tokenizer + feature store shared across handler threads."""

    def __init__(self, args):
        from probnmn_tpu.data.native import NativeTokenizer
        from probnmn_tpu.data.readers import ClevrImageFeaturesReader
        from probnmn_tpu.serving import InferenceEngine

        config = Config(args.config_yml, args.config_override)
        # Compiled feature geometry: inline-'features' requests must match it
        # (any other shape would poison the coalesced batch and force a fresh
        # XLA trace per novel shape).
        self.feature_shape = tuple(config.NMN.IMAGE_FEATURE_SIZE)
        self.engine = InferenceEngine.from_checkpoint(
            config, args.checkpoint,
            batch_size=args.batch_size or None,
            compute_dtype=args.compute_dtype,
            num_devices=args.num_devices,
            compilation_cache_dir=args.compilation_cache_dir,
            decoding=args.decoding,
            beam_size=args.beam_size,
        )
        self.tokenizer = NativeTokenizer(self.engine.vocabulary, "questions")
        self.max_question_length = args.max_question_length
        features_path = args.features_h5 or config.DATA.TEST_FEATURES
        self.features = None
        if os.path.exists(features_path):
            self.features = ClevrImageFeaturesReader(
                features_path, in_memory=args.in_memory_features
            )
            logger.info("features: %s (%d images)", features_path, len(self.features))
        else:
            logger.warning(
                "features H5 %s not found — only inline-'features' requests "
                "will be served", features_path)
        self.engine.start(max_batch_delay=args.max_batch_delay,
                          pipeline_depth=args.pipeline_depth)

    # ---------------------------------------------------------------- request
    def parse(self, payload: dict):
        r"""Validate the request up front (raises ValueError -> HTTP 400);
        nothing malformed may reach the shared dispatcher batch."""
        questions = self._questions_array(payload)
        images = self._features_array(payload, questions.shape[0])
        if questions.shape[0] != images.shape[0]:
            raise ValueError(
                f"{questions.shape[0]} questions vs {images.shape[0]} images")
        return questions, images

    def answer(self, questions, images) -> dict:
        t0 = time.monotonic()
        futures = self.engine.submit_many(questions, images)
        answers = [f.result() for f in futures]
        return {
            "answers": answers,
            "latency_ms": round(1e3 * (time.monotonic() - t0), 3),
        }

    def _questions_array(self, payload: dict) -> np.ndarray:
        if "question_tokens" in payload:
            rows = payload["question_tokens"]
            out = np.zeros((len(rows), self.max_question_length), np.int64)
            for i, row in enumerate(rows):
                if len(row) > self.max_question_length:
                    raise ValueError(
                        f"question_tokens[{i}] longer than "
                        f"--max-question-length={self.max_question_length}")
                out[i, : len(row)] = row
            return out
        texts = payload.get("questions")
        if texts is None:
            if "question" not in payload:
                raise ValueError(
                    "need 'question', 'questions', or 'question_tokens'")
            texts = [payload["question"]]
        if isinstance(texts, str):  # a bare string is ONE question, not chars
            texts = [texts]
        if not all(isinstance(t, str) for t in texts):
            raise ValueError("'questions' must be a list of strings")
        ids, lengths = self.tokenizer.tokenize_questions(
            list(texts), max_len=self.max_question_length
        )
        over = np.nonzero(lengths > self.max_question_length)[0]
        if over.size:  # same contract as the question_tokens path: no silent truncation
            raise ValueError(
                f"question {int(over[0])} has {int(lengths[over[0]])} tokens "
                f"(> --max-question-length={self.max_question_length})")
        return ids.astype(np.int64)

    def _features_array(self, payload: dict, n: int) -> np.ndarray:
        if "features" in payload:
            try:
                feats = np.asarray(payload["features"], np.float32)
            except (ValueError, TypeError) as error:
                raise ValueError(f"malformed 'features': {error}")
            if feats.ndim == 3:  # one image for a single-question request
                feats = feats[None]
            if feats.shape[1:] != self.feature_shape:
                raise ValueError(
                    f"'features' must be shaped (n,) + {self.feature_shape} "
                    f"(the compiled NMN.IMAGE_FEATURE_SIZE); got {feats.shape}")
            return feats
        indices = payload.get("image_indices")
        if indices is None:
            if "image_index" not in payload:
                raise ValueError(
                    "need 'image_index', 'image_indices', or inline 'features'")
            indices = [payload["image_index"]] * n
        if self.features is None:
            raise ValueError("no --features-h5 loaded; pass inline 'features'")
        idx = np.asarray(indices)
        if idx.ndim != 1 or not np.issubdtype(idx.dtype, np.integer):
            raise ValueError("'image_indices' must be a flat list of integers")
        if idx.size and (idx.min() < 0 or idx.max() >= len(self.features)):
            raise ValueError(
                f"image index out of range [0, {len(self.features)})")
        # One vectorized (sorted/deduped) H5 read, not a read per request item.
        return np.asarray(self.features[idx.astype(np.int64)], np.float32)


def make_handler(ctx: ServingContext):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *httpargs):  # route through logging
            logger.debug("%s " + fmt, self.address_string(), *httpargs)

        def _reply(self, code: int, body: dict) -> None:
            raw = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def do_GET(self):
            if self.path == "/healthz":
                return self._reply(200, {"ok": True})
            if self.path == "/stats":
                return self._reply(200, ctx.engine.stats())
            return self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                return self._reply(404, {"error": f"unknown path {self.path}"})
            # Client-input problems (parse/validate) -> 400. Anything raised
            # once the request is in the engine is a SERVER failure: log it
            # and 500 — never disguise engine errors as client errors.
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(payload, dict):
                    raise ValueError("request body must be a JSON object")
                questions, images = ctx.parse(payload)
            except (ValueError, KeyError, TypeError) as error:
                return self._reply(400, {"error": str(error)})
            try:
                return self._reply(200, ctx.answer(questions, images))
            except Exception as error:
                logger.exception("predict failed")
                return self._reply(500, {"error": str(error)})

    return Handler


def main(args):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    ctx = ServingContext(args)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(ctx))
    logger.info("serving on http://%s:%d (batch=%d, decoding=%s)",
                args.host, args.port, ctx.engine.batch_size, args.decoding)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        ctx.engine.stop()


if __name__ == "__main__":
    main(parser.parse_args())

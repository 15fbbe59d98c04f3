"""HTTP serving front-end (inference/server.py) over a toy CPU engine.

Covers: request/response plumbing (prompt_ids and tokenized text),
concurrent requests continuously batching onto one pool, parity with a
direct ServingEngine run, admission rejection surfaced as a client error,
health/stats endpoints, malformed-request handling, and shutdown failing
in-flight requests. The audio request path shares process_audio with the
CLI (tested in test_inference_cli/test_serving)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_llama_tpu.config import AudioLLMConfig
from audio_llama_tpu.data.tokenizer import ByteTokenizer
from audio_llama_tpu.models import allm
from audio_llama_tpu.inference.serving import ServingEngine
from audio_llama_tpu.inference.server import (
    AudioLLMServer,
    EngineRunner,
)

CFG = AudioLLMConfig.tiny()


@pytest.fixture(scope="module")
def model():
    frozen = allm.init_frozen(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    trainable = allm.init_trainable(CFG, jax.random.PRNGKey(1))
    return frozen, trainable


def _engine(model, tk, **kw):
    frozen, trainable = model
    kw.setdefault("rows", 2)
    kw.setdefault("max_len", 64)
    kw.setdefault("prefill_buckets", (8, 16))
    kw.setdefault("chunk_steps", 4)
    kw.setdefault("compute_dtype", jnp.float32)
    kw.setdefault("greedy", True)
    kw.setdefault("eos_id", tk.eos_id)
    kw.setdefault("pad_id", tk.pad_id)
    kw.setdefault("audio_start_id", tk.token_to_id(CFG.audio_start_token))
    kw.setdefault("audio_end_id", tk.token_to_id(CFG.audio_end_token))
    return ServingEngine(model[0], model[1], CFG, **kw)


@pytest.fixture(scope="module")
def server(model):
    tk = ByteTokenizer()
    runner = EngineRunner(_engine(model, tk), poll_interval=0.01)
    srv = AudioLLMServer(runner, CFG, tokenizer=tk, port=0,
                         request_timeout=120.0)
    srv.start()
    yield srv
    srv.stop()


def _post(port, path, body, timeout=120.0):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(port, path):
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30
        ) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_generate_prompt_ids_matches_direct_engine(server, model):
    ids = [1, 40, 41, 42]
    code, out = _post(server.port, "/v1/generate",
                      {"prompt_ids": ids, "max_new_tokens": 6})
    assert code == 200
    assert out["n_tokens"] == len(out["tokens"]) > 0

    # oracle: a fresh engine (same compiled programs) run directly
    eng = _engine(model, ByteTokenizer())
    rid = eng.submit(np.asarray(ids, np.int32), max_new_tokens=6)
    ref = eng.run(max_chunks=64)[rid]
    assert out["tokens"] == [int(t) for t in ref]


def test_generate_text_prompt_decodes(server):
    code, out = _post(server.port, "/v1/generate",
                      {"prompt": "hi", "max_new_tokens": 4})
    assert code == 200
    assert isinstance(out["text"], str)
    assert out["n_tokens"] > 0


def test_concurrent_requests_batch_and_all_complete(server, model):
    prompts = [[1, 50 + i, 60 + i] for i in range(5)]
    results = [None] * len(prompts)

    def worker(i):
        results[i] = _post(
            server.port, "/v1/generate",
            {"prompt_ids": prompts[i], "max_new_tokens": 5},
        )

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    eng = _engine(model, ByteTokenizer())
    rids = [eng.submit(np.asarray(p, np.int32), max_new_tokens=5)
            for p in prompts]
    ref = eng.run(max_chunks=256)
    for i, (code, out) in enumerate(results):
        assert code == 200, out
        assert out["tokens"] == [int(t) for t in ref[rids[i]]]


def test_oversized_prompt_rejected_not_fatal(server):
    code, out = _post(server.port, "/v1/generate",
                      {"prompt_ids": list(range(1, 32))})  # > bucket 16
    assert code == 400
    assert "rejected" in out["error"]
    # the pool survives: a well-formed request still completes
    code, out = _post(server.port, "/v1/generate",
                      {"prompt_ids": [1, 5, 6], "max_new_tokens": 3})
    assert code == 200


def test_bad_requests(server):
    for body, frag in [
        ({}, "prompt"),
        ({"prompt_ids": []}, "empty"),
        ({"prompt_ids": [1], "max_new_tokens": 0}, "max_new_tokens"),
    ]:
        code, out = _post(server.port, "/v1/generate", body)
        assert code == 400
        assert frag in out["error"]
    # malformed JSON body
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/generate",
        data=b"{not json", method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    code, _ = _get(server.port, "/nope")
    assert code == 404


def test_health_and_stats(server):
    code, h = _get(server.port, "/healthz")
    assert code == 200 and h["ok"] and h["rows"] == 2
    code, s = _get(server.port, "/v1/stats")
    assert code == 200
    assert s["completed"] >= 1 and s["tokens"] >= 1
    assert s["prefill_buckets"] == [8, 16]


def test_streaming_matches_plain_request(server):
    ids = [1, 70, 71, 72]
    code, plain = _post(server.port, "/v1/generate",
                        {"prompt_ids": ids, "max_new_tokens": 9})
    assert code == 200
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/generate",
        data=json.dumps({"prompt_ids": ids, "max_new_tokens": 9,
                         "stream": True}).encode(),
        method="POST",
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/x-ndjson"
        for line in r:  # urllib de-chunks transfer encoding
            events.append(json.loads(line))
    assert events[-1]["done"] is True
    assert events[-1]["n_tokens"] == plain["n_tokens"]
    assert "text" in events[-1]
    streamed = [t for e in events[:-1] for t in e["tokens"]]
    assert streamed == plain["tokens"]
    # engine chunk granularity: budget 9 > chunk_steps 4 must produce
    # more than one token event unless EOS cut generation short
    if plain["n_tokens"] > 4:
        assert len(events) > 2


def test_streaming_bad_request_is_plain_json(server):
    code, out = _post(server.port, "/v1/generate",
                      {"stream": True})
    assert code == 400 and "prompt" in out["error"]


def test_prefix_endpoint_roundtrip(server, model):
    """/v1/prefix registers a shared prefix; /v1/generate with prefix_id
    + the suffix matches the full prompt_ids request token-exactly."""
    pfx, sfx = [1, 40, 41, 42], [50, 51]
    code, reg = _post(server.port, "/v1/prefix", {"prompt_ids": pfx})
    assert code == 200 and isinstance(reg["prefix_id"], int)

    code, full = _post(server.port, "/v1/generate",
                       {"prompt_ids": pfx + sfx, "max_new_tokens": 5})
    assert code == 200
    code, cached = _post(
        server.port, "/v1/generate",
        {"prompt_ids": sfx, "prefix_id": reg["prefix_id"],
         "max_new_tokens": 5},
    )
    assert code == 200
    assert cached["tokens"] == full["tokens"]

    code, stats = _get(server.port, "/v1/stats")
    assert code == 200
    assert stats["prefixes"] >= 1 and stats["prefix_admits"] >= 1


def test_prefix_endpoint_client_errors(server):
    # unknown handle -> 400, pool untouched
    code, out = _post(server.port, "/v1/generate",
                      {"prompt_ids": [1, 2], "prefix_id": 12345})
    assert code == 400 and "prefix" in out["error"]
    # audio_path cannot combine with prefix_id
    code, out = _post(server.port, "/v1/generate",
                      {"prompt_ids": [1, 2], "prefix_id": 0,
                       "audio_path": "/tmp/x.wav"})
    assert code == 400
    # registering with an empty prompt is a client error
    code, out = _post(server.port, "/v1/prefix", {"prompt_ids": []})
    assert code == 400
    # health still OK afterwards
    code, h = _get(server.port, "/healthz")
    assert code == 200 and h["ok"]


def test_queued_request_drains_after_pool_retires(model):
    """Regression (review r3): requests queued behind a full pool must
    complete even when every admitted row retires in the same chunk —
    the loop's idle wait must also wake on a non-empty engine queue."""
    tk = ByteTokenizer()
    runner = EngineRunner(_engine(model, tk), poll_interval=0.01)
    # stage all three BEFORE the loop starts: lockstep admission of 2
    # rows + 1 queued, both rows retire within one chunk (budget 3 < 4)
    futs = [
        runner.submit(np.asarray([1, 10 + i], np.int32), None, 3)
        for i in range(3)
    ]
    runner.start()
    try:
        for f in futs:
            assert f.event.wait(180), "queued request never completed"
            assert f.error is None and f.tokens
    finally:
        runner.stop()


def test_missing_audio_file_is_client_error(server):
    code, out = _post(
        server.port, "/v1/generate",
        {"prompt_ids": [1, 2], "audio_path": "/nonexistent/a.wav"},
    )
    assert code == 400


def test_queue_backpressure(model):
    tk = ByteTokenizer()
    runner = EngineRunner(_engine(model, tk), max_queue=1)  # not started
    f1 = runner.submit(np.asarray([1, 2], np.int32), None, 2)
    f2 = runner.submit(np.asarray([1, 2], np.int32), None, 2)
    assert not f1.event.is_set()  # first request queued normally
    assert f2.event.is_set() and "overloaded" in f2.error
    runner.stop(timeout=0.5)
    assert "shutting down" in f1.error


def test_stop_fails_inflight_requests(model):
    tk = ByteTokenizer()
    runner = EngineRunner(_engine(model, tk), poll_interval=0.01)
    # do NOT start the loop thread: a submitted request stays staged
    fut = runner.submit(np.asarray([1, 2, 3], np.int32), None, 4)
    runner.stop(timeout=1.0)
    assert fut.event.is_set()
    assert "shutting down" in fut.error
    # post-stop submissions fail immediately
    fut2 = runner.submit(np.asarray([1], np.int32), None, 1)
    assert fut2.event.is_set() and "shutting down" in fut2.error


# ---- per-request sampling through the HTTP surface (round-5 VERDICT #5):
# the CLI sampling flags are only ENGINE DEFAULTS; any /v1/generate body
# overrides them per request, so ONE server instance serves mixed
# greedy+sampled traffic (reference per-call analog: src/inference.py
# sampling params). Pool-level semantics are pinned in
# test_per_request_sampling.py; this pins the HTTP plumbing.


@pytest.fixture(scope="module")
def stochastic_server(model):
    """A server whose ENGINE default is stochastic — greedy requests must
    opt in per-request."""
    tk = ByteTokenizer()
    runner = EngineRunner(
        _engine(model, tk, rows=4, greedy=False, temperature=0.9,
                top_p=0.95),
        poll_interval=0.01,
    )
    srv = AudioLLMServer(runner, CFG, tokenizer=tk, port=0,
                         request_timeout=120.0)
    srv.start()
    yield srv
    srv.stop()


def test_mixed_sampling_one_server(stochastic_server, model):
    """Concurrent greedy + sampled requests on ONE server: greedy
    responses are token-exact vs a direct greedy engine, and the mix
    compiles exactly one decode-chunk program."""
    srv = stochastic_server
    rng = np.random.default_rng(7)
    prompts = [
        [1] + rng.integers(3, 120, (n,)).astype(int).tolist()
        for n in (4, 6, 5, 7)
    ]
    results = {}

    def hit(i, body):
        results[i] = _post(srv.port, "/v1/generate", body)

    threads = []
    for i, p in enumerate(prompts):
        body = {"prompt_ids": p, "max_new_tokens": 5}
        if i % 2 == 0:
            body["greedy"] = True
        else:
            body.update(temperature=1.2, top_k=3, greedy=False)
        t = threading.Thread(target=hit, args=(i, body))
        t.start()
        threads.append(t)
    for t in threads:
        t.join(120)
    assert all(code == 200 for code, _ in results.values()), results

    # greedy rows: token-exact vs a direct greedy-engine oracle
    tk = ByteTokenizer()
    eng = _engine(model, tk, rows=4, greedy=True)
    for i in (0, 2):
        ids = np.asarray(prompts[i], np.int32)
        rid = eng.submit(ids, max_new_tokens=5)
        ref = eng.run(max_chunks=64)[rid]
        assert results[i][1]["tokens"] == [int(t) for t in ref], i
    # one compiled chunk program across the whole config mix
    assert srv.runner.engine._chunk_fn._cache_size() == 1


def test_sampling_param_validation(stochastic_server):
    srv = stochastic_server
    for body, frag in [
        ({"prompt_ids": [1, 2], "temperature": 0}, "temperature"),
        ({"prompt_ids": [1, 2], "temperature": -1.0}, "temperature"),
        ({"prompt_ids": [1, 2], "top_p": 0.0}, "top_p"),
        ({"prompt_ids": [1, 2], "top_p": 1.5}, "top_p"),
        ({"prompt_ids": [1, 2], "top_k": -2}, "top_k"),
        ({"prompt_ids": [1, 2], "greedy": "yes"}, "greedy"),
    ]:
        code, out = _post(srv.port, "/v1/generate", body)
        assert code == 400, (body, out)
        assert frag in out["error"], (body, out)
    # prefix registration rejects sampling params
    code, out = _post(srv.port, "/v1/prefix",
                      {"prompt_ids": [1, 2], "temperature": 0.5})
    assert code == 400 and "sampling" in out["error"]


def test_streaming_greedy_override_exact(stochastic_server, model):
    """stream=true + greedy override: streamed deltas concatenate to the
    greedy oracle tokens even though the engine default samples."""
    srv = stochastic_server
    ids = [1, 33, 34, 35, 36]
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/v1/generate",
        data=json.dumps({"prompt_ids": ids, "max_new_tokens": 5,
                         "stream": True, "greedy": True}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    toks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        for line in r:
            evt = json.loads(line)
            assert "error" not in evt, evt
            if evt.get("done"):
                break
            toks.extend(evt["tokens"])
    tk = ByteTokenizer()
    eng = _engine(model, tk, rows=4, greedy=True)
    rid = eng.submit(np.asarray(ids, np.int32), max_new_tokens=5)
    ref = eng.run(max_chunks=64)[rid]
    assert toks == [int(t) for t in ref]

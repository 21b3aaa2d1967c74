"""Serving runtime: engine batching/bucketing and the HTTP JSON API."""

import base64
import http.client
import json
import threading

import numpy as np
import pytest

from synergy_tpu.serve import EmbeddingEngine, serve


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    import jax.numpy as jnp

    return EmbeddingEngine(ckpt_dir=str(tmp_path_factory.mktemp("none")),
                           tiny=True, dtype=jnp.float32, max_batch=8)


def test_engine_embeddings_normalized(engine, rng):
    txt = engine.embed_text(["a photo of a dog", "rain on a roof", "x"])
    assert txt.shape == (3, engine.cfg.projection_dim)
    np.testing.assert_allclose(np.linalg.norm(txt, axis=1), 1.0, atol=1e-5)
    imgs = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
    img = engine.embed_image(imgs)
    assert img.shape == (2, engine.cfg.projection_dim)
    waves = rng.standard_normal((5, 16000)).astype(np.float32)
    aud = engine.embed_audio(waves)
    assert aud.shape == (5, engine.cfg.projection_dim)
    sim = engine.similarity(img, txt, "IT")
    assert sim.shape == (2, 3)


def test_engine_bucketing_consistency(engine, rng):
    """Padding to a bucket must not change the real rows."""
    texts = ["dog", "cat", "rain"]
    three = engine.embed_text(texts)
    one = engine.embed_text(texts[:1])
    np.testing.assert_allclose(three[0], one[0], atol=1e-5)


def test_audio_int16_wire_format_parity(engine, rng):
    """int16 PCM input (half-transfer wire format) must match the float32
    path up to quantization error. Elementwise tolerance is the wrong gauge:
    log-mel amplifies the -90 dB quantization floor in low-energy bins (and
    WAV sources are int16 at origin anyway) — assert embedding direction."""
    waves = (0.3 * rng.standard_normal((2, 16000))).astype(np.float32)
    i16 = (waves * 32767).astype(np.int16)
    a = engine.embed_audio(waves)
    b = engine.embed_audio(i16)
    cos = np.sum(a * b, axis=1)  # both rows are l2-normalized
    assert (cos > 0.995).all(), cos


def test_embed_stream_matches_sequential(engine, rng):
    """The pipelined bulk API must yield exactly the per-call results, in
    order, across modalities and ragged batch sizes."""
    batches = [(rng.random((n, 32, 32, 3)) * 255).astype(np.uint8)
               for n in (3, 1, 5)]
    streamed = list(engine.embed_stream("image", batches))
    for got, arr in zip(streamed, batches):
        np.testing.assert_allclose(got, engine.embed_image(arr), atol=1e-6)
    txt_batches = [["dog", "cat"], ["a sound of rain"]]
    streamed = list(engine.embed_stream("text", txt_batches))
    for got, t in zip(streamed, txt_batches):
        np.testing.assert_allclose(got, engine.embed_text(t), atol=1e-6)


@pytest.fixture(scope="module")
def recon_engines():
    import jax.numpy as jnp

    from synergy_tpu.serve import ReconstructionEngine

    return {mm: ReconstructionEngine(mm, ckpt_dir="/nonexistent-rc",
                                     mrl_root="/nonexistent-rc", tiny=True,
                                     dtype=jnp.float32, max_batch=4)
            for mm in ("aud", "img", "txt")}


def test_recon_engine_all_modalities(recon_engines, rng):
    """Each wrapper reconstructs its missing modality from raw inputs
    (uint8 images / strings / waveforms) with finite outputs and the
    configured output geometry; missing-input validation raises."""
    imgs = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
    texts = ["a dog barking", "rain on a roof"]
    waves = (0.1 * rng.standard_normal((2, 16000))).astype(np.float32)

    aud = recon_engines["aud"].reconstruct(images=imgs, texts=texts)
    cfg = recon_engines["aud"].recon_cfg
    assert aud.shape[0] == 2 and aud.size == 2 * np.prod(cfg.aud_size)
    assert np.isfinite(aud).all()

    img = recon_engines["img"].reconstruct(texts=texts, waves=waves)
    assert img.shape[0] == 2 and img.size == 2 * 3 * cfg.img_size ** 2
    assert np.isfinite(img).all()

    txt = recon_engines["txt"].reconstruct(images=imgs, waves=waves)
    assert len(txt) == 2 and all(isinstance(t, str) for t in txt)

    with pytest.raises(ValueError):
        recon_engines["aud"].reconstruct(images=imgs)  # texts missing
    with pytest.raises(ValueError):
        recon_engines["img"].reconstruct(texts=texts, waves=waves[:1])


def test_http_reconstruct_endpoint(engine, recon_engines, rng):
    """/reconstruct over HTTP must match the engine called directly."""
    import base64

    srv = serve(engine, port=0, recon_engines={"aud": recon_engines["aud"]})
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        imgs = (rng.random((1, 32, 32, 3)) * 255).astype(np.uint8)
        payload = {"mm": "aud", "texts": ["dog"],
                   "image_b64": base64.b64encode(imgs.tobytes()).decode(),
                   "shape": list(imgs.shape)}
        status, body = _post(srv.server_address, "/reconstruct", payload)
        assert status == 200
        got = np.frombuffer(base64.b64decode(body["recon_b64"]),
                            np.float32).reshape(body["shape"])
        want = recon_engines["aud"].reconstruct(images=imgs, texts=["dog"])
        np.testing.assert_allclose(got, want, atol=1e-6)
        status, body = _post(srv.server_address, "/reconstruct",
                             {"mm": "img", "texts": ["x"]})
        assert status == 400 and "error" in body
    finally:
        srv.shutdown()


def test_sharded_engine_matches_single_device(engine, rng):
    """dp=4 x tp=2 sharded serving on the 8-virtual-device mesh must
    reproduce the single-device engine's embeddings (identical PRNG init)
    — the same Megatron partition rules the trainer uses, applied to the
    serving path."""
    import jax.numpy as jnp

    sharded = EmbeddingEngine(ckpt_dir="/nonexistent-sh", tiny=True,
                              dtype=jnp.float32, max_batch=8,
                              mesh_data=4, mesh_model=2)
    assert sharded.min_bucket == 4
    texts = ["dog", "rain on a roof", "a cat purring"]
    np.testing.assert_allclose(sharded.embed_text(texts),
                               engine.embed_text(texts), atol=2e-5)
    imgs = (rng.random((3, 32, 32, 3)) * 255).astype(np.uint8)
    np.testing.assert_allclose(sharded.embed_image(imgs),
                               engine.embed_image(imgs), atol=2e-5)
    waves = (0.2 * rng.standard_normal((2, 16000))).astype(np.float32)
    np.testing.assert_allclose(sharded.embed_audio(waves),
                               engine.embed_audio(waves), atol=2e-5)


def test_microbatcher_coalesces_and_matches(engine):
    """Concurrent single-item requests through the MicroBatcher must (a)
    return exactly the unbatched embeddings and (b) coalesce into fewer
    device calls than requests (the whole point of the batcher)."""
    from synergy_tpu.serve import MicroBatcher

    texts = [f"probe text number {i}" for i in range(12)]
    want = {t: engine.embed_text([t])[0] for t in texts}

    b = MicroBatcher(engine, window_ms=150.0)
    results = {}
    lock = threading.Lock()

    def worker(t):
        out = b.embed("text", [t])
        with lock:
            results[t] = out[0]

    threads = [threading.Thread(target=worker, args=(t,)) for t in texts]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    assert b.rows == len(texts)
    assert b.calls < len(texts), (
        f"{b.calls} engine calls for {len(texts)} concurrent requests")
    for t in texts:
        np.testing.assert_allclose(results[t], want[t], atol=1e-5)


def test_microbatcher_mixed_modalities_and_errors(engine, rng):
    """Incompatible arrivals (different modality/shape) must flush cleanly,
    and a failing request must error only its own group, not kill the
    worker."""
    from synergy_tpu.serve import MicroBatcher

    b = MicroBatcher(engine, window_ms=5.0)
    imgs = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
    txt = b.embed("text", ["dog barks"])
    img = b.embed("image", imgs)
    np.testing.assert_allclose(txt, engine.embed_text(["dog barks"]),
                               atol=1e-6)
    np.testing.assert_allclose(img, engine.embed_image(imgs), atol=1e-6)
    with pytest.raises(Exception):
        b.embed("image", np.zeros((1, 8), np.uint8))  # not (B, H, W, 3)
    # the worker must still be alive after the failure
    txt2 = b.embed("text", ["still alive"])
    np.testing.assert_allclose(txt2, engine.embed_text(["still alive"]),
                               atol=1e-6)
    b.close()


def test_http_embed_batched_server(engine, rng):
    """End-to-end: a server with batching enabled must serve concurrent
    clients correctly (responses identical to the unbatched engine)."""
    srv = serve(engine, port=0, batch_window_ms=50.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        texts = [f"client {i} says hi" for i in range(8)]
        outs = {}
        lock = threading.Lock()

        def client(txt):
            status, body = _post(srv.server_address, "/embed",
                                 {"modality": "text", "texts": [txt]})
            assert status == 200
            with lock:
                outs[txt] = np.asarray(body["embeddings"][0])

        threads = [threading.Thread(target=client, args=(x,)) for x in texts]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for txt in texts:
            np.testing.assert_allclose(outs[txt],
                                       engine.embed_text([txt])[0], atol=1e-4)
        assert srv.batcher.rows == len(texts)
        assert srv.batcher.calls < len(texts)
    finally:
        srv.shutdown()
        srv.batcher.close()


def test_recompiles_bounded_by_buckets():
    """Arbitrary request sizes must compile at most one program per
    power-of-two bucket — the recompile bound the serving docs promise
    (docs/BENCHMARKS.md serving section)."""
    import jax.numpy as jnp

    eng = EmbeddingEngine(ckpt_dir="/nonexistent-ck", tiny=True,
                          dtype=jnp.float32, max_batch=8)
    sizes = [1, 2, 3, 5, 7, 8, 6, 4, 3, 1]
    for n in sizes:
        eng.embed_text([f"sample text {i}" for i in range(n)])
    buckets = {1, 2, 4, 8}  # _bucket(n, 8) over sizes
    n_compiled = eng._embed_text._cache_size()
    assert n_compiled <= len(buckets), (
        f"{n_compiled} compiled text programs for buckets {buckets}")


@pytest.fixture(scope="module")
def server(engine):
    srv = serve(engine, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _post(addr, path, payload):
    conn = http.client.HTTPConnection(*addr, timeout=60)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def test_http_healthz(server):
    conn = http.client.HTTPConnection(*server, timeout=30)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    assert resp.status == 200
    assert json.loads(resp.read())["status"] == "ok"


def test_http_embed_and_similarity(server, rng):
    status, out = _post(server, "/embed",
                        {"modality": "text", "texts": ["dog", "violin"]})
    assert status == 200 and len(out["embeddings"]) == 2

    imgs = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
    status, out = _post(server, "/embed", {
        "modality": "image",
        "image_b64": base64.b64encode(imgs.tobytes()).decode(),
        "shape": list(imgs.shape),
    })
    assert status == 200 and len(out["embeddings"]) == 2

    status, out = _post(server, "/similarity", {
        "texts": ["a dog", "a violin", "rain"],
        "image_b64": base64.b64encode(imgs.tobytes()).decode(),
        "shape": list(imgs.shape),
    })
    assert status == 200
    sim = np.asarray(out["similarity"])
    assert sim.shape == (2, 3) and out["pair"] == "IT"


def test_http_classify(server, rng):
    """/classify is the eval suite's fixed zero-shot protocol as an API:
    prompt template over the label set, softmax over similarities."""
    imgs = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
    status, out = _post(server, "/classify", {
        "labels": ["dog barking", "rain", "violin"],
        "image_b64": base64.b64encode(imgs.tobytes()).decode(),
        "shape": list(imgs.shape),
        "top_k": 2,
    })
    assert status == 200 and out["pair"] == "IT"
    probs = np.asarray(out["probs"])
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
    assert len(out["top"]) == 2 and len(out["top"][0]) == 2
    assert out["top"][0][0]["prob"] >= out["top"][0][1]["prob"]
    # audio branch + empty labels rejected
    wave = (rng.standard_normal((1, 16000)) * 1000).astype(np.int16)
    status, out = _post(server, "/classify", {
        "labels": ["dog barking", "rain"], "dtype": "int16",
        "audio_b64": base64.b64encode(wave.tobytes()).decode(),
        "shape": list(wave.shape),
    })
    assert status == 200 and out["pair"] == "TA"
    assert np.asarray(out["probs"]).shape == (1, 2)
    status, out = _post(server, "/classify", {"labels": []})
    assert status == 400


def test_http_bad_requests(server):
    status, out = _post(server, "/embed", {"modality": "video"})
    assert status == 400 and "error" in out
    status, out = _post(server, "/embed", {"modality": "image"})
    assert status == 400
    status, out = _post(server, "/nope", {})
    assert status == 404


def test_zero_rows_embed_finite(engine):
    """All-zero padded bucket rows must yield finite embeddings: l2_normalize
    guards the 0/0 case so a degenerate feature row maps to zeros, not NaN."""
    import jax.numpy as jnp

    from synergy_tpu.losses import l2_normalize

    z = l2_normalize(jnp.zeros((2, 8)))
    assert np.isfinite(np.asarray(z)).all() and (np.asarray(z) == 0).all()

    cfg = engine.cfg
    size = cfg.vision.image_size
    # 3 items into the 4-bucket: the 4th row is all-zero input
    emb = engine.embed_image(np.zeros((3, size, size, 3), np.uint8))
    assert np.isfinite(emb).all()
    full = np.asarray(engine._embed_image(
        engine.params, jnp.zeros((4, size, size, 3), jnp.uint8)))
    assert np.isfinite(full).all()


def test_http_concurrent_embed_stable(server):
    """8 threads hammer /embed concurrently; every response must equal the
    single-threaded result (guards the shared native-BPE buffer)."""
    texts = ["a dog barking", "rain on a tin roof", "violin concerto",
             "church bells at noon"]
    _, ref = _post(server, "/embed", {"modality": "text", "texts": texts})
    expected = np.asarray(ref["embeddings"])
    failures = []

    def worker():
        for _ in range(4):
            status, out = _post(server, "/embed",
                                {"modality": "text", "texts": texts})
            got = np.asarray(out["embeddings"])
            if status != 200 or not np.allclose(got, expected, atol=1e-5):
                failures.append(status)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not failures, f"{len(failures)} corrupted concurrent responses"


def test_microbatcher_close_is_prompt_when_idle(engine):
    """close() on an idle batcher must release both threads immediately
    (regression: the worker's idle-stop path never signaled the completer,
    so every close stalled the full join timeout and leaked the thread)."""
    import time

    from synergy_tpu.serve import MicroBatcher

    b = MicroBatcher(engine, window_ms=2.0)
    b.embed("text", ["warm"])
    t0 = time.monotonic()
    b.close()
    assert time.monotonic() - t0 < 2.0
    assert not b._t.is_alive() and not b._c.is_alive()


def test_warmup_covers_non_power_of_two_max_batch():
    """warmup() must compile the max_batch bucket itself, not a bypassing
    oversized program (regression: max_batch=6 warmed 1,2,4 then ran an
    unpadded batch-8 call, leaving bucket 6 cold)."""
    import jax.numpy as jnp

    eng = EmbeddingEngine(ckpt_dir="/nonexistent-wm", tiny=True,
                          dtype=jnp.float32, max_batch=6)
    seen = []
    orig = eng._embed_text
    eng._embed_text = lambda p, i, a: (seen.append(i.shape[0]),
                                       orig(p, i, a))[1]
    eng.warmup(("text",))
    assert seen == [1, 2, 4, 6]


def test_http_similarity_accepts_int16_audio(server, rng):
    """/similarity must honor the int16 PCM wire contract like /embed."""
    wave_f32 = (rng.random((1, 4000)).astype(np.float32) - 0.5) * 0.2
    wave_i16 = (wave_f32 * 32768.0).astype(np.int16)
    status, out = _post(server, "/similarity", {
        "texts": ["a dog", "rain"],
        "audio_b64": base64.b64encode(wave_i16.tobytes()).decode(),
        "shape": list(wave_i16.shape),
        "dtype": "int16",
    })
    assert status == 200
    sim = np.asarray(out["similarity"])
    # rows = audio clips, cols = texts (same convention as the image case)
    assert sim.shape == (1, 2) and out["pair"] == "TA"
    assert np.all(np.isfinite(sim))


@pytest.mark.slow
def test_microbatcher_concurrent_mixed_load_no_starvation(engine, rng):
    """Sustained concurrent image+audio+text load through one MicroBatcher:
    every request must complete correctly AND each modality must make
    continuous progress (completion-time ranges pairwise overlap — a starved
    modality would only finish after another modality fully drained).
    Absolute latency is not asserted: this box has one noisy shared vCPU."""
    import time

    from synergy_tpu.serve import MicroBatcher

    b = MicroBatcher(engine, window_ms=2.0)
    per_client, done = 6, {}
    img = (rng.random((1, 32, 32, 3)) * 255).astype(np.uint8)
    wav = rng.standard_normal((1, 16000)).astype(np.float32)
    payload = {"text": ["a dog barks"], "image": img, "audio": wav}
    expect = {"text": engine.embed_text(["a dog barks"]),
              "image": engine.embed_image(img),
              "audio": engine.embed_audio(wav)}
    engine.warmup(("text", "image", "audio"), image_size=32)
    errs = []

    def client(modality):
        times = []
        try:
            for _ in range(per_client):
                out = b.embed(modality, payload[modality])
                np.testing.assert_allclose(out, expect[modality], atol=1e-5)
                times.append(time.monotonic())
        except Exception as e:  # surfaced after join
            errs.append((modality, e))
        done[modality] = times

    threads = [threading.Thread(target=client, args=(m,)) for m in payload]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs, errs
    assert all(len(v) == per_client for v in done.values()), {
        k: len(v) for k, v in done.items()}
    spans = {m: (v[0], v[-1]) for m, v in done.items()}
    for m1 in spans:
        for m2 in spans:
            if m1 < m2:  # ranges overlap => no cross-modality starvation
                assert spans[m1][0] <= spans[m2][1] and \
                    spans[m2][0] <= spans[m1][1], (spans, m1, m2)
    b.close()


def test_wrong_size_checkpoint_fails_fast(engine, tmp_path):
    """A size-mismatched checkpoint (tiny export loaded into a base engine)
    must raise the actionable ValueError at construction, not a flax scope
    shape error at first jitted apply (serve.py guard)."""
    import jax.numpy as jnp

    from synergy_tpu.train import checkpoint as ckpt

    ckpt.export_towers(str(tmp_path), ckpt.size_tag(True, False),
                       engine.params)  # tiny-dim export under the base tag
    with pytest.raises(ValueError, match="wrong size"):
        EmbeddingEngine(ckpt_dir=str(tmp_path), is_base=True,
                        dtype=jnp.float32)

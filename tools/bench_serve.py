"""Serving throughput/latency benchmark for the embedding runtime.

Measures, on the current backend (intended: one real TPU chip):
  * engine-level sustained embeddings/s per modality at the max bucket
    (batch 64 — the fused-MLP inference kernel is active there on TPU);
  * HTTP /embed round-trip latency p50/p99 for single-item text requests
    (the dominant serving pattern) through the stdlib server.

Run from the repo root (PYTHONPATH must stay unset for the axon plugin):
  python tools/bench_serve.py [--batch 64] [--iters 30] [--http_iters 100]

Prints one JSON line per row plus a final markdown table for
docs/BENCHMARKS.md.
"""

import argparse
import http.client
import json
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bench_engine(engine, batch: int, iters: int):
    """Sustained embeddings/s per modality at a fixed (bucketed) batch."""
    rng = np.random.default_rng(0)
    texts = [f"a photo and sound of sample {i} with some words" for i in
             range(batch)]
    images = (rng.random((batch, 224, 224, 3)) * 255).astype(np.uint8)
    waves = (0.1 * rng.standard_normal((batch, 164080))).astype(np.float32)

    waves_i16 = (waves * 32767).astype(np.int16)

    rows = {}
    for name, arr, fn in [
            ("text", texts, lambda: engine.embed_text(texts)),
            ("image", images, lambda: engine.embed_image(images)),
            ("audio", waves, lambda: engine.embed_audio(waves)),
            ("audio_i16", waves_i16, lambda: engine.embed_audio(waves_i16))]:
        fn()  # compile
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        dt = time.perf_counter() - t0
        assert out.shape[0] == batch
        rows[name] = {"embeddings_per_sec": round(iters * batch / dt, 1),
                      "batch_ms": round(dt / iters * 1e3, 2)}
        # streamed: overlap batch i+1's transfer with batch i's compute
        modality = name.split("_")[0]
        t0 = time.perf_counter()
        outs = list(engine.embed_stream(modality, [arr] * iters))
        dt = time.perf_counter() - t0
        assert len(outs) == iters and outs[-1].shape[0] == batch
        rows[name]["streamed_per_sec"] = round(iters * batch / dt, 1)
        print(json.dumps({"metric": f"serve_{name}_embeddings_per_sec",
                          "value": rows[name]["embeddings_per_sec"],
                          "streamed": rows[name]["streamed_per_sec"],
                          "unit": "emb/s", "batch": batch}), flush=True)
    return rows


def bench_http(engine, iters: int, port: int = 8991):
    """HTTP /embed p50/p99 for single-text requests via the real server."""
    from synergy_tpu.serve import serve

    server = serve(engine, port=port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    body = json.dumps({"modality": "text",
                       "texts": ["a photo and sound of dog barking"]})
    lat = []
    try:
        for i in range(iters + 5):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            t0 = time.perf_counter()
            conn.request("POST", "/embed", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            data = json.loads(resp.read())
            conn.close()
            assert resp.status == 200 and len(data["embeddings"]) == 1
            if i >= 5:  # skip warmup/compile
                lat.append(time.perf_counter() - t0)
    finally:
        server.shutdown()
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    p50 = float(np.percentile(lat_ms, 50))
    p99 = float(np.percentile(lat_ms, 99))
    print(json.dumps({"metric": "serve_http_text1_latency_ms",
                      "p50": round(p50, 2), "p99": round(p99, 2)}), flush=True)
    return {"p50_ms": round(p50, 2), "p99_ms": round(p99, 2)}


def bench_http_concurrent(engine, n_clients: int, per_client: int,
                          window_ms: float, port: int):
    """Sustained single-text requests from n concurrent clients, batched
    (window_ms > 0) vs unbatched — the MicroBatcher's payoff case."""
    from synergy_tpu.serve import serve

    server = serve(engine, port=port, batch_window_ms=window_ms)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    body = json.dumps({"modality": "text",
                       "texts": ["a photo and sound of dog barking"]})

    def client(idx):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        for _ in range(per_client):
            conn.request("POST", "/embed", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200
            resp.read()
        conn.close()

    try:
        engine.warmup(("text",))  # every bucket compiled BEFORE timing
        client(0)
        # snapshot AFTER warmup so engine_calls counts the timed phase only
        calls0 = server.batcher.calls if server.batcher else 0
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        dt = time.perf_counter() - t0
    finally:
        server.shutdown()
        if server.batcher is not None:
            server.batcher.close()
    rps = n_clients * per_client / dt
    calls = (server.batcher.calls - calls0 if server.batcher
             else n_clients * per_client)
    print(json.dumps({"metric": "serve_http_concurrent_rps",
                      "window_ms": window_ms, "clients": n_clients,
                      "value": round(rps, 1), "engine_calls": calls,
                      "requests": n_clients * per_client}), flush=True)
    return rps


def bench_http_mixed(engine, n_per_modality: int, per_client: int,
                     window_ms: float, port: int):
    """Concurrent image+audio+text clients against ONE server with the
    MicroBatcher on: per-modality p50/p99 and aggregate req/s. Exercises the
    cross-modality flush path under sustained load (a starved modality shows
    up as a p99 orders beyond its p50)."""
    import base64

    import numpy as np

    from synergy_tpu.serve import serve

    server = serve(engine, port=port, batch_window_ms=window_ms)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    rng = np.random.default_rng(0)
    img = (rng.random((1, 224, 224, 3)) * 255).astype(np.uint8)
    wav = rng.standard_normal((1, 16000)).astype(np.float32)
    bodies = {
        "text": json.dumps({"modality": "text",
                            "texts": ["a photo and sound of dog barking"]}),
        "image": json.dumps({
            "modality": "image", "shape": list(img.shape),
            "image_b64": base64.b64encode(img.tobytes()).decode()}),
        "audio": json.dumps({
            "modality": "audio", "shape": list(wav.shape),
            "audio_b64": base64.b64encode(wav.tobytes()).decode()}),
    }
    lat = {m: [] for m in bodies}

    def client(modality):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        for _ in range(per_client):
            t0 = time.perf_counter()
            conn.request("POST", "/embed", bodies[modality],
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()[:200]
            resp.read()
            lat[modality].append(time.perf_counter() - t0)
        conn.close()

    try:
        engine.warmup(("text", "image", "audio"),
                      image_size=img.shape[1], wave_len=wav.shape[1])
        for m in bodies:           # compile-free timing
            client(m)
        for m in bodies:
            lat[m].clear()
        # snapshot AFTER warmup so engine_calls counts the timed phase only
        calls0 = server.batcher.calls if server.batcher else 0
        threads = [threading.Thread(target=client, args=(m,))
                   for m in bodies for _ in range(n_per_modality)]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        dt = time.perf_counter() - t0
    finally:
        server.shutdown()
        if server.batcher is not None:
            server.batcher.close()
    total = 3 * n_per_modality * per_client
    row = {"metric": "serve_http_mixed_rps", "window_ms": window_ms,
           "clients_per_modality": n_per_modality,
           "value": round(total / dt, 1),
           "engine_calls": (server.batcher.calls - calls0
                            if server.batcher else total)}
    for m, xs in lat.items():
        xs.sort()
        row[f"{m}_p50_ms"] = round(xs[len(xs) // 2] * 1e3, 1)
        row[f"{m}_p99_ms"] = round(xs[min(len(xs) - 1,
                                          int(len(xs) * 0.99))] * 1e3, 1)
    print(json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--http_iters", type=int, default=100)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--per_client", type=int, default=25)
    p.add_argument("--window_ms", type=float, default=2.0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--size", choices=["tiny", "base", "large"], default=None,
                   help="model config; --size large serves the ViT-L/14 + "
                        "RoBERTa-large + AST-1214 towers")
    args = p.parse_args()

    from synergy_tpu.serve import EmbeddingEngine
    from synergy_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    size = args.size or ("tiny" if args.tiny else "base")
    engine = EmbeddingEngine(tiny=size == "tiny", is_base=size != "large",
                             max_batch=args.batch)
    print(f"backend={jax.default_backend()} checkpoint={engine.loaded_from}",
          flush=True)
    rows = bench_engine(engine, args.batch, args.iters)
    http_row = bench_http(engine, args.http_iters)
    rps_plain = bench_http_concurrent(engine, args.clients, args.per_client,
                                      0.0, 8992)
    rps_batched = bench_http_concurrent(engine, args.clients, args.per_client,
                                        args.window_ms, 8993)
    mixed = bench_http_mixed(engine, max(1, args.clients // 4),
                             args.per_client, args.window_ms, 8994)

    print("\n| modality | batch | batch ms | embeddings/s | streamed |")
    print("|---|---|---|---|---|")
    for name, r in rows.items():
        print(f"| {name} | {args.batch} | {r['batch_ms']} | "
              f"{r['embeddings_per_sec']} | {r['streamed_per_sec']} |")
    print(f"\nHTTP /embed 1-text: p50 {http_row['p50_ms']} ms, "
          f"p99 {http_row['p99_ms']} ms")
    print(f"HTTP /embed {args.clients} concurrent clients: "
          f"{rps_plain:.1f} req/s unbatched -> {rps_batched:.1f} req/s "
          f"batched (window {args.window_ms} ms)")
    print(f"HTTP /embed mixed img+aud+txt ({max(1, args.clients // 4)} "
          f"clients/modality): {mixed['value']} req/s; p50/p99 ms — "
          + ", ".join(f"{m} {mixed[f'{m}_p50_ms']}/{mixed[f'{m}_p99_ms']}"
                      for m in ("text", "image", "audio")))


if __name__ == "__main__":
    main()

"""Embedding / similarity serving runtime.

The reference has no serving story (its inference is ad-hoc script code);
this module packages the stage-1 model for production embedding extraction:

  * ``EmbeddingEngine`` — loads TriCLIP from the checkpoint export, jits the
    three per-modality encoders once per (bucketed) batch shape, and exposes
    ``embed_image / embed_text / embed_audio / similarity``. Requests are
    padded to power-of-two batch buckets so arbitrary request sizes never
    trigger recompilation.
  * a dependency-free HTTP JSON API (stdlib ``http.server``):
      POST /embed      {"modality": "text", "texts": [...]}
                       {"modality": "image", "image_b64": ..., "shape": [B,H,W,3]}
                       {"modality": "audio", "audio_b64": ..., "shape": [B,N]}
      POST /similarity {"texts": [...], plus one of image_b64/audio_b64 ...}
      GET  /healthz
    Binary payloads are base64-encoded little-endian arrays (uint8 for
    images, float32 waveform at 16 kHz for audio).

CLI: ``python -m synergy_tpu.serve --ckpt_dir synergy_ckpt --port 8990``.
"""

from __future__ import annotations

import argparse
import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from synergy_tpu.configs import CLIPConfig
from synergy_tpu.data.audio import log_mel_fbank
from synergy_tpu.data.image import eval_transform, normalize, resize
from synergy_tpu.data.pipeline import get_tokenizer
from synergy_tpu.losses import l2_normalize
from synergy_tpu.models.tri_clip import TriCLIP
from synergy_tpu.train import checkpoint as ckpt
from synergy_tpu.utils import enable_compilation_cache, str2bool


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class EmbeddingEngine:
    def __init__(self, ckpt_dir: str = "synergy_ckpt", is_base: bool = True,
                 is_captioned: bool = False, tiny: bool = False,
                 vocab_dir: Optional[str] = None, max_batch: int = 64,
                 dtype=jnp.bfloat16, seq_max_length: int = 32):
        self.cfg = (CLIPConfig.tiny() if tiny
                    else (CLIPConfig.base() if is_base else CLIPConfig.large()))
        self.model = TriCLIP(self.cfg, dtype=dtype)
        self.tokenizer = get_tokenizer(vocab_dir)
        self.max_batch = max_batch
        self.seq_max_length = seq_max_length
        tag = ckpt.size_tag(is_base, is_captioned)
        try:
            self.params = ckpt.load_tri_clip_params(ckpt_dir, tag)
            self.loaded_from = f"{ckpt_dir}/{tag}"
        except (FileNotFoundError, OSError):
            cfg = self.cfg
            self.params = jax.jit(self.model.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 3, cfg.vision.image_size, cfg.vision.image_size)),
                jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
                jnp.zeros((1, cfg.audio.max_length, cfg.audio.num_mel_bins)),
            )["params"]
            self.loaded_from = "random-init"

        m = self.model
        size = self.cfg.vision.image_size

        # Preprocessing is FUSED into the jitted encoder call: one program per
        # (bucketed) input shape, one host->device transfer of the raw
        # uint8/waveform batch, one device->host transfer of the embeddings.
        # (An earlier version ran resize/fbank op-by-op outside jit and
        # round-tripped the preprocessed tensors through host numpy — on the
        # axon tunnel that cost ~100x in dispatch + transfer latency.)
        def _image_fwd(p, imgs_u8):
            imgs = imgs_u8.astype(jnp.float32) / 255.0
            if imgs.shape[1] == size and imgs.shape[2] == size:
                pixel = jnp.transpose(normalize(imgs), (0, 3, 1, 2))
            elif imgs.shape[1] < size or imgs.shape[2] < size:
                imgs = jax.vmap(lambda im: resize(im, (size, size)))(imgs)
                pixel = jnp.transpose(normalize(imgs), (0, 3, 1, 2))
            else:
                pixel = jax.vmap(lambda im: eval_transform(im, size))(imgs)
            return l2_normalize(m.apply(
                {"params": p}, pixel, method=TriCLIP.get_image_features
            ).astype(jnp.float32))

        def _audio_fwd(p, waves):
            if waves.dtype == jnp.int16:
                # 16-bit PCM wire format: halves the host->device transfer
                # (the serving bottleneck on thin links); scaled on device.
                waves = waves.astype(jnp.float32) / 32767.0
            fb = jax.vmap(log_mel_fbank)(waves)
            fb = fb[:, : self.cfg.audio.max_length,
                    : self.cfg.audio.num_mel_bins]
            return l2_normalize(m.apply(
                {"params": p}, fb, method=TriCLIP.get_audio_features
            ).astype(jnp.float32))

        self._embed_image = jax.jit(_image_fwd)
        self._embed_text = jax.jit(lambda p, i, a: l2_normalize(m.apply(
            {"params": p}, i, a, method=TriCLIP.get_text_features
        ).astype(jnp.float32)))
        self._embed_audio = jax.jit(_audio_fwd)

    def _pad(self, arr: np.ndarray):
        n = arr.shape[0]
        b = _bucket(n, self.max_batch)
        if n < b:
            pad = np.zeros((b - n, *arr.shape[1:]), arr.dtype)
            arr = np.concatenate([arr, pad])
        return arr, n

    def embed_text(self, texts: List[str]) -> np.ndarray:
        toks = self.tokenizer(texts, max_length=self.seq_max_length)
        ids, n = self._pad(toks["input_ids"])
        mask, _ = self._pad(toks["attention_mask"])
        out = self._embed_text(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out)[:n]

    def embed_image(self, images_uint8: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 -> (B, D); preprocessing fused on device."""
        imgs, n = self._pad(np.ascontiguousarray(images_uint8, dtype=np.uint8))
        out = self._embed_image(self.params, jnp.asarray(imgs))
        return np.asarray(out)[:n]

    def embed_audio(self, waves: np.ndarray) -> np.ndarray:
        """(B, N) @16 kHz -> (B, D); fbank fused on device. float32 in
        [-1, 1] or int16 PCM (preferred on thin links: half the transfer)."""
        dtype = np.int16 if waves.dtype == np.int16 else np.float32
        waves, n = self._pad(np.ascontiguousarray(waves, dtype=dtype))
        out = self._embed_audio(self.params, jnp.asarray(waves))
        return np.asarray(out)[:n]

    def _dispatch(self, modality: str, arr):
        """Pad + transfer + dispatch WITHOUT blocking on the result."""
        if modality == "text":
            toks = self.tokenizer(arr, max_length=self.seq_max_length)
            ids, n = self._pad(toks["input_ids"])
            mask, _ = self._pad(toks["attention_mask"])
            return self._embed_text(self.params, jnp.asarray(ids),
                                    jnp.asarray(mask)), n
        if modality == "image":
            imgs, n = self._pad(np.ascontiguousarray(arr, dtype=np.uint8))
            return self._embed_image(self.params, jnp.asarray(imgs)), n
        if modality == "audio":
            dtype = np.int16 if getattr(arr, "dtype", None) == np.int16 \
                else np.float32
            waves, n = self._pad(np.ascontiguousarray(arr, dtype=dtype))
            return self._embed_audio(self.params, jnp.asarray(waves)), n
        raise ValueError(f"unknown modality {modality!r}")

    def embed_stream(self, modality: str, batches):
        """Pipelined embedding over an iterable of host batches: batch i+1's
        host->device transfer and dispatch overlap batch i's compute and
        device->host readback (JAX dispatch is async; only the final
        np.asarray blocks). This is the bulk-extraction API — on links where
        transfer rivals compute it roughly doubles sustained throughput."""
        prev = None
        for arr in batches:
            cur = self._dispatch(modality, arr)
            if prev is not None:
                out, n = prev
                yield np.asarray(out)[:n]
            prev = cur
        if prev is not None:
            out, n = prev
            yield np.asarray(out)[:n]

    def similarity(self, a: np.ndarray, b: np.ndarray, pair: str = "IT"
                   ) -> np.ndarray:
        scale = float(np.exp(np.asarray(self.params[f"logit_scale_{pair}"])))
        return (a @ b.T) * scale


def _decode_array(payload: Dict, key: str, dtype) -> np.ndarray:
    raw = base64.b64decode(payload[key])
    return np.frombuffer(raw, dtype=dtype).reshape(payload["shape"]).copy()


class _Handler(BaseHTTPRequestHandler):
    engine: EmbeddingEngine = None  # set by serve()

    def log_message(self, fmt, *args):  # quiet
        pass

    def _send(self, code: int, obj: Dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._send(200, {"status": "ok",
                             "checkpoint": self.engine.loaded_from})
        else:
            self._send(404, {"error": "unknown path"})

    def do_POST(self):
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length))
            if self.path == "/embed":
                emb = self._embed(payload)
                self._send(200, {"embeddings": emb.tolist()})
            elif self.path == "/similarity":
                texts = payload["texts"]
                txt = self.engine.embed_text(texts)
                if "image_b64" in payload:
                    other = self.engine.embed_image(
                        _decode_array(payload, "image_b64", np.uint8))
                    pair = "IT"
                    sim = self.engine.similarity(other, txt, pair)
                else:
                    other = self.engine.embed_audio(
                        _decode_array(payload, "audio_b64", np.float32))
                    pair = "TA"
                    sim = self.engine.similarity(txt, other, pair).T
                self._send(200, {"similarity": sim.tolist(), "pair": pair})
            else:
                self._send(404, {"error": "unknown path"})
        except (KeyError, ValueError, json.JSONDecodeError) as e:
            self._send(400, {"error": f"{type(e).__name__}: {e}"})

    def _embed(self, payload: Dict) -> np.ndarray:
        modality = payload.get("modality")
        if modality == "text":
            return self.engine.embed_text(payload["texts"])
        if modality == "image":
            return self.engine.embed_image(
                _decode_array(payload, "image_b64", np.uint8))
        if modality == "audio":
            return self.engine.embed_audio(
                _decode_array(payload, "audio_b64", np.float32))
        raise ValueError(f"unknown modality {modality!r}")


def serve(engine: EmbeddingEngine, port: int = 8990, host: str = "127.0.0.1"):
    handler = type("Handler", (_Handler,), {"engine": engine})
    server = ThreadingHTTPServer((host, port), handler)
    return server


def main(argv=None):
    p = argparse.ArgumentParser(description="Synergy-TPU embedding server")
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    p.add_argument("--tiny", type=str2bool, default=False)
    p.add_argument("--vocab_dir", type=str, default=None)
    p.add_argument("--port", type=int, default=8990)
    p.add_argument("--host", type=str, default="127.0.0.1")
    args = p.parse_args(argv)
    enable_compilation_cache()
    engine = EmbeddingEngine(args.ckpt_dir, args.IS_BASE, args.IS_CAPTIONED,
                             args.tiny, args.vocab_dir)
    server = serve(engine, args.port, args.host)
    print(f"[serve] checkpoint={engine.loaded_from} "
          f"listening on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()

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
                       {"modality": "audio", "audio_b64": ..., "shape": [B,N],
                        "dtype": "int16"|"float32"}
      POST /similarity {"texts": [...], plus one of image_b64/audio_b64 ...}
      POST /classify   {"labels": [...], plus image_b64/audio_b64; optional
                        "template" (defaults to the eval suite's ZS prompts)
                        and "top_k"} -> per-sample label probabilities
      POST /reconstruct {"mm": "aud"|"img"|"txt", plus the two present
                        modalities} -> recon_b64 float32 (img/aud) or texts
                        (requires --recon_mm engines; stage-2 MMR serving)
      GET  /healthz
    Binary payloads are base64-encoded little-endian arrays (uint8 for
    images, float32 in [-1,1] or int16 PCM waveform at 16 kHz for audio —
    int16 halves the wire+transfer bytes).
  * ``MicroBatcher`` — optional dynamic micro-batching (``--batch_window_ms``,
    default 2 ms): concurrent single-item /embed requests coalesce into one
    bucketed device call, multiplying sustained throughput under load.

CLI: ``python -m synergy_tpu.serve --ckpt_dir synergy_ckpt --port 8990``.
"""

from __future__ import annotations

import argparse
import base64
import json
import queue
import threading
import time
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


def _bucket(n: int, max_batch: int, min_batch: int = 1) -> int:
    b = min_batch
    while b < n:
        b *= 2
    return min(b, max_batch)


def _device_image_chain(imgs_u8, size: int):
    """uint8 NHWC -> normalized NCHW pixel values, inside jit."""
    imgs = imgs_u8.astype(jnp.float32) / 255.0
    if imgs.shape[1] == size and imgs.shape[2] == size:
        return jnp.transpose(normalize(imgs), (0, 3, 1, 2))
    if imgs.shape[1] < size or imgs.shape[2] < size:
        imgs = jax.vmap(lambda im: resize(im, (size, size)))(imgs)
        return jnp.transpose(normalize(imgs), (0, 3, 1, 2))
    return jax.vmap(lambda im: eval_transform(im, size))(imgs)


def _device_fbank(waves, cfg):
    """float32 [-1,1] or int16 PCM waveform -> (B, frames, mels), inside
    jit; int16 is the half-transfer wire format, scaled on device."""
    if waves.dtype == jnp.int16:
        waves = waves.astype(jnp.float32) / 32767.0
    fb = jax.vmap(log_mel_fbank)(waves)
    return fb[:, : cfg.audio.max_length, : cfg.audio.num_mel_bins]


class EmbeddingEngine:
    def __init__(self, ckpt_dir: str = "synergy_ckpt", is_base: bool = True,
                 is_captioned: bool = False, tiny: bool = False,
                 vocab_dir: Optional[str] = None, max_batch: int = 64,
                 dtype=jnp.bfloat16, seq_max_length: int = 32,
                 mesh_data: int = 1, mesh_model: int = 1):
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
            got = self.params["text"]["embeddings"]["word_embeddings"][
                "embedding"].shape
            want = (self.cfg.text.vocab_size, self.cfg.text.hidden_size)
            if tuple(got) != want:
                # fail HERE with an actionable message, not at first apply
                # with a flax scope-shape error deep in a jitted call
                raise ValueError(
                    f"checkpoint under {ckpt_dir}/{tag} has text embedding "
                    f"shape {tuple(got)} but the engine config expects "
                    f"{want} — wrong size (tiny/base/large) checkpoint for "
                    f"this engine")
        except (FileNotFoundError, OSError):
            cfg = self.cfg
            self.params = jax.jit(self.model.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 3, cfg.vision.image_size, cfg.vision.image_size)),
                jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
                jnp.zeros((1, cfg.audio.max_length, cfg.audio.num_mel_bins)),
            )["params"]
            self.loaded_from = "random-init"

        # Sharded serving: weights over the 'model' axis (Megatron-style TP
        # partition rules, same as training), request rows over 'data'.
        # Serves Large configs across several small-HBM chips and scales
        # throughput across a slice; single-device (1, 1) is unchanged.
        jit_kwargs = {}
        self.min_bucket = 1
        if mesh_data * mesh_model > 1 or mesh_data == -1:
            from synergy_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                                   param_shardings, replicated)

            self.mesh = create_mesh((mesh_data, mesh_model))
            p_shard = param_shardings(self.mesh, self.params)
            self.params = jax.device_put(self.params, p_shard)
            rows = self.mesh.shape["data"]
            if rows & (rows - 1):
                raise ValueError(f"data axis size {rows} must be a power of "
                                 "two (batch buckets are powers of two)")
            self.min_bucket = rows
            if max_batch % rows:
                raise ValueError(f"max_batch {max_batch} must divide over "
                                 f"the data axis ({rows})")
            self._batch_in = batch_sharding(self.mesh)
            jit_kwargs = {"out_shardings": replicated(self.mesh)}
        else:
            self.mesh = None
            self._batch_in = None

        m = self.model
        size = self.cfg.vision.image_size

        # Preprocessing is FUSED into the jitted encoder call: one program per
        # (bucketed) input shape, one host->device transfer of the raw
        # uint8/waveform batch, one device->host transfer of the embeddings.
        # (An earlier version ran resize/fbank op-by-op outside jit and
        # round-tripped the preprocessed tensors through host numpy — on the
        # axon tunnel that cost ~100x in dispatch + transfer latency.)
        def _image_fwd(p, imgs_u8):
            pixel = _device_image_chain(imgs_u8, size)
            return l2_normalize(m.apply(
                {"params": p}, pixel, method=TriCLIP.get_image_features
            ).astype(jnp.float32))

        def _audio_fwd(p, waves):
            fb = _device_fbank(waves, self.cfg)
            return l2_normalize(m.apply(
                {"params": p}, fb, method=TriCLIP.get_audio_features
            ).astype(jnp.float32))

        _text_fwd = lambda p, i, a: l2_normalize(m.apply(
            {"params": p}, i, a, method=TriCLIP.get_text_features
        ).astype(jnp.float32))
        if self.mesh is None:
            self._embed_image = jax.jit(_image_fwd)
            self._embed_text = jax.jit(_text_fwd)
            self._embed_audio = jax.jit(_audio_fwd)
        else:
            # params keep their (TP) shardings, rows split over 'data',
            # embeddings come back replicated (jit_kwargs)
            b = self._batch_in
            self._embed_image = jax.jit(_image_fwd, in_shardings=(p_shard, b),
                                        **jit_kwargs)
            self._embed_text = jax.jit(_text_fwd, in_shardings=(p_shard, b, b),
                                      **jit_kwargs)
            self._embed_audio = jax.jit(_audio_fwd, in_shardings=(p_shard, b),
                                        **jit_kwargs)

    def _pad(self, arr: np.ndarray):
        n = arr.shape[0]
        b = _bucket(n, self.max_batch, self.min_bucket)
        if n < b:
            pad = np.zeros((b - n, *arr.shape[1:]), arr.dtype)
            arr = np.concatenate([arr, pad])
        return arr, n

    def embed_text(self, texts: List[str]) -> np.ndarray:
        out, n = self._dispatch("text", texts)
        return np.asarray(out)[:n]

    def embed_image(self, images_uint8: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 -> (B, D); preprocessing fused on device."""
        out, n = self._dispatch("image", images_uint8)
        return np.asarray(out)[:n]

    def embed_audio(self, waves: np.ndarray) -> np.ndarray:
        """(B, N) @16 kHz -> (B, D); fbank fused on device. float32 in
        [-1, 1] or int16 PCM (preferred on thin links: half the transfer)."""
        out, n = self._dispatch("audio", waves)
        return np.asarray(out)[:n]

    def warmup(self, modalities=("text",), image_size=None, wave_len=16000):
        """Pre-compile every batch bucket for the given modalities so no
        request ever pays a compile. Buckets are powers of two capped at
        max_batch (see _bucket), so the cap itself is warmed even when it is
        not a power of two. One compiled program exists per RAW input shape:
        serve fixed-resolution images / fixed-length waves (or warm each
        deployment shape explicitly) — a new raw shape costs one XLA compile
        (tens of seconds on a cold TPU)."""
        b = 1
        while True:
            b = min(b, self.max_batch)
            if "text" in modalities:
                self.embed_text(["warmup"] * b)
            if "image" in modalities:
                size = image_size or self.cfg.vision.image_size
                self.embed_image(np.zeros((b, size, size, 3), np.uint8))
            if "audio" in modalities:
                self.embed_audio(np.zeros((b, wave_len), np.float32))
            if b >= self.max_batch:
                return
            b *= 2

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


class ReconstructionEngine:
    """Missing-modality reconstruction serving (stage-2 MMR models).

    Loads the stage-1 towers (checkpoint export) plus a trained MRL wrapper
    (``train.mmr`` artifact) and reconstructs the missing modality from the
    other two — the reference's ``inference_MMR``/``deploy`` story
    (reference main_MMR.py:176-210) packaged as a service. Raw-input
    preprocessing (image chain, fbank, tokenize) fuses into the jitted call
    exactly like EmbeddingEngine; the unused third tower is dead-code
    eliminated by XLA, so only the two present towers execute.
    """

    def __init__(self, mm: str, ckpt_dir: str = "synergy_ckpt",
                 mrl_root: str = "inference", is_base: bool = True,
                 is_captioned: bool = False, tiny: bool = False,
                 vocab_dir: Optional[str] = None, max_batch: int = 16,
                 dtype=jnp.bfloat16):
        from synergy_tpu.configs import ReconstructionConfig
        from synergy_tpu.train.mmr import (build_wrapper,
                                           frozen_tower_features, load_mrl,
                                           tiny_recon_config)

        if mm not in ("img", "txt", "aud"):
            raise ValueError(f"mm must be img/txt/aud, got {mm!r}")
        self.mm = mm
        self.recon_cfg = (tiny_recon_config() if tiny else
                          (ReconstructionConfig.base() if is_base
                           else ReconstructionConfig.large()))
        cfg = self.cfg = self.recon_cfg.clip
        self.tri = TriCLIP(cfg, dtype=dtype)
        self.tokenizer = get_tokenizer(vocab_dir)
        self.max_batch = max_batch
        self.text_length = self.recon_cfg.text_length

        tag = ckpt.size_tag(is_base, is_captioned)
        size = cfg.vision.image_size
        dummy = {
            "pixel_values": jnp.zeros((1, 3, size, size)),
            "input_ids": jnp.ones((1, self.text_length), jnp.int32),
            "attention_mask": jnp.ones((1, self.text_length), jnp.int32),
            "input_values": jnp.zeros((1, cfg.audio.max_length,
                                       cfg.audio.num_mel_bins)),
        }
        try:
            self.tri_params = ckpt.load_tri_clip_params(ckpt_dir, tag)
            self.loaded_from = f"{ckpt_dir}/{tag}"
        except (FileNotFoundError, OSError):
            self.tri_params = jax.jit(self.tri.init)(
                jax.random.PRNGKey(0), dummy["pixel_values"],
                dummy["input_ids"], dummy["attention_mask"],
                dummy["input_values"])["params"]
            self.loaded_from = "random-init"

        # wrapper in eval mode (txt: BatchNorm running stats)
        wrapper = build_wrapper(self.recon_cfg, mm, dtype)
        if mm == "txt":
            from synergy_tpu.models.mmr import ImgAud2Txt
            wrapper = ImgAud2Txt(self.recon_cfg, dtype, deterministic=True)
        feats = jax.jit(lambda p, b: frozen_tower_features(
            self.tri, p, b, mm))(self.tri_params, dummy)
        variables = jax.jit(wrapper.init)(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, *feats)
        w_params = variables["params"]
        w_stats = variables.get("batch_stats", {})
        mrl_base = f"{mrl_root}/{'base' if is_base else 'large'}_" \
                   f"{'caption' if is_captioned else 'prompt'}/{mm}"
        try:
            w_params, w_stats = load_mrl(mrl_base, w_params, w_stats)
            self.mrl_from = mrl_base
        except (FileNotFoundError, OSError):
            self.mrl_from = "random-init"
        self._w_vars = {"params": w_params, "batch_stats": dict(w_stats)}

        def _fwd(tri_p, w_vars, imgs_u8, ids, mask, waves):
            batch = {
                "pixel_values": _device_image_chain(imgs_u8, size),
                "input_ids": ids,
                "attention_mask": mask,
                "input_values": _device_fbank(waves, cfg),
            }
            f = frozen_tower_features(self.tri, tri_p, batch, mm)
            out = wrapper.apply(w_vars, *f)
            if mm == "txt":
                return jnp.argmax(out, axis=-1).astype(jnp.int32)
            return out.astype(jnp.float32)

        self._recon = jax.jit(_fwd)

    def _pad(self, arr: np.ndarray):
        n = arr.shape[0]
        b = _bucket(n, self.max_batch)
        if n < b:
            arr = np.concatenate(
                [arr, np.zeros((b - n, *arr.shape[1:]), arr.dtype)])
        return arr, n

    def reconstruct(self, images: Optional[np.ndarray] = None,
                    texts: Optional[List[str]] = None,
                    waves: Optional[np.ndarray] = None):
        """Reconstruct the missing modality. Supply the two present ones:
        mm='aud' needs images+texts, mm='img' texts+waves, mm='txt'
        images+waves. Returns float32 arrays (img NCHW in ~[0,1]; aud
        (B, 256, 64) log-mel) or decoded strings for mm='txt'."""
        need = {"aud": ("images", "texts"), "img": ("texts", "waves"),
                "txt": ("images", "waves")}[self.mm]
        given = {"images": images, "texts": texts, "waves": waves}
        missing = [k for k in need if given[k] is None]
        if missing:
            raise ValueError(f"mm={self.mm!r} requires {need}; missing "
                             f"{missing}")
        n = len(given[need[0]])
        if len(given[need[1]]) != n:
            raise ValueError("present modalities must have equal batch size")

        size = self.cfg.vision.image_size
        if images is None:
            images = np.zeros((n, size, size, 3), np.uint8)
        if waves is None:
            waves = np.zeros((n, 16000), np.float32)
        toks = (self.tokenizer(list(texts), max_length=self.text_length)
                if texts is not None else
                {"input_ids": np.ones((n, self.text_length), np.int32),
                 "attention_mask": np.ones((n, self.text_length), np.int32)})

        imgs, _ = self._pad(np.ascontiguousarray(images, dtype=np.uint8))
        wdtype = np.int16 if getattr(waves, "dtype", None) == np.int16 \
            else np.float32
        wv, _ = self._pad(np.ascontiguousarray(waves, dtype=wdtype))
        ids, _ = self._pad(toks["input_ids"])
        mask, _ = self._pad(toks["attention_mask"])
        out = np.asarray(self._recon(self.tri_params, self._w_vars,
                                     jnp.asarray(imgs), jnp.asarray(ids),
                                     jnp.asarray(mask), jnp.asarray(wv)))[:n]
        if self.mm == "txt":
            return [self.tokenizer.decode(row.tolist()) for row in out]
        return out


class MicroBatcher:
    """Dynamic request batching for the serving runtime.

    Coalesces concurrent embed requests of one modality into a single
    bucketed engine call — the classic production pattern for single-item
    request streams: one worker thread takes the first queued request, waits
    up to ``window_ms`` for more, concatenates up to ``engine.max_batch``
    rows, runs ONE jitted call, and fans the result rows back to the
    waiting requests. Under concurrent load this multiplies throughput by
    the achieved batch size for at most ``window_ms`` extra latency, and it
    serializes device calls (handler threads never contend for the chip).
    Requests only coalesce when compatible (same modality, same trailing
    array shape and dtype); an incompatible arrival flushes the open group.
    """

    def __init__(self, engine: "EmbeddingEngine", window_ms: float = 2.0):
        self.engine = engine
        self.window = window_ms / 1e3
        self.calls = 0          # engine calls issued (tests/observability)
        self.rows = 0           # total rows embedded through the batcher
        self._q: "queue.Queue" = queue.Queue()
        # two-stage pipeline: the collector thread coalesces requests and
        # DISPATCHES the device call without blocking on it (JAX dispatch is
        # async); the completer thread materializes results and fans them
        # out. Group i+1's window+transfer thus overlaps group i's compute —
        # a blocking single-thread batcher serializes on every device round
        # trip and loses to unbatched pipelined clients (measured).
        self._done_q: "queue.Queue" = queue.Queue(maxsize=4)
        self._t = threading.Thread(target=self._worker, daemon=True)
        self._c = threading.Thread(target=self._completer, daemon=True)
        self._t.start()
        self._c.start()

    @staticmethod
    def _key(modality: str, arr):
        if modality == "text":
            return ("text",)
        return (modality, arr.shape[1:], np.asarray(arr).dtype.str)

    def embed(self, modality: str, arr) -> np.ndarray:
        """Blocking: enqueue one request (list of texts / batched array) and
        wait for its slice of the coalesced result."""
        done = threading.Event()
        slot: Dict = {}
        self._q.put((self._key(modality, arr), modality, arr, len(arr),
                     done, slot))
        done.wait()
        if "err" in slot:
            raise slot["err"]
        return slot["out"]

    def close(self):
        self._q.put(None)
        self._t.join(timeout=5)
        self._c.join(timeout=5)

    def _worker(self):
        while True:
            first = self._q.get()
            if first is None:
                self._done_q.put(None)  # release the completer too
                return
            group, rows = [first], first[3]
            key = first[0]
            deadline = time.monotonic() + self.window
            stop = False
            while rows < self.engine.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    item = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if item is None:
                    stop = True
                    break
                if item[0] != key or rows + item[3] > self.engine.max_batch:
                    self._run(group)  # flush; start a fresh group
                    group, rows = [item], item[3]
                    key = item[0]
                    deadline = time.monotonic() + self.window
                else:
                    group.append(item)
                    rows += item[3]
            self._run(group)
            if stop:
                self._done_q.put(None)
                return

    def _run(self, group):
        """Coalesce + dispatch (async) and hand the in-flight result to the
        completer. Only dispatch errors (bad shapes) are raised here."""
        modality = group[0][1]
        try:
            if modality == "text":
                arr = [t for (_, _, texts, _, _, _) in group for t in texts]
            else:
                arr = np.concatenate([g[2] for g in group])
            out_dev, n = self.engine._dispatch(modality, arr)
            self.calls += 1
            self._done_q.put((group, out_dev, n))
        except Exception as e:
            for (_, _, _, _, done, slot) in group:
                slot["err"] = e
                done.set()

    def _completer(self):
        while True:
            item = self._done_q.get()
            if item is None:
                return
            group, out_dev, n = item
            try:
                out = np.asarray(out_dev)[:n]
                off = 0
                for (_, _, _, cnt, done, slot) in group:
                    slot["out"] = out[off:off + cnt]
                    self.rows += cnt
                    off += cnt
                    done.set()
            except Exception as e:  # async device error; server stays up
                for (_, _, _, _, done, slot) in group:
                    slot["err"] = e
                    done.set()


def _decode_array(payload: Dict, key: str, dtype) -> np.ndarray:
    raw = base64.b64decode(payload[key])
    return np.frombuffer(raw, dtype=dtype).reshape(payload["shape"]).copy()


class _Handler(BaseHTTPRequestHandler):
    engine: EmbeddingEngine = None  # set by serve()
    batcher: Optional[MicroBatcher] = None  # set by serve(batch_window_ms>0)
    recon_engines: Dict[str, ReconstructionEngine] = {}  # set by serve()

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
            elif self.path == "/reconstruct":
                self._send(200, self._reconstruct(payload))
            elif self.path == "/classify":
                self._send(200, self._classify(payload))
            elif self.path == "/similarity":
                texts = payload["texts"]
                txt = self.engine.embed_text(texts)
                if "image_b64" in payload:
                    other = self.engine.embed_image(
                        _decode_array(payload, "image_b64", np.uint8))
                    pair = "IT"
                    sim = self.engine.similarity(other, txt, pair)
                else:
                    # same wire contract as /embed and /reconstruct:
                    # "dtype": "int16" selects PCM (half the transfer bytes)
                    adtype = (np.int16 if payload.get("dtype") == "int16"
                              else np.float32)
                    other = self.engine.embed_audio(
                        _decode_array(payload, "audio_b64", adtype))
                    pair = "TA"
                    sim = self.engine.similarity(txt, other, pair).T
                self._send(200, {"similarity": sim.tolist(), "pair": pair})
            else:
                self._send(404, {"error": "unknown path"})
        except (KeyError, ValueError, json.JSONDecodeError) as e:
            self._send(400, {"error": f"{type(e).__name__}: {e}"})

    def _classify(self, payload: Dict) -> Dict:
        """Zero-shot classification as a service: the eval suite's fixed
        protocol (prompt template over the label set, similarity softmax —
        reference ZS_image_task.py:1455-1489 / ZS_audio_task.py:180-206)
        for one image or audio batch. Payload: {"labels": [...],
        "image_b64"+shape | "audio_b64"+shape [+"dtype": "int16"],
        optional "template", optional "top_k" (default 5)}."""
        from synergy_tpu.data.templates import ZS_AUDIO_PROMPT, ZS_IMAGE_PROMPT

        labels = payload["labels"]
        if not labels:
            raise ValueError("labels must be non-empty")
        top_k = min(int(payload.get("top_k", 5)), len(labels))
        if "image_b64" in payload:
            template = payload.get("template", ZS_IMAGE_PROMPT)
            other = self.engine.embed_image(
                _decode_array(payload, "image_b64", np.uint8))
            pair = "IT"
        else:
            template = payload.get("template", ZS_AUDIO_PROMPT)
            adtype = (np.int16 if payload.get("dtype") == "int16"
                      else np.float32)
            other = self.engine.embed_audio(
                _decode_array(payload, "audio_b64", adtype))
            pair = "TA"
        txt = self.engine.embed_text([template.format(l) for l in labels])
        sim = self.engine.similarity(other, txt, pair)  # (batch, labels)
        sim = sim - sim.max(axis=-1, keepdims=True)
        probs = np.exp(sim)
        probs /= probs.sum(axis=-1, keepdims=True)
        order = np.argsort(-probs, axis=-1)[:, :top_k]
        top = [[{"label": labels[j], "prob": float(probs[i, j])}
                for j in row] for i, row in enumerate(order)]
        return {"pair": pair, "probs": probs.tolist(), "top": top}

    def _embed(self, payload: Dict) -> np.ndarray:
        modality = payload.get("modality")
        if modality == "text":
            arr = payload["texts"]
        elif modality == "image":
            arr = _decode_array(payload, "image_b64", np.uint8)
        elif modality == "audio":
            dtype = np.int16 if payload.get("dtype") == "int16" else np.float32
            arr = _decode_array(payload, "audio_b64", dtype)
        else:
            raise ValueError(f"unknown modality {modality!r}")
        if self.batcher is not None:
            return self.batcher.embed(modality, arr)
        if modality == "text":
            return self.engine.embed_text(arr)
        if modality == "image":
            return self.engine.embed_image(arr)
        return self.engine.embed_audio(arr)

    def _reconstruct(self, payload: Dict) -> Dict:
        mm = payload.get("mm")
        eng = self.recon_engines.get(mm)
        if eng is None:
            raise ValueError(
                f"no reconstruction engine for mm={mm!r} (server started "
                f"with --recon_mm {','.join(self.recon_engines) or '<none>'})")
        images = (_decode_array(payload, "image_b64", np.uint8)
                  if "image_b64" in payload else None)
        waves = None
        if "audio_b64" in payload:
            dtype = np.int16 if payload.get("dtype") == "int16" else np.float32
            waves = _decode_array(payload, "audio_b64", dtype)
        out = eng.reconstruct(images=images, texts=payload.get("texts"),
                              waves=waves)
        if mm == "txt":
            return {"texts": out}
        arr = np.ascontiguousarray(out, np.float32)
        return {"recon_b64": base64.b64encode(arr.tobytes()).decode(),
                "shape": list(arr.shape), "dtype": "float32"}


def serve(engine: EmbeddingEngine, port: int = 8990, host: str = "127.0.0.1",
          batch_window_ms: float = 0.0,
          recon_engines: Optional[Dict[str, ReconstructionEngine]] = None):
    """``batch_window_ms > 0`` enables dynamic micro-batching of concurrent
    /embed requests (MicroBatcher); 0 keeps per-request engine calls. The
    batcher is exposed as ``server.batcher`` (shut down with server).
    ``recon_engines`` maps mm -> ReconstructionEngine for /reconstruct."""
    batcher = MicroBatcher(engine, batch_window_ms) if batch_window_ms > 0 \
        else None
    handler = type("Handler", (_Handler,),
                   {"engine": engine, "batcher": batcher,
                    "recon_engines": dict(recon_engines or {})})
    server = ThreadingHTTPServer((host, port), handler)
    server.batcher = batcher
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
    p.add_argument("--batch_window_ms", type=float, default=2.0,
                   help="coalesce concurrent /embed requests for up to this "
                        "long into one device call; 0 disables batching")
    p.add_argument("--warmup", type=str, default="text",
                   help="comma-separated modalities to pre-compile all batch "
                        "buckets for at startup ('' skips)")
    p.add_argument("--mesh_data", type=int, default=1,
                   help="data-parallel axis: request rows split over this "
                        "many devices (-1 = all remaining)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel axis: weights sharded over this "
                        "many devices (Large configs on small-HBM chips)")
    p.add_argument("--recon_mm", type=str, default="",
                   help="comma-separated modalities (img,txt,aud) to serve "
                        "/reconstruct for; needs trained MRL artifacts "
                        "under --mrl_root")
    p.add_argument("--mrl_root", type=str, default="inference")
    args = p.parse_args(argv)
    enable_compilation_cache()
    engine = EmbeddingEngine(args.ckpt_dir, args.IS_BASE, args.IS_CAPTIONED,
                             args.tiny, args.vocab_dir,
                             mesh_data=args.mesh_data,
                             mesh_model=args.mesh_model)
    if args.warmup:
        engine.warmup(tuple(m for m in args.warmup.split(",") if m))
    recon = {}
    for mm in (m for m in args.recon_mm.split(",") if m):
        recon[mm] = ReconstructionEngine(
            mm, args.ckpt_dir, args.mrl_root, args.IS_BASE,
            args.IS_CAPTIONED, args.tiny, args.vocab_dir)
        print(f"[serve] /reconstruct mm={mm}: towers={recon[mm].loaded_from} "
              f"wrapper={recon[mm].mrl_from}")
    server = serve(engine, args.port, args.host, args.batch_window_ms,
                   recon_engines=recon)
    print(f"[serve] checkpoint={engine.loaded_from} "
          f"listening on {args.host}:{args.port} "
          f"batch_window={args.batch_window_ms}ms")
    server.serve_forever()


if __name__ == "__main__":
    main()

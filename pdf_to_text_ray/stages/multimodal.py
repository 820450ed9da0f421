"""Multimodal columns: image / audio / video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The real decode libraries (PIL/OpenCV/ffmpeg) are not in this
container, so the DECODE step is pluggable: ``engine="stub"`` parses
the deterministic fixture container formats below; ``engine="real"``
raises ``NotImplementedError`` with the integration point documented.
Everything around the decode — schema, batch size, actor signature,
explode layout, broadcast of model state — is real Ray plumbing and is
what these stages exist to pin down (mirrors the reference's OCR-engine
stubbing precedent, core_document_processing.py:136-143).

Fixture container formats (all little-endian u32 unless noted):

    IMGSTUB1 | width | height | channels(u8) | seed      (image)
    AUDSTUB1 | sample_rate | n_samples | seed            (audio)
    VIDSTUB1 | fps | n_frames | width | height | seed    (video)

Payload "pixels"/"samples" are not materialized — the seed determines
them, so feature extraction is deterministic without carrying megabytes
through the fixtures.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

IMG_MAGIC = b"IMGSTUB1"
AUD_MAGIC = b"AUDSTUB1"
VID_MAGIC = b"VIDSTUB1"

EMBED_DIM = 64


# ------------------------------------------------------------ fixtures

def make_image(doc_id: int) -> bytes:
    w = 64 + (doc_id * 31) % 960
    h = 64 + (doc_id * 17) % 960
    c = 1 if doc_id % 7 == 0 else 3
    return IMG_MAGIC + struct.pack("<IIBI", w, h, c, doc_id % 2**31)


def make_audio(doc_id: int) -> bytes:
    sr = (8000, 16000, 44100)[doc_id % 3]
    n = 1000 + (doc_id * 997) % 160_000
    return AUD_MAGIC + struct.pack("<III", sr, n, doc_id % 2**31)


def make_video(doc_id: int) -> bytes:
    fps = (10, 24, 30)[doc_id % 3]
    frames = 10 + (doc_id * 13) % 290
    w = 320 + (doc_id % 4) * 160
    h = 240 + (doc_id % 3) * 120
    return VID_MAGIC + struct.pack("<IIIII", fps, frames, w, h, doc_id % 2**31)


# ------------------------------------------------------------- engines

class StubMediaEngine:
    """Deterministic decode of the fixture containers."""

    def decode_image(self, payload: bytes) -> dict | None:
        if not payload or not payload.startswith(IMG_MAGIC):
            return None
        w, h, c, seed = struct.unpack_from("<IIBI", payload, len(IMG_MAGIC))
        return {"width": w, "height": h, "channels": c, "seed": seed}

    def decode_audio(self, payload: bytes) -> dict | None:
        if not payload or not payload.startswith(AUD_MAGIC):
            return None
        sr, n, seed = struct.unpack_from("<III", payload, len(AUD_MAGIC))
        return {"sample_rate": sr, "n_samples": n, "seed": seed}

    def decode_video(self, payload: bytes) -> dict | None:
        if not payload or not payload.startswith(VID_MAGIC):
            return None
        fps, frames, w, h, seed = struct.unpack_from(
            "<IIIII", payload, len(VID_MAGIC)
        )
        return {
            "fps": fps, "n_frames": frames, "width": w, "height": h,
            "seed": seed,
        }


class RealMediaEngine:
    """Integration point for PIL/OpenCV/soundfile/ffmpeg decode."""

    def __getattr__(self, name):
        raise NotImplementedError(
            "Real media decoding (PIL/OpenCV/ffmpeg) is not available in "
            "this environment; plug a decoder into MediaStage(engine=...)"
        )


_ENGINES = {"stub": StubMediaEngine, "real": RealMediaEngine}


# -------------------------------------------------------- actor stages

class ImageDecoder:
    """Actor-pool stage: (doc_id, media:binary) ->
    (doc_id, width, height, channels, decode_ok). Engine built once per
    actor; use map_batches(ImageDecoder, concurrency=N, batch_size=B,
    batch_format="pyarrow")."""

    def __init__(self, engine: str = "stub"):
        self._engine = _ENGINES[engine]()

    def __call__(self, batch: pa.Table) -> pa.Table:
        W, H, C, ok = [], [], [], []
        for p in batch["media"].to_pylist():
            meta = self._engine.decode_image(p)
            if meta is None:
                W.append(0); H.append(0); C.append(0); ok.append(False)
            else:
                W.append(meta["width"]); H.append(meta["height"])
                C.append(meta["channels"]); ok.append(True)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(W, pa.int32()),
                "height": pa.array(H, pa.int32()),
                "channels": pa.array(C, pa.int32()),
                "decode_ok": pa.array(ok, pa.bool_()),
            }
        )


class ImageResizer:
    """Actor-pool stage: fit-within-box resize (aspect preserved,
    integer floor — the PIL ``thumbnail`` convention). Emits the resized
    container bytes plus new dims."""

    def __init__(self, max_w: int = 256, max_h: int = 256,
                 engine: str = "stub"):
        self._engine = _ENGINES[engine]()
        self._max_w = max_w
        self._max_h = max_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_w, out_h, payloads = [], [], []
        for p in batch["media"].to_pylist():
            meta = self._engine.decode_image(p)
            if meta is None:
                out_w.append(0); out_h.append(0); payloads.append(None)
                continue
            scale = min(
                1.0, self._max_w / meta["width"], self._max_h / meta["height"]
            )
            w = max(1, int(meta["width"] * scale))
            h = max(1, int(meta["height"] * scale))
            out_w.append(w)
            out_h.append(h)
            payloads.append(
                IMG_MAGIC
                + struct.pack("<IIBI", w, h, meta["channels"], meta["seed"])
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "resized_w": pa.array(out_w, pa.int32()),
                "resized_h": pa.array(out_h, pa.int32()),
                "media": pa.array(payloads, pa.binary()),
            }
        )


class MediaFeatureExtractor:
    """Actor-pool stage standing in for batched model inference: one
    deterministic EMBED_DIM float32 vector per payload (seeded from the
    container seed — a real deployment swaps in an ONNX/torch model and
    keeps the identical actor/batch shape)."""

    def __init__(self, dim: int = EMBED_DIM, engine: str = "stub"):
        self._engine = _ENGINES[engine]()
        self._dim = dim

    def _embed(self, seed: int, modality: bytes) -> np.ndarray:
        # md5-expanded (modality, seed) -> uniform floats in [-1, 1);
        # deterministic across platforms (no RandomState dtype concerns)
        out = np.empty(self._dim, dtype=np.float32)
        for i in range(0, self._dim, 4):
            h = hashlib.md5(modality + b":%d:%d" % (seed, i)).digest()
            for j in range(4):
                v = int.from_bytes(h[4 * j: 4 * j + 4], "little")
                out[i + j] = (v / 2**31) - 1.0
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = []
        for p in batch["media"].to_pylist():
            meta = (
                self._engine.decode_image(p)
                or self._engine.decode_audio(p)
                or self._engine.decode_video(p)
            )
            vecs.append(
                self._embed(meta["seed"], p[:8]).tolist() if meta else None
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Actor-pool explode stage: video row -> one row per sampled frame
    (every ``stride``-th frame). The pages-explode pattern applied to
    media: downstream per-frame stages (decode, feature) batch over
    frame rows, so one 2-hour video never monopolizes a task."""

    def __init__(self, stride: int = 10, engine: str = "stub"):
        self._engine = _ENGINES[engine]()
        self._stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, frame_nos, ts = [], [], []
        for did, p in zip(
            batch["doc_id"].to_pylist(), batch["media"].to_pylist()
        ):
            meta = self._engine.decode_video(p)
            if meta is None:
                continue
            for f in range(0, meta["n_frames"], self._stride):
                doc_ids.append(did)
                frame_nos.append(f)
                ts.append(f / meta["fps"])
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "frame_no": pa.array(frame_nos, pa.int32()),
                "ts_sec": pa.array(ts, pa.float64()),
            }
        )

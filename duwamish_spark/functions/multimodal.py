"""Multimodal columns: image/audio/video as opaque ``binary`` payloads.

Design (the 100 TB story): media bytes ride in a ``payload binary`` column
next to typed metadata; all decode / feature-extract / resize /
frame-sample operators are Arrow-batched ``mapInPandas`` kernels so the
bytes never round-trip through per-row Python, and the operators compose
with the rest of the engine (dedup on payload hash, ANN on media
embeddings) as ordinary DataFrames.

Codec reality in this container: the image/audio libraries (PIL,
torchvision, ffmpeg) are NOT installed, so the *codec* step is stubbed —
``decode_media`` parses the deterministic header written by
``synth_media`` (or raises ``NotImplementedError`` for real codecs via
``require_real_codecs=True``), while everything Spark-side — schema,
Arrow batch shape, partitioning, UDF signatures, explode semantics — is
real and tested.

Media payload layout produced by :func:`synth_media` (16-byte header +
body)::

    bytes 0-3   magic b"DWMM"
    bytes 4-7   width  (big-endian uint32; audio: sample_rate)
    bytes 8-11  height (big-endian uint32; audio/video: n_frames)
    bytes 12-15 kind tag (b"img\\0" / b"aud\\0" / b"vid\\0")
    bytes 16-   body (deterministic pseudo-pixels derived from the seed text)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"DWMM"
_KIND_TAG = {"image": b"img\x00", "audio": b"aud\x00", "video": b"vid\x00"}
_TAG_KIND = {v: k for k, v in _KIND_TAG.items()}

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "width int, height int, n_frames int"
)

_HAVE_PIL = False
try:  # pragma: no cover - not installed in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass


def _synth_payload(text: bytes, kind: str) -> bytes:
    """Deterministic fake media bytes seeded from ``text``."""
    h = hashlib.sha256(text).digest()
    width = 8 + h[0] % 24
    height = 8 + h[1] % 24
    n_frames = 1 if kind == "image" else 2 + h[2] % 6
    body_len = width * height if kind != "video" else width * height * n_frames
    # body = repeating digest, cheap and deterministic
    body = (h * (body_len // len(h) + 1))[:body_len]
    return (
        MAGIC
        + struct.pack(">II", width, height)
        + _KIND_TAG[kind]
        + body
    )


def synth_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from a document table.

    One media row per document; kind cycles image/audio/video by id hash.
    Vectorized ``mapInPandas`` (Arrow batches), no per-row Python UDF.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = np.array(["image", "audio", "video"])
        for pdf in batches:
            texts = pdf[text_col].astype(str)
            kind_idx = pd.util.hash_pandas_object(pdf[id_col].astype(str), index=False).to_numpy() % 3
            kind = kinds[kind_idx]
            payloads, widths, heights, frames = [], [], [], []
            for t, k in zip(texts.to_numpy(), kind):
                p = _synth_payload(t.encode("utf-8"), k)
                w, hgt = struct.unpack(">II", p[4:12])
                payloads.append(p)
                widths.append(w)
                heights.append(hgt)
                frames.append(1 if k == "image" else len(p[16:]) // max(w * hgt, 1))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "kind": kind,
                    "payload": payloads,
                    "width": np.asarray(widths, dtype=np.int32),
                    "height": np.asarray(heights, dtype=np.int32),
                    "n_frames": np.asarray(frames, dtype=np.int32),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(gen, MEDIA_SCHEMA)


FEATURES_SCHEMA = (
    "media_id string, kind string, n_bytes long, body_sha256 string, "
    "width int, height int, mean_byte double, std_byte double"
)


def decode_media(media: DataFrame, require_real_codecs: bool = False) -> DataFrame:
    """Decode payloads into per-media features (the "decode + feature
    extract" stage).

    With ``require_real_codecs=True`` this raises ``NotImplementedError``
    unless a real codec library is importable — the marked stub. The
    default path parses the :mod:`synth_media` header and computes body
    statistics vectorized with NumPy over Arrow batches.
    """
    if require_real_codecs and not _HAVE_PIL:
        raise NotImplementedError(
            "real image/audio codecs (PIL/ffmpeg) are not installed in this "
            "container; the Spark-side plumbing is real, the codec is stubbed"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload)
                if b[:4] != MAGIC:
                    rows.append((mid, kind, len(b), hashlib.sha256(b).hexdigest(),
                                 None, None, None, None))
                    continue
                w, hgt = struct.unpack(">II", b[4:12])
                body = np.frombuffer(b[16:], dtype=np.uint8)
                rows.append(
                    (
                        mid,
                        kind,
                        len(b),
                        hashlib.sha256(body).hexdigest(),
                        w,
                        hgt,
                        float(body.mean()) if body.size else 0.0,
                        float(body.std()) if body.size else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "body_sha256",
                    "width", "height", "mean_byte", "std_byte",
                ],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


def frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every k-th frame of video payloads into one row per frame.

    Output: ``(media_id, frame_index, frame binary)``. Non-video rows are
    dropped. At scale this is the fan-out stage before per-frame feature
    extraction — partitioning by ``media_id`` keeps a video's frames
    co-located.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            vids = pdf[pdf["kind"] == "video"]
            for mid, payload in zip(vids["media_id"], vids["payload"]):
                b = bytes(payload)
                if b[:4] != MAGIC:
                    continue
                w, hgt = struct.unpack(">II", b[4:12])
                fsize = max(w * hgt, 1)
                body = b[16:]
                n = len(body) // fsize
                for i in range(0, n, every_k):
                    out_id.append(mid)
                    out_idx.append(i)
                    out_frame.append(body[i * fsize:(i + 1) * fsize])
            yield pd.DataFrame(
                {"media_id": out_id, "frame_index": out_idx, "frame": out_frame}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, "media_id string, frame_index int, frame binary"
    )


def resize_media(media: DataFrame, max_side: int = 16) -> DataFrame:
    """Resize stub: recomputes target dimensions (aspect-preserving,
    clamped to ``max_side``) and subsamples the fake body accordingly.

    A real deployment would swap the body transform for PIL/libvips inside
    the same kernel — signature, schema, and batch shape are unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != MAGIC or kind != "image":
                    continue
                w, hgt = struct.unpack(">II", b[4:12])
                scale = max(w, hgt) / max_side
                nw, nh = (max(1, int(w / scale)), max(1, int(hgt / scale))) if scale > 1 else (w, hgt)
                body = np.frombuffer(b[16:16 + w * hgt], dtype=np.uint8)
                if body.size == w * hgt:
                    grid = body.reshape(hgt, w)
                    ys = np.linspace(0, hgt - 1, nh).astype(int)
                    xs = np.linspace(0, w - 1, nw).astype(int)
                    nb = grid[np.ix_(ys, xs)].tobytes()
                else:
                    nb = b[16:]
                rows.append(
                    (mid, MAGIC + struct.pack(">II", nw, nh) + _KIND_TAG["image"] + nb, nw, nh)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, "media_id string, payload binary, width int, height int"
    )


def embed_media(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake media embedding (sha-derived, unit-norm) —
    stands in for a model forward pass; output feeds the ANN operators
    (`functions.similarity`) unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = hashlib.sha256(bytes(payload)).digest()
                raw = np.frombuffer((h * (dim * 4 // len(h) + 1))[: dim * 4], dtype=np.uint32)
                v = (raw.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
                v /= np.linalg.norm(v) or 1.0
                ids.append(mid)
                vecs.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return media.select("media_id", "payload").mapInPandas(
        run, "media_id string, embedding array<float>"
    )

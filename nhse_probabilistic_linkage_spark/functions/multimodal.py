"""Multimodal (binary) column plumbing: typed metadata + batched decode UDFs.

The input contract already carries one opaque binary column (`html` —
BASELINE.json input_hint); a training-data pipeline at 100TB also carries
image/audio/video payloads. This module makes the Spark-side plumbing real —
schemas, Arrow batch shapes, mapInPandas signatures, partition sizing — while
the codec itself is swappable:

  * `probe_binary`   — native-only sniffing (magic bytes -> media_type,
    payload size) used for routing/partitioning before any Python decode;
  * `decode_media`   — mapInPandas operator with the real batched decode
    harness; the per-format decoder registry ships with a deterministic
    fake decoder (hash-derived dims/duration) because no image/audio codec
    libraries exist in this sandbox. Installing one means registering
    `register_decoder("image", fn)` — nothing else changes. `wav_decoder`
    below is a REAL example on the stdlib `wave` codec, exercised
    end-to-end in tests/test_multimodal.py.
  * `extract_features` — fixed-width feature vector per payload (here: a
    seeded hash-projection of the bytes — deterministic, shape-correct)
    demonstrating the binary -> array<float> path the similarity operators
    (operators/similarity.py) consume.

Scale notes: binary payloads dominate row width, so decode stages must run
AFTER filters/projections (Catalyst prunes the binary column until the UDF
actually needs it) and partitions should be sized by bytes not rows —
`repartition_by_bytes` below does a cheap native length() sum per partition
target. Arrow batches of whole payloads are capped by
spark.sql.execution.arrow.maxRecordsPerBatch (set in session.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_type string, width int, height int, duration_ms int, n_frames int, ok boolean, err string"
)

_MAGIC = [
    (b"\x89PNG", "image"),
    (b"\xff\xd8\xff", "image"),
    (b"GIF8", "image"),
    (b"BM", "image"),
    (b"RIFF", "audio"),
    (b"ID3", "audio"),
    (b"\x00\x00\x00", "video"),  # mp4 ftyp boxes
    (b"<htm", "html"),
    (b"<!do", "html"),
    (b"<HTM", "html"),
]


def probe_binary(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Native (no-Python) media sniffing: magic-byte prefix -> media_type,
    plus payload size. Stays in codegen, so it is safe to run over the full
    corpus as a routing/filter stage before any decode."""
    mt = F.lit("unknown")
    for magic, kind in reversed(_MAGIC):
        mt = F.when(
            F.substring(F.col(bin_col), 1, len(magic)) == F.lit(magic), F.lit(kind)
        ).otherwise(mt)
    return df.withColumn("media_type", mt).withColumn("payload_bytes", F.length(F.col(bin_col)))


# ---------------------------------------------------------------------------
# decoder registry — the sandbox has no codec libs, so the default decoder is
# a clearly-marked deterministic fake; swap in a real one via register_decoder
# ---------------------------------------------------------------------------
Decoder = Callable[[bytes], dict]
_DECODERS: dict[str, Decoder] = {}


def register_decoder(media_type: str, fn: Decoder) -> None:
    _DECODERS[media_type] = fn


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives plausible dims/duration from a
    content hash. NOT a real codec — real pipelines must register one; the
    Spark plumbing (batching, schema, error channel) is identical either way.
    """
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] * 8,
        "height": 64 + h[1] * 8,
        "duration_ms": int.from_bytes(h[2:4], "little") if len(payload) > 64 else 0,
        "n_frames": 1 + h[4] % 32,
    }


def wav_decoder(payload: bytes) -> dict:
    """A REAL decoder built on the stdlib `wave` codec — proof that the
    registry contract holds beyond the fake: register_decoder("audio",
    wav_decoder) and decode_media reports actual container properties for
    RIFF/WAVE payloads (and routes malformed ones to the (ok, err) error
    channel). Field mapping into the fixed MEDIA_SCHEMA: width = channel
    count, height = bits per sample (audio has no pixel dims), duration_ms
    and n_frames are the real values. Not registered by default — payload
    routing is by magic bytes only, and non-WAV RIFF/ID3 payloads belong to
    whatever codec the deployment actually installs."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        rate = w.getframerate()
        return {
            "width": w.getnchannels(),
            "height": w.getsampwidth() * 8,
            "duration_ms": int(n * 1000 / rate) if rate else 0,
            "n_frames": n,
        }


def bmp_decoder(payload: bytes) -> dict:
    """A REAL image decoder on pure stdlib struct parsing (BMP/DIB) — the
    registry's second real modality beside wav_decoder: width/height/bit
    depth come from the actual container header (both the legacy
    BITMAPCOREHEADER and the BITMAPINFOHEADER family), malformed payloads
    raise into decode_media's (ok, err) error channel. Field mapping into
    the fixed MEDIA_SCHEMA: width/height = real pixel dims (top-down BMPs
    store negative height — reported as abs), duration_ms = 0, n_frames = 1.
    Not registered by default, same policy as wav_decoder."""
    import struct

    if len(payload) < 26 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size == 12:  # BITMAPCOREHEADER (OS/2): 16-bit dims
        w, h = struct.unpack_from("<HH", payload, 18)
        bpp = struct.unpack_from("<H", payload, 24)[0]
    else:  # BITMAPINFOHEADER and successors: signed 32-bit dims
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
    if w <= 0 or h == 0 or bpp not in (1, 4, 8, 16, 24, 32):
        raise ValueError(f"bad BMP geometry: {w}x{h}@{bpp}bpp")
    return {"width": int(w), "height": abs(int(h)), "duration_ms": 0, "n_frames": 1}


def decode_media(
    df: DataFrame,
    bin_col: str = "payload",
    type_col: str = "media_type",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batched decode via mapInPandas: (id, media_type, payload) ->
    (id, media_type, width, height, duration_ms, n_frames, ok, err).

    Per-row failures land in the (ok, err) error channel instead of failing
    the task — at 10^12 rows some payloads are always corrupt, and a poison
    row must cost one row, not one stage retry.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, mt, payload in zip(pdf[id_col], pdf[type_col], pdf[bin_col]):
                try:
                    decoder = _DECODERS.get(mt, _fake_decode)
                    meta = decoder(bytes(payload) if payload is not None else b"")
                    rows.append(
                        (_id, mt, meta.get("width"), meta.get("height"),
                         meta.get("duration_ms"), meta.get("n_frames"), True, None)
                    )
                except Exception as e:  # error channel, never task failure
                    rows.append((_id, mt, None, None, None, None, False, str(e)[:200]))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "media_type", "width", "height", "duration_ms",
                         "n_frames", "ok", "err"],
            )

    return df.select(id_col, type_col, bin_col).mapInPandas(
        run, schema=f"{id_col} long, {MEDIA_SCHEMA}"
    )


def extract_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 32,
    seed: int = 42,
) -> DataFrame:
    """binary -> fixed-width array<float> feature vector (deterministic
    hash projection; a real embedding model slots into the same signature).
    Output feeds operators/similarity.py (cosine near-dup / ANN top-k)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.default_rng(seed)
        proj = rng.standard_normal((256, dim)).astype(np.float32)
        for pdf in batches:
            feats = []
            for payload in pdf[bin_col]:
                b = bytes(payload) if payload is not None else b""
                hist = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256).astype(
                    np.float32
                )
                norm = np.linalg.norm(hist)
                vec = (hist / norm) @ proj if norm > 0 else np.zeros(dim, dtype=np.float32)
                feats.append(vec)
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, bin_col).mapInPandas(run, schema=f"{id_col} long, features array<float>")


def repartition_by_bytes(df: DataFrame, bin_col: str, target_bytes: int = 128 << 20) -> DataFrame:
    """Partition a binary-heavy DataFrame by total payload bytes instead of
    row count (rows are wildly non-uniform in width). One cheap native agg
    decides the partition count."""
    total = df.agg(F.sum(F.length(F.col(bin_col)))).collect()[0][0] or 0
    n = max(1, int(total / target_bytes))
    return df.repartition(n)

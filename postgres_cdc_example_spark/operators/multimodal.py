"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata alongside — the
standard large-scale layout (payload bytes stay columnar in parquet, all
filtering happens on the metadata columns so scans prune without touching
blobs). Decode / feature-extraction run as Arrow-batched ``mapInPandas``
generators: one Python process per partition consuming record batches —
never per-row UDF calls — and the output schema is declared up front so
Catalyst can plan around the Python stage.

The actual media codecs (PIL / torchaudio / ffmpeg) are NOT in this
container, so the decode step is STUBBED: :func:`decode_image` /
:func:`decode_audio` raise ``NotImplementedError`` unless the library is
importable, and the pipeline queries use :func:`extract_features` /
:func:`sample_frames`, whose "decode" is a deterministic md5-based fake.
Everything Spark-side — schema, binary handling, Arrow batch shape,
partitioning — is real and oracle-checked (the fake features are pure
byte-hash arithmetic DuckDB reproduces).

No reference parity surface exists (the reference is CDC-only, SURVEY.md
§2.8); this is the multimodal extension required of a training-data engine.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 64  # fake "frame" size for the chunking path
FRAME_STRIDE = 4  # keep every 4th frame (temporal subsampling)

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, content_md5 string, "
    "fake_width int, fake_height int"
)
FRAME_SCHEMA = "doc_id long, frame_idx long, n_frame_bytes long, frame_md5 string"


def decode_image(payload: bytes) -> Any:
    """Real image decode — gated on the codec library being present."""
    try:
        from PIL import Image  # noqa: F401 — not installed in this container
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL; this environment stubs it — "
            "use extract_features() for the deterministic fake path"
        ) from exc
    import io

    from PIL import Image as _Image

    return _Image.open(io.BytesIO(payload))


def decode_audio(payload: bytes) -> Any:
    """Real audio decode — gated on the codec library being present."""
    try:
        import soundfile  # noqa: F401 — not installed in this container
    except ImportError as exc:
        raise NotImplementedError(
            "audio decode requires soundfile; this environment stubs it"
        ) from exc
    import io

    import soundfile as _sf

    return _sf.read(io.BytesIO(payload))


def with_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stand-in media ingest: utf-8 bytes of the text as the opaque payload
    plus typed metadata. (Real pipelines read the bytes from object storage;
    the column layout and everything downstream is identical.)"""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def _fake_dims(digest: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decoded width/height: md5-byte arithmetic
    (mirrored nibble-for-nibble in the DuckDB oracle)."""
    width = (digest[0] * 256 + digest[1]) % 1024
    height = (digest[2] * 256 + digest[3]) % 1024
    return width, height


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    ``mapInPandas``. The per-batch function is vectorized over the pandas
    batch; payload bytes never round-trip through the driver."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [hashlib.md5(p).digest() for p in pdf["payload"]]
            dims = [_fake_dims(d) for d in digests]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "content_md5": [d.hex() for d in digests],
                    "fake_width": [w for w, _ in dims],
                    "fake_height": [h for _, h in dims],
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, payload binary, n_bytes long, orig_bytes long, resized_md5 string"
)


def resize_payload(df: DataFrame, scale: float = 0.5) -> DataFrame:
    """Resize plumbing: binary IN → binary OUT through an Arrow-batched
    ``mapInPandas`` stage — the shape a real image-resize (decode → PIL
    thumbnail → re-encode) runs in at scale, where the transformed bytes
    continue down the pipeline columnar instead of detouring through the
    driver or a filesystem. Codec-less stand-in: keep the leading
    ``ceil(n_bytes × scale)`` bytes (deterministic, size-contracted like a
    real downscale); swap ``_shrink`` for the PIL path when the codec
    library exists (see :func:`decode_image`'s gating pattern)."""

    def _shrink(payload: bytes) -> bytes:
        return payload[: max(math.ceil(len(payload) * scale), 1)]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_shrink(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "n_bytes": [len(r) for r in resized],
                    "orig_bytes": [len(p) for p in pdf["payload"]],
                    "resized_md5": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return df.mapInPandas(_resize, schema=RESIZE_SCHEMA)


AHASH_SAMPLES = 64  # 8×8 luma grid → 64-bit average hash
AHASH_SCHEMA = "doc_id long, n_bytes long, phash_hi long, phash_lo long"
PHASH_BAND_BITS = 16  # 4 bands × 16 bits — pairs meet on a shared band
PHASH_MAX_HAMMING = 10


def _sample_luma(payload: bytes) -> list[int]:
    """Deterministic fake decode: 64 bytes sampled at evenly spaced offsets
    stand in for the 8×8 downscaled grayscale a real decoder would produce.
    The real path (:func:`average_hash_decoded`) feeds actual 8×8 luma into
    the same bit rule, so only this sampling step is codec-dependent."""
    n = len(payload)
    if n == 0:
        return [0] * AHASH_SAMPLES
    return [payload[(i * n) // AHASH_SAMPLES] for i in range(AHASH_SAMPLES)]


def _ahash(luma: list[int]) -> tuple[int, int]:
    """Average-hash bit rule: bit i = (64·luma_i > Σluma) — strictly above
    the mean, so a constant payload hashes to 0. Packed little-endian into
    two non-negative 32-bit halves (hi, lo): a single int64 would put bit 63
    in the sign position, which DuckDB BIGINT arithmetic rejects."""
    total = sum(luma)
    hi = lo = 0
    for i, l in enumerate(luma):
        if l * AHASH_SAMPLES > total:
            if i < 32:
                lo |= 1 << i
            else:
                hi |= 1 << (i - 32)
    return hi, lo


def average_hash(df: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) over binary payloads via Arrow-batched
    ``mapInPandas`` — the image near-dup fingerprint: 8×8-luma downsample →
    64-bit above-mean bit vector. Near-identical media differ in a few bits
    (compare by Hamming distance), unlike content md5 which flips entirely.
    Decode is the deterministic byte-sampling fake (:func:`_sample_luma`);
    swap in :func:`average_hash_decoded` where PIL exists — schema, batch
    shape and everything downstream are identical."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [_ahash(_sample_luma(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "phash_hi": [h for h, _ in hashes],
                    "phash_lo": [l for _, l in hashes],
                }
            )

    return df.mapInPandas(_hash, schema=AHASH_SCHEMA)


def average_hash_decoded(df: DataFrame) -> DataFrame:
    """Real-codec aHash: decode → grayscale → 8×8 resize → the same
    :func:`_ahash` bit rule. Gated on PIL like :func:`decode_image`."""
    try:
        from PIL import Image  # noqa: F401 — not installed in this container
    except ImportError as exc:
        raise NotImplementedError(
            "decoded average-hash requires PIL; use average_hash() for the "
            "deterministic byte-sampling path"
        ) from exc
    import io

    from PIL import Image as _Image

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                img = _Image.open(io.BytesIO(p)).convert("L").resize((8, 8))
                hashes.append(_ahash(list(img.getdata())))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "phash_hi": [h for h, _ in hashes],
                    "phash_lo": [l for _, l in hashes],
                }
            )

    return df.mapInPandas(_hash, schema=AHASH_SCHEMA)


def phash_neardup_pairs(
    hashed: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """Image near-dup pairs from an aHash table, SimHash-style banded: the
    64-bit hash splits into 4 × 16-bit bands; docs sharing ANY band become
    candidates (equi-join on ``(band_idx, band_val)`` — a pair at Hamming
    ≤ ``max_hamming`` ≤ 15 differs in ≤ 15 bits, which cannot touch all 4
    bands, so banding loses nothing up to that radius: recall is exact, not
    approximate). Verification = popcount of the XOR, pure codegen. The
    candidate join shuffles on the band key — doc×doc never materializes."""
    bands = hashed.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band_idx"),
                    F.col("phash_lo").bitwiseAND(F.lit(65535)).alias("band_val"),
                ),
                F.struct(
                    F.lit(1).alias("band_idx"),
                    F.shiftright("phash_lo", PHASH_BAND_BITS).alias("band_val"),
                ),
                F.struct(
                    F.lit(2).alias("band_idx"),
                    F.col("phash_hi").bitwiseAND(F.lit(65535)).alias("band_val"),
                ),
                F.struct(
                    F.lit(3).alias("band_idx"),
                    F.shiftright("phash_hi", PHASH_BAND_BITS).alias("band_val"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.band_idx", "b.band_val")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    pa = hashed.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash_hi").alias("hi_a"),
        F.col("phash_lo").alias("lo_a"),
    )
    pb = hashed.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash_hi").alias("hi_b"),
        F.col("phash_lo").alias("lo_b"),
    )
    hamming = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("long")
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling: chunk each payload into ``FRAME_BYTES`` frames, keep
    every ``FRAME_STRIDE``-th, one output row per kept frame — the
    row-exploding ``mapInPandas`` shape used for video decode at scale
    (input rows : output rows is 1:many, schema declared up front)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "n_frame_bytes": [],
                "frame_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(math.ceil(len(payload) / FRAME_BYTES), 1)
                for i in range(0, n_frames, FRAME_STRIDE):
                    chunk = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["n_frame_bytes"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(_frames, schema=FRAME_SCHEMA)

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

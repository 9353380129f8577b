"""Deterministic sampling + compression utilities for corpus curation.

**Hash-based sampling** replaces ``df.sample()`` for training-data work:
Bernoulli sampling is seed- and partitioning-dependent (a repartition
changes the sample), while hashing the *stable row key* gives a sample that
is reproducible across runs, engines, and cluster layouts — the property a
100 TB corpus snapshot needs for auditability. The rate is a lexicographic
threshold over the key's md5 hex prefix (2 hex chars → 1/256 granularity),
a pure per-row filter: no shuffle, pushdown-compatible, identical in any
engine with md5.

**Stratified rates** extend the same trick with a per-stratum threshold —
e.g. downsample crawl data, keep all curated sources.

**Int8 quantization** is the standard embedding-storage compression (4×
smaller, ~0.4% max error at dim 64): per-vector symmetric scale
``max|x|/127``, elementwise round. All column arithmetic — the scale is
materialized as a column BEFORE the per-element transform (see
operators/dedup.py on higher-order-function re-evaluation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column) -> Column:
    """2-hex-char md5 prefix of the key — 256 stable, uniform buckets."""
    return F.substring(F.md5(key.cast("string")), 1, 2)


def hash_sample(df: DataFrame, key_col: str, threshold: str = "1a") -> DataFrame:
    """Keep rows whose hash bucket sorts below ``threshold`` (hex prefix:
    '1a' → 26/256 ≈ 10.2%). Deterministic, partitioning-independent,
    engine-portable."""
    return df.filter(hash_bucket(F.col(key_col)) < threshold)


def stratified_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, str], default: str = "00"
) -> DataFrame:
    """Per-stratum hash thresholds (hex-prefix strings). ``default`` '00'
    drops unlisted strata; 'ff'-ish keeps nearly everything."""
    thr = F.lit(default)
    for stratum, t in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(t)).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col)) < thr)


HASH_SPACE = 4294967296  # 2^32 — the md5-prefix hash space


def keep_by_hash_ratio(df: DataFrame, key_col: str, ratio_micro_col: str) -> DataFrame:
    """Graded deterministic sampling: keep rows whose 32-bit md5 prefix of
    the stable key falls below ``ratio_micro/1e6`` of the hash space —
    generalizes :func:`hash_sample`'s 256-step hex-prefix thresholds to
    micro-resolution per-row ratios (the ratio can come from a joined
    column, e.g. a per-source temperature weight). The comparison is pure
    int64 arithmetic (``hash·1e6 < ratio_micro·2^32``, both ≤ 4.3e15), so
    it is exact, partition-independent, and bit-identical across engines."""
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return df.filter(h * F.lit(1_000_000) < F.col(ratio_micro_col) * F.lit(HASH_SPACE))


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization with reconstruction-error
    audit columns (worst-case abs error in nano units — integer output so
    oracles compare exactly)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    d = df.select(F.col(id_col), v.alias("v")).select(
        id_col,
        "v",
        (F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0)).alias("scale"),
    )
    q = F.transform(
        "v", lambda x: F.round(x / F.col("scale")).cast("int")
    )
    d = d.select(F.col(id_col), "v", "scale", q.alias("q"))
    err = F.array_max(
        F.zip_with("v", "q", lambda x, qi: F.abs(x - qi * F.col("scale")))
    )
    return d.select(
        F.col(id_col),
        F.floor(F.col("scale") * F.lit(1e9)).cast("long").alias("scale_nano"),
        F.element_at("q", 1).alias("q_first"),
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)).alias(
            "q_l1_norm"
        ),
        F.floor(err * F.lit(1e9)).cast("long").alias("max_abs_err_nano"),
    )


def quota_sample(
    df: DataFrame, key_col: str, stratum_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by hash rank —
    the balanced-dataset builder. Unlike rate-based sampling the quota is a
    COUNT, so small strata are kept whole while huge ones are capped; unlike
    ``rand()`` ordering the hash rank is reproducible across runs, engines,
    and partitionings. One window shuffle on the stratum; ties broken by the
    key itself so the cut is total-ordered."""
    w = Window.partitionBy(stratum_col).orderBy(
        hash_bucket_full(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def hash_bucket_full(key: Column) -> Column:
    """Full md5 hex of the key — a total hash order (vs the 2-char bucket
    used for rate sampling)."""
    return F.md5(key.cast("string"))

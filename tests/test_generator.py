"""S1 generator: deterministic under repartitioning, reference domains
(10 names, score 1..100, name_counter format, uuid shape)."""

from __future__ import annotations

import re

from postgres_cdc_example_spark.sources.generator import NAMES, person_batch
from postgres_cdc_example_spark.sources.snapshot import max_id_watermark, snapshot_copy

UUID_RE = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}$")


def test_generator_domains_and_format(spark):
    df = person_batch(spark, 200, seed=42)
    rows = df.collect()
    assert len(rows) == 200
    assert [f.name for f in df.schema.fields] == ["id", "name", "uid", "score", "created_at"]
    for r in rows:
        first, counter = r["name"].rsplit("_", 1)
        assert first in NAMES and int(counter) == r["id"]
        assert 1 <= r["score"] <= 100
        assert UUID_RE.match(r["uid"]), r["uid"]


def test_generator_partitioning_independent(spark):
    a = sorted(map(tuple, person_batch(spark, 100, seed=7, num_partitions=1).collect()))
    b = sorted(map(tuple, person_batch(spark, 100, seed=7, num_partitions=13).collect()))
    assert a == b


def test_generator_resumes_from_watermark(spark):
    first = person_batch(spark, 50, seed=1)
    m, nxt = max_id_watermark(first)
    assert (m, nxt) == (50, 51)
    second = person_batch(spark, 10, seed=1, start_id=nxt)
    ids = [r["id"] for r in second.orderBy("id").collect()]
    assert ids == list(range(51, 61))


def test_snapshot_copy_on_conflict_do_nothing(spark):
    target = person_batch(spark, 10, seed=1).withColumnRenamed  # noqa: B018
    target = person_batch(spark, 10, seed=1)
    # source overlaps ids 6..15 with DIFFERENT values (seed differs)
    source = person_batch(spark, 10, seed=2, start_id=6)
    merged = snapshot_copy(target, source)
    assert merged.count() == 15
    # overlapping ids keep the TARGET's rows (DO NOTHING semantics)
    tgt = {r["id"]: r["uid"] for r in target.collect()}
    got = {r["id"]: r["uid"] for r in merged.collect()}
    for i in range(1, 11):
        assert got[i] == tgt[i]


def test_empty_watermark_defaults_to_zero(spark):
    from postgres_cdc_example_spark.schemas import PERSON_SCHEMA

    empty = spark.createDataFrame([], PERSON_SCHEMA)
    assert max_id_watermark(empty) == (0, 1)

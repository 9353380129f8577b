"""load_table self-healing on sessions that lack the legacy-nanos conf.

The driver's harness builds a vanilla SparkSession (no session.py factory), so
`events.parquet` (INT64 TIMESTAMP(NANOS)) throws PARQUET_TYPE_ILLEGAL unless
`load_table` sets `spark.sql.legacy.parquet.nanosAsLong` itself and retries.
"""

from __future__ import annotations

from postgres_cdc_example_spark.sources.tables import load_table

CONF = "spark.sql.legacy.parquet.nanosAsLong"


def test_events_read_self_heals_without_nanos_conf(spark, sf_dir):
    prev = spark.conf.get(CONF, None)
    spark.conf.unset(CONF)
    try:
        df = load_table(spark, "events", sf_dir)
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
        assert df.count() > 0
        # the retry must have restored the conf so later reads also work
        assert spark.conf.get(CONF) == "true"
    finally:
        if prev is not None:
            spark.conf.set(CONF, prev)


def test_events_ts_microsecond_truncation_matches_duckdb(spark, sf_dir):
    import duckdb

    got = {
        r.event_id: r.ts
        for r in load_table(spark, "events", sf_dir)
        .select("event_id", "ts")
        .orderBy("event_id")
        .limit(50)
        .collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT event_id, CAST(ts AS TIMESTAMP) FROM '{sf_dir}/events.parquet' "
            "ORDER BY event_id LIMIT 50"
        ).fetchall()
    )
    assert got == want

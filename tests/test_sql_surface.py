"""SQL-surface parity: the reference's query surface IS SQL text shipped to
PostgreSQL (SURVEY.md intro). This engine accepts the same statements through
``spark.sql`` — each reference SELECT (adapted only in table/catalog names)
must run verbatim and agree with its DataFrame twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_cdc_example_spark.sources.generator import person_batch


@pytest.fixture(scope="module")
def person_view(spark):
    df = person_batch(spark, 200, seed=21)
    df.createOrReplaceTempView("person")
    return df


def test_snapshot_scan_sql(spark, person_view):
    # replicator/main.go:98-101
    got = spark.sql(
        "SELECT id, name, uid, score, created_at FROM person ORDER BY id"
    ).collect()
    want = person_view.select("id", "name", "uid", "score", "created_at").orderBy(
        "id"
    ).collect()
    assert got == want


def test_counts_sql(spark, person_view):
    # pubsub/main.go:159-169,186
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM person").collect()[0].n
        == person_view.count()
    )
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM person WHERE score % 2 = 0"
    ).collect()[0].n
    assert got == person_view.filter(F.col("score") % 2 == 0).count()


def test_max_coalesce_sql(spark, person_view):
    # replicator/main.go:144
    got = spark.sql("SELECT COALESCE(MAX(id), 0) AS max_id FROM person").collect()[0]
    want = person_view.agg(
        F.coalesce(F.max("id"), F.lit(0)).alias("max_id")
    ).collect()[0]
    assert got == want
    # and the empty-table branch actually exercises the COALESCE default
    spark.createDataFrame([], person_view.schema).createOrReplaceTempView("empty_person")
    assert (
        spark.sql("SELECT COALESCE(MAX(id), 0) AS max_id FROM empty_person")
        .collect()[0]
        .max_id
        == 0
    )


def test_exists_sql(spark, person_view):
    # replicator/main.go:73-74 (EXISTS over a catalog-like relation)
    got = spark.sql(
        "SELECT EXISTS (SELECT 1 FROM person WHERE name LIKE '%_1%') AS e"
    ).collect()[0].e
    assert got == (person_view.filter(F.col("name").like("%_1%")).count() > 0)


def test_limit_and_like_sql(spark, person_view):
    # pubsub/main.go:135-140; README.md:158
    assert len(spark.sql("SELECT * FROM person LIMIT 1").collect()) == 1
    got = spark.sql("SELECT count(*) AS n FROM person WHERE name LIKE 'a%'").collect()[0].n
    assert got == person_view.filter(F.col("name").like("a%")).count()


def test_create_table_if_not_exists_sql(spark, tmp_path):
    # writer/main.go:34-45 — DDL-first setup runs as literal Spark SQL
    spark.sql(f"CREATE DATABASE IF NOT EXISTS ddl_t LOCATION '{tmp_path}/wh'")
    try:
        spark.sql(
            """
            CREATE TABLE IF NOT EXISTS ddl_t.person_ddl (
                id BIGINT NOT NULL,
                name VARCHAR(100) NOT NULL,
                uid STRING NOT NULL,
                score INT NOT NULL,
                created_at TIMESTAMP_NTZ
            ) USING parquet
            """
        )
        # idempotent, like the reference's IF NOT EXISTS
        spark.sql(
            "CREATE TABLE IF NOT EXISTS ddl_t.person_ddl (id BIGINT) USING parquet"
        )
        cols = [f.name for f in spark.table("ddl_t.person_ddl").schema.fields]
        assert cols == ["id", "name", "uid", "score", "created_at"]
    finally:
        spark.sql("DROP DATABASE IF EXISTS ddl_t CASCADE")

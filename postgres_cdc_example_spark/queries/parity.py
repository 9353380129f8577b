"""Parity queries — the reference's SQL surface re-expressed Spark-first.

Each query cites the reference behavior it reproduces (SURVEY.md §2 row ids).
Fixture role mapping (FIXTURES.md §B): `orders`/`customer` play the keyed
state table, `events` plays the change stream, integer-modulo predicates play
the publication row filter ``score % 2 = 0`` (``pubsub/main.go:79``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgres_cdc_example_spark.queries import register
from postgres_cdc_example_spark.sources.tables import load_table


# --- flagship: the pubsub monitor invariant (S8/P4/A1/A2/W3/T6) -------------
@register(
    "monitor_sync_check",
    oracle="""
    WITH source AS (SELECT * FROM orders),
         target AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0)
    SELECT
        (SELECT count(*) FROM source) AS source_count,
        (SELECT count(*) FROM target) AS target_count,
        (SELECT count(*) FROM source WHERE o_orderkey % 2 = 0) AS source_filtered_count,
        CAST((SELECT count(*) FROM target)
             = (SELECT count(*) FROM source WHERE o_orderkey % 2 = 0) AS INT) AS in_sync,
        CASE WHEN (SELECT count(*) FROM target)
                  = (SELECT count(*) FROM source WHERE o_orderkey % 2 = 0)
             THEN 'in sync' ELSE 'syncing' END AS status
    """,
)
def monitor_sync_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered-replication sync verdict: ``target == σ(even)(source)``.

    Reference: publication row filter ``WHERE (score % 2 = 0)``
    (``pubsub/main.go:79``) + monitor count-compare loop
    (``pubsub/main.go:159-198``).  The replica is the filter itself, so the
    invariant holds by construction — exactly the eventual state the
    reference's monitor waits for.
    """
    source = load_table(spark, "orders", sf_dir)
    even = F.col("o_orderkey") % 2 == 0
    target = source.filter(even)  # the "publication" — Catalyst pushes to scan
    counts = source.agg(
        F.count(F.lit(1)).alias("source_count"),
        F.count_if(even).alias("source_filtered_count"),
    )
    tcount = target.agg(F.count(F.lit(1)).alias("target_count"))
    return counts.crossJoin(tcount).select(
        "source_count",
        "target_count",
        "source_filtered_count",
        (F.col("target_count") == F.col("source_filtered_count"))
        .cast("int")
        .alias("in_sync"),
        F.when(
            F.col("target_count") == F.col("source_filtered_count"), F.lit("in sync")
        )
        .otherwise(F.lit("syncing"))
        .alias("status"),
    )


# --- S3/P1/W1: snapshot scan -------------------------------------------------
@register(
    "snapshot_scan",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer ORDER BY c_custkey
    """,
)
def snapshot_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered full snapshot: ``SELECT id,name,uid,score,created_at FROM
    person ORDER BY id`` (``replicator/main.go:98-101``)."""
    return (
        load_table(spark, "customer", sf_dir)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    )


# --- A1: COUNT(*) ------------------------------------------------------------
@register("count_total", oracle="SELECT count(*) AS n FROM orders")
def count_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT COUNT(*) FROM person`` (``pubsub/main.go:159-169``)."""
    return load_table(spark, "orders", sf_dir).agg(F.count(F.lit(1)).alias("n"))


# --- A2/P4/F5: filtered COUNT under the modulo row filter --------------------
@register(
    "count_filtered",
    oracle="SELECT count(*) AS n_even FROM orders WHERE o_orderkey % 2 = 0",
)
def count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT COUNT(*) FROM person WHERE score %% 2 = 0``
    (``pubsub/main.go:186``)."""
    return (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") % 2 == 0)
        .agg(F.count(F.lit(1)).alias("n_even"))
    )


# --- A3/S11/F6: MAX watermark with null default -------------------------------
@register(
    "max_id_watermark",
    oracle="""
    SELECT COALESCE(MAX(o_orderkey), 0) AS max_id,
           COALESCE(MAX(o_orderkey), 0) + 1 AS next_id
    FROM orders
    """,
)
def max_id_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT COALESCE(MAX(id), 0) FROM person`` then sequence restart at
    max+1 (``replicator/main.go:142-150``)."""
    m = F.coalesce(F.max("o_orderkey"), F.lit(0))
    return load_table(spark, "orders", sf_dir).agg(
        m.alias("max_id"), (m + 1).alias("next_id")
    )


# --- A5: EXISTS --------------------------------------------------------------
@register(
    "slot_exists",
    oracle="""
    SELECT CAST(count(*) > 0 AS INT) AS slot_exists
    FROM (SELECT 1 FROM nation WHERE n_name = 'JAPAN' LIMIT 1)
    """,
)
def slot_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT EXISTS (SELECT 1 FROM pg_replication_slots WHERE
    slot_name=$1)`` (``replicator/main.go:73-74``) — catalog lookup as a
    boolean aggregate."""
    n = (
        load_table(spark, "nation", sf_dir)
        .filter(F.col("n_name") == "JAPAN")
        .limit(1)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return n.select((F.col("c") > 0).cast("int").alias("slot_exists"))


# --- P6/W2: catalog lookup with LIMIT ----------------------------------------
@register(
    "catalog_lookup_limit",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_regionkey = 1 ORDER BY n_nationkey LIMIT 1
    """,
)
def catalog_lookup_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT … FROM pg_subscription WHERE subname=… LIMIT 1``
    (``pubsub/main.go:135-140``); ordered for determinism."""
    return (
        load_table(spark, "nation", sf_dir)
        .filter(F.col("n_regionkey") == 1)
        .orderBy("n_nationkey")
        .limit(1)
        .select("n_nationkey", "n_name")
    )


# --- P2/P3: table filter + action dispatch ------------------------------------
@register(
    "action_dispatch_counts",
    oracle="""
    SELECT event_type AS action, count(*) AS n, count(DISTINCT user_id) AS n_users
    FROM events WHERE event_type <> 'view' GROUP BY event_type
    """,
)
def action_dispatch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-name filter (``replicator/main.go:191-193``) + per-action routing
    (``switch change.Action``, ``replicator/main.go:195-269``) as a set-wise
    groupBy instead of a per-event switch."""
    return (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type") != "view")  # the early skip-filter
        .groupBy(F.col("event_type").alias("action"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# --- P7/F11: JSON decode of the event payload ---------------------------------
@register(
    "json_payload_decode",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           event_type
    FROM events
    """,
)
def json_payload_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wal2json payload decode (``json.Unmarshal``,
    ``replicator/main.go:183-188``; columns→map pivot
    ``replicator/main.go:198-201``) via JSON-path extraction — schema
    declared, never inferred."""
    return load_table(spark, "events", sf_dir).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        "event_type",
    )


# --- J2: insert-if-absent (anti-join on PK) ------------------------------------
@register(
    "insert_if_absent",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
    )
    ORDER BY c_custkey
    """,
)
def insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot copy's ``INSERT … ON CONFLICT (id) DO NOTHING``
    (``replicator/main.go:118-122``) = left-anti join on the key.  The
    "existing" side is restricted to high-value orders so the anti-join is
    non-empty at every SF (a 0-row result would be a vacuous oracle check)."""
    customer = load_table(spark, "customer", sf_dir)
    existing = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        customer.join(existing, "c_custkey", "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --- J4: keyed delete (anti-join) ----------------------------------------------
@register(
    "keyed_delete",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM events e
        WHERE e.event_type = 'error' AND e.event_id % 120 = o.o_orderkey
    )
    """,
)
def keyed_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DELETE FROM person WHERE id=$1`` with the key from ``identity``
    (``replicator/main.go:252-268``) — set-wise: state LEFT ANTI deletes."""
    orders = load_table(spark, "orders", sf_dir)
    deletes = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type") == "error")
        .select((F.col("event_id") % 120).alias("o_orderkey"))
        .distinct()
    )
    return orders.join(F.broadcast(deletes), "o_orderkey", "left_anti").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


# --- J1: upsert / MERGE --------------------------------------------------------
@register(
    "upsert_merge",
    oracle="""
    WITH updates AS (
        SELECT user_id AS id, round(sum(value), 4) AS new_bal
        FROM events GROUP BY user_id
    )
    SELECT COALESCE(u.id, c.c_custkey) AS id,
           COALESCE(c.c_name, 'new_' || CAST(u.id AS VARCHAR)) AS name,
           round(CASE WHEN u.id IS NOT NULL THEN u.new_bal ELSE c.c_acctbal END, 4)
               AS acctbal
    FROM customer c FULL OUTER JOIN updates u ON c.c_custkey = u.id
    """,
)
def upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INSERT … ON CONFLICT (id) DO UPDATE SET …``
    (``replicator/main.go:204-217``) as a full-outer MERGE: matched rows take
    the update image, unmatched updates become inserts."""
    customer = load_table(spark, "customer", sf_dir)
    updates = (
        load_table(spark, "events", sf_dir)
        .groupBy(F.col("user_id").alias("id"))
        .agg(F.round(F.sum("value"), 4).alias("new_bal"))
    )
    merged = customer.join(
        updates, customer["c_custkey"] == updates["id"], "full_outer"
    )
    return merged.select(
        F.coalesce(updates["id"], customer["c_custkey"]).alias("id"),
        F.coalesce(
            customer["c_name"], F.concat(F.lit("new_"), updates["id"].cast("string"))
        ).alias("name"),
        F.round(
            F.when(updates["id"].isNotNull(), updates["new_bal"]).otherwise(
                customer["c_acctbal"]
            ),
            4,
        ).alias("acctbal"),
    )


# --- F2/F5/F6/F10/F12: scalar expression suite ---------------------------------
@register(
    "scalar_functions",
    oracle="""
    SELECT c_custkey AS id,
           c_name || '_' || CAST(c_custkey AS VARCHAR) AS tagged_name,
           CAST(c_custkey % 2 = 0 AS INT) AS is_even,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment,
           CAST(c_nationkey AS VARCHAR) AS nation_text,
           CAST(c_name LIKE '%1%' AS INT) AS has_one
    FROM customer
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar surface F2 (concat+format, ``writer/main.go:59``), F5 (modulo,
    ``pubsub/main.go:79``), F6 (COALESCE, ``replicator/main.go:144``),
    F10 (cast, ``replicator/main.go:160``), F12 (LIKE, ``README.md:158``)."""
    return load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("id"),
        F.concat_ws("_", F.col("c_name"), F.col("c_custkey").cast("string")).alias(
            "tagged_name"
        ),
        (F.col("c_custkey") % 2 == 0).cast("int").alias("is_even"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("segment"),
        F.col("c_nationkey").cast("string").alias("nation_text"),
        F.col("c_name").like("%1%").cast("int").alias("has_one"),
    )


# --- F7/F8/F9: time functions ---------------------------------------------------
@register(
    "time_functions",
    oracle="""
    SELECT o_orderkey AS id,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
           CAST(floor(epoch(TIMESTAMP '2000-01-01 00:00:00'))
                - floor(epoch(o_orderdate)) AS BIGINT) AS age_s
    FROM orders
    """,
)
def time_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 time formatting (``replicator/main.go:172``), F8 epoch diff
    (``pubsub/main.go:202-204``), F10 casts."""
    orders = load_table(spark, "orders", sf_dir)
    epoch_s = F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    ref = F.unix_timestamp(F.lit("2000-01-01 00:00:00"), "yyyy-MM-dd HH:mm:ss")
    return orders.select(
        F.col("o_orderkey").alias("id"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        epoch_s.alias("epoch_s"),
        (ref - epoch_s).alias("age_s"),
    )


# --- F8/T6: replication lag -------------------------------------------------------
@register(
    "replication_lag",
    oracle="""
    SELECT CAST(floor(epoch(TIMESTAMP '2024-03-01 00:00:00'))
                - floor(epoch(max(ts))) AS BIGINT) AS lag_seconds
    FROM events
    """,
)
def replication_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``EXTRACT(EPOCH FROM (now() - pg_last_xact_replay_timestamp()))::int``
    (``pubsub/main.go:202-204``), with a fixed reference instant instead of
    ``now()`` so the oracle is deterministic."""
    events = load_table(spark, "events", sf_dir)
    ref = F.unix_timestamp(F.lit("2024-03-01 00:00:00"), "yyyy-MM-dd HH:mm:ss")
    return events.agg(
        (ref - F.unix_timestamp(F.max("ts").cast("timestamp"))).alias("lag_seconds")
    )

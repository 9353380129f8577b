"""Declared StructTypes — schema-first, mirroring the reference's DDL-first
approach (``writer/main.go:34-41``; wal2json structs ``replicator/main.go:23-37``).

The reference never infers schema (``json.Unmarshal`` into declared Go
structs); we likewise decode change events with ``from_json`` + an explicit
schema and keep a corrupt-record column for malformed lines
(reference skip-and-log at ``replicator/main.go:183-188``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# --- person: the state table (CREATE TABLE at writer/main.go:34-41) ---------
# SERIAL -> long (scale headroom), UUID -> canonical text, TIMESTAMP (no tz)
# -> TimestampNTZ.  See SURVEY.md §1.2 for the full mapping rationale.
PERSON_SCHEMA = StructType(
    [
        StructField("id", LongType(), nullable=False),
        StructField("name", StringType(), nullable=False),
        StructField("uid", StringType(), nullable=False),
        StructField("score", IntegerType(), nullable=False),
        StructField("created_at", TimestampNTZType(), nullable=True),
    ]
)

# --- wal2json v2 change event (replicator/main.go:23-37) --------------------
# One JSON object per line; `columns` = new row image (I/U), `identity` = old
# key image (U/D).  Values arrive as strings ("dynamic" typing in transit).
WAL2JSON_COLUMN_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("type", StringType()),
        StructField("value", StringType()),
    ]
)

CHANGE_EVENT_SCHEMA = StructType(
    [
        StructField("action", StringType(), nullable=False),  # "I" | "U" | "D"
        StructField("timestamp", StringType(), nullable=True),
        StructField("schema", StringType(), nullable=True),
        StructField("table", StringType(), nullable=True),
        StructField("columns", ArrayType(WAL2JSON_COLUMN_SCHEMA), nullable=True),
        StructField("identity", ArrayType(WAL2JSON_COLUMN_SCHEMA), nullable=True),
    ]
)

# Flattened change-log schema used by the batch apply core and tests
# (FIXTURES.md §A2): a total-order `seq` stands in for the WAL LSN.
FLAT_CHANGE_SCHEMA = StructType(
    [
        StructField("seq", LongType(), nullable=False),
        StructField("action", StringType(), nullable=False),
        StructField("id", LongType(), nullable=False),
        StructField("name", StringType(), nullable=True),
        StructField("uid", StringType(), nullable=True),
        StructField("score", IntegerType(), nullable=True),
        StructField("created_at", TimestampNTZType(), nullable=True),
    ]
)

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

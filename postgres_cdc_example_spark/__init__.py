"""postgres_cdc_example_spark — a PySpark-native engine with the query and
data-processing capabilities of ``juliaogris/postgres-cdc-example``.

The reference is a Go + PostgreSQL CDC pipeline (writer → replicator/pubsub →
target DB).  This package re-expresses the same semantics Spark-first:

- the *state table* is a batch DataFrame (or a streaming sink materialization),
- the *change stream* is a (streaming) DataFrame of wal2json-v2-shaped events,
- per-event imperative apply (reference ``replicator/main.go:175-270``) becomes
  set-wise compaction (window last-write-wins) + MERGE-style state recompute,
- the publication row filter (reference ``pubsub/main.go:79``) becomes a plain
  ``filter`` that Catalyst pushes into the source scan.

Beyond parity, :mod:`.operators` adds large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

from postgres_cdc_example_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

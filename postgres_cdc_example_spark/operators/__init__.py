from postgres_cdc_example_spark.operators.cdc_apply import apply_changes, compact_changes

__all__ = ["apply_changes", "compact_changes"]

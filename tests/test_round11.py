"""Round-11 fixes and operators: the chi2 heatmap positive control (r10
ADVICE high), the forward-asof duplicate-timestamp determinism control
(r10 ADVICE low), and planted fixtures for the round's new operators."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

import postgres_cdc_example_spark.queries as q
from postgres_cdc_example_spark.queries import REGISTRY

q.queries()  # populate REGISTRY


def _stage_single_parquet(spark_df, tmp_path, mini, table, stage_name):
    stage = str(tmp_path / stage_name)
    spark_df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    os.replace(os.path.join(stage, part), mini / f"{table}.parquet")


def _mini(sf_dir, tmp_path, name):
    mini = tmp_path / name
    mini.mkdir()
    for fname in os.listdir(sf_dir):
        shutil.copy(os.path.join(sf_dir, fname), mini / fname)
    return mini


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def test_heatmap_chi2_rejects_planted_hotspot(spark, sf_dir, tmp_path):
    """POSITIVE control for the r10 ADVICE high (the per-cell floor +
    double /n scaling bounded chi2_micro below the critical value, so
    reject_uniform could NEVER fire): a complete 168-cell grid with 5
    events per cell plus 2000 extra on one cell must reject uniformity;
    the exactly-uniform grid must not (chi2 == 0). Both engines agree on
    both planted corpora."""
    from tests.oracle_utils import compare_to_oracle

    e = REGISTRY["event_hour_dow_heatmap"]
    # 2024-03-04 is a Monday: days 4..10 cover ISO dow 1..7
    for planted, name in ((True, "sf_hot"), (False, "sf_uni")):
        mini = _mini(sf_dir, tmp_path, name)
        rows, eid = [], 0
        for day in range(4, 11):
            for hr in range(24):
                n = 5 + (2000 if planted and day == 5 and hr == 3 else 0)
                for _ in range(n):
                    eid += 1
                    rows.append(
                        (eid, f"2024-03-{day:02d} {hr:02d}:30:00", 1, "view",
                         1.0, "{}")
                    )
        _stage_single_parquet(
            _events_df(spark, rows), tmp_path, mini, "events", name + "_st"
        )
        compare_to_oracle(spark, str(mini), e.fn, e.oracle)
        got = e.fn(spark, str(mini)).collect()
        assert len(got) == 168
        verdicts = {r.reject_uniform for r in got}
        chi2 = got[0].chi2_micro
        if planted:
            assert verdicts == {1}, f"planted hotspot must reject (chi2={chi2})"
            # Tuesday 03:00 carries ~70% of all traffic
            hot = next(r for r in got if r.dow == 2 and r.hr == 3)
            assert hot.n_events == 2005 and hot.intensity_micro > 50_000_000
        else:
            assert verdicts == {0}, f"uniform grid must not reject (chi2={chi2})"
            assert chi2 == 0  # exactly uniform: every c*k == n


def test_forward_asof_duplicate_ts_purchases_deterministic(
    spark, sf_dir, tmp_path
):
    """r10 ADVICE low: purchases sharing (user_id, ts) made the DuckDB
    ASOF oracle nondeterministic while the engine always keeps min
    event_id. Plant exact-timestamp duplicate purchases with DIFFERENT
    values and assert both engines now agree, and that the matched value
    is the min-event_id purchase's."""
    from tests.oracle_utils import compare_to_oracle

    mini = _mini(sf_dir, tmp_path, "sf_asof_dup")
    rows = [
        # user 1: error at 10:00; THREE purchases at the identical 11:00
        (100, "2024-03-01 10:00:00", 1, "error", 1.0, "{}"),
        (103, "2024-03-01 11:00:00", 1, "purchase", 333.0, "{}"),
        (101, "2024-03-01 11:00:00", 1, "purchase", 111.0, "{}"),
        (102, "2024-03-01 11:00:00", 1, "purchase", 222.0, "{}"),
        # user 2: duplicates at the error's OWN timestamp (<= bound)
        (200, "2024-03-02 09:00:00", 2, "error", 1.0, "{}"),
        (202, "2024-03-02 09:00:00", 2, "purchase", 77.0, "{}"),
        (201, "2024-03-02 09:00:00", 2, "purchase", 55.0, "{}"),
        # user 3: no purchase after the error (left-join NULL arm)
        (300, "2024-03-03 12:00:00", 3, "error", 1.0, "{}"),
        (301, "2024-03-03 11:00:00", 3, "purchase", 9.0, "{}"),
    ]
    _stage_single_parquet(
        _events_df(spark, rows), tmp_path, mini, "events", "asof_dup_st"
    )
    e = REGISTRY["purchase_asof_after_error"]
    compare_to_oracle(spark, str(mini), e.fn, e.oracle)
    got = {r.event_id: r for r in e.fn(spark, str(mini)).collect()}
    assert got[100].purchase_value == 111.0  # min event_id among ties
    assert got[100].recovery_us == 3_600_000_000
    assert got[200].purchase_value == 55.0 and got[200].recovery_us == 0
    assert got[300].purchase_ts is None and got[300].recovery_us is None


def test_oph_calibration_operating_point_consistency(spark, sf_dir):
    """The calibration table's threshold accounting must agree with the
    production `dedup_minhash_oph` output on the same corpus: the admitted
    ∧ true count across levels equals the pair query's row count (that
    query IS adaptive-threshold + exact-J >= 0.5), and the per-level
    counters nest (admitted_true <= min(admitted, true) <= n_pairs)."""
    rows = REGISTRY["dedup_oph_calibration"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_admitted <= r.n_pairs
        assert 0 <= r.n_true <= r.n_pairs
        assert r.n_admitted_true <= min(r.n_admitted, r.n_true)
        assert 0 <= r.min_jac_micro <= r.mean_jac_micro <= r.max_jac_micro
        assert r.mean_predicted_micro >= 0
    n_production = REGISTRY["dedup_minhash_oph"].fn(spark, sf_dir).count()
    assert sum(r.n_admitted_true for r in rows) == n_production
    # the curve must include sub-threshold noise the pair query never shows
    assert any(r.n_admitted == 0 and r.n_pairs > 0 for r in rows)

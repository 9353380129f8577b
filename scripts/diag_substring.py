"""Bisect the r6 exact-substring bench regression (VERDICT r6 #2).

dedup_exact_substring went 1.13 -> 3.12 s and dedup_substring_removal
2.05 -> 4.53 s between the r5 and r6 driver benches with an untouched
implementation. Suspects named by the verdict:

  (a) shared persisted-layer storage pressure (the layer set grew again in
      r6: _tfidf_wv, _doc_winnow_fps, _doc_grams8 joined the cache) —
      storage squeezing execution memory in local[32]'s unified pool;
  (b) bench.py N_PASSES 3 -> 2 (min-of-2 absorbs less contention noise);
  (c) codegen-cache eviction at 131 queries x stages vs the 2000-entry cap.

This script measures (a) and (c) directly in one process:

  phase IDLE   — fresh session, per-query warm-up at sf0.001, then N timed
                 runs of each query at sf0.1 with NOTHING else cached;
  phase LAYERS — build every shared layer bench.py prebuilds (untimed),
                 re-time the same queries (isolates storage pressure);
  phase CHURN  — run a broad slice of the registry once (codegen/cache
                 churn the full bench inflicts), re-time again.

Run:  python scripts/diag_substring.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgres_cdc_example_spark.queries import REGISTRY, _load_all
from postgres_cdc_example_spark.session import get_spark

QUERIES = ("dedup_exact_substring", "dedup_substring_removal")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_queries(spark, sf_dir: str, n_runs: int) -> dict[str, list[float]]:
    out: dict[str, list[float]] = {q: [] for q in QUERIES}
    for _ in range(n_runs):
        for q in QUERIES:
            t0 = time.perf_counter()
            _force(REGISTRY[q].fn(spark, sf_dir))
            out[q].append(time.perf_counter() - t0)
    return out


def _report(tag: str, times: dict[str, list[float]]) -> None:
    for q, ts in times.items():
        samples = " ".join(f"{t:.2f}" for t in ts)
        print(f"{tag:7s} {q:28s} min={min(ts):.2f}s  [{samples}]", flush=True)


def _storage_mb(spark) -> float:
    sc = spark.sparkContext
    rdds = sc._jsc.sc().getRDDStorageInfo()
    return sum(rdds[i].memSize() for i in range(len(rdds))) / 1e6


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    _load_all()
    spark = get_spark(app_name="diag-substring")
    spark.sparkContext.setLogLevel("ERROR")

    # JIT/codegen warm-up on the smallest fixture (bench.py does the same)
    for q in QUERIES:
        _force(REGISTRY[q].fn(spark, "/root/testdata/sf0.001"))

    print(f"# phase IDLE (storage={_storage_mb(spark):.0f} MB)", flush=True)
    idle = _time_queries(spark, sf_dir, n_runs)
    _report("IDLE", idle)

    # build the exact layer set bench.py prebuilds, untimed
    from postgres_cdc_example_spark.queries.extensions import (
        _doc_bands,
        _doc_ngrams,
        _pca_fit,
        _trained_centroids,
        _trained_pq,
    )
    from postgres_cdc_example_spark.queries.llmdata import (
        _doc_grams8,
        _doc_occurrences,
        _doc_winnow_fps,
    )

    t0 = time.perf_counter()
    _doc_ngrams(spark, sf_dir).count()
    _doc_occurrences(spark, sf_dir).count()
    _doc_bands(spark, sf_dir).count()
    _doc_grams8(spark, sf_dir).count()
    _doc_winnow_fps(spark, sf_dir).count()
    _trained_centroids(spark, sf_dir)
    _pca_fit(spark, sf_dir)
    _trained_pq(spark, sf_dir)
    print(
        f"# layers built in {time.perf_counter() - t0:.1f}s"
        f" (storage={_storage_mb(spark):.0f} MB)",
        flush=True,
    )
    layered = _time_queries(spark, sf_dir, n_runs)
    _report("LAYERS", layered)

    # churn: run a broad registry slice once (what a full bench session
    # does to the codegen cache / block manager before these queries recur)
    import bench

    churn_list = [q for q in bench.BENCH_QUERIES if q not in QUERIES][:60]
    t0 = time.perf_counter()
    for name in churn_list:
        _force(REGISTRY[name].fn(spark, sf_dir))
    print(
        f"# churned {len(churn_list)} queries in {time.perf_counter() - t0:.1f}s"
        f" (storage={_storage_mb(spark):.0f} MB)",
        flush=True,
    )
    churned = _time_queries(spark, sf_dir, n_runs)
    _report("CHURN", churned)


if __name__ == "__main__":
    main()

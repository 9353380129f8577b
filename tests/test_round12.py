"""Round-12 fixes: the quota gate's doc_id ordering sentinel (r11 ADVICE
low — the stream/batch quota equality silently assumed ascending arrival)
and companions for the round's other changes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from postgres_cdc_example_spark.sources.tables import load_table


def _quality_passing_docs(spark, sf_dir, n=8):
    """Fixture docs that survive the capstone's quality gate, one source,
    sorted by doc_id — the raw material for ordered/out-of-order drops."""
    from postgres_cdc_example_spark.operators.text import quality_score
    from postgres_cdc_example_spark.streaming.curation import QUALITY_GATE

    docs = load_table(spark, "documents", sf_dir)
    src = docs.groupBy("source").count().orderBy(F.desc("count")).first().source
    qd = (
        docs.filter(F.col("source") == src)
        .join(quality_score(docs).select("doc_id", "quality"), "doc_id")
        .filter(F.col("quality") >= QUALITY_GATE)
        .orderBy("doc_id")
        .limit(n)
        .collect()
    )
    assert len(qd) >= 6, "fixture must supply enough quality-passing docs"
    return qd


def _lines(docs, seq0=0):
    from postgres_cdc_example_spark.streaming.curation import (
        document_change_json,
    )

    out = []
    for i, r in enumerate(docs):
        out.append(
            document_change_json(
                seq0 + i + 1,
                {
                    "doc_id": r.doc_id,
                    "text": r.text,
                    "lang": r.lang,
                    "source": r.source,
                    "n_chars": r.n_chars,
                },
            )
        )
    return out


def _drain(spark, src, store, ckpt):
    from postgres_cdc_example_spark.streaming.curation import (
        StreamingCurationPipeline,
    )

    p = StreamingCurationPipeline(
        spark, src, store, ckpt, decontam_bitmap_words=None,
        quota_tokens=10**9,
    )
    q = p.start(available_now=True)
    q.awaitTermination()
    return p


def test_quota_gate_ordering_sentinel_both_arms(spark, sf_dir, tmp_path):
    """NEGATIVE arm: ascending doc_id batches leave order_violations == 0
    and max_doc_id at the true high-water mark. POSITIVE arm: a later
    batch delivering a LOWER doc_id for a committed source is counted in
    the versioned quota state (and via quota_order_violations()) instead
    of silently diverging from the batch source_quota_admission rule the
    stream claims equality with."""
    qd = _quality_passing_docs(spark, sf_dir)
    lo, hi = qd[: len(qd) // 2], qd[len(qd) // 2 :]

    # ---- in-order: lo ids then hi ids -> zero violations ----------------
    src = str(tmp_path / "ord_src"); os.makedirs(src)
    store, ckpt = str(tmp_path / "ord_store"), str(tmp_path / "ord_ckpt")
    with open(os.path.join(src, "c1.txt"), "w") as f:
        f.write("\n".join(_lines(lo)))
    _drain(spark, src, store, ckpt)
    with open(os.path.join(src, "c2.txt"), "w") as f:
        f.write("\n".join(_lines(hi, seq0=100)))
    pipe = _drain(spark, src, store, ckpt)
    assert pipe.quota_order_violations() == 0
    state = {r.source: r for r in pipe.quota_state().collect()}
    srcname = lo[0].source
    assert state[srcname].max_doc_id == max(r.doc_id for r in qd)
    assert state[srcname].order_violations == 0

    # ---- out-of-order: hi ids committed first, then lo ids --------------
    src2 = str(tmp_path / "ooo_src"); os.makedirs(src2)
    store2, ckpt2 = str(tmp_path / "ooo_store"), str(tmp_path / "ooo_ckpt")
    with open(os.path.join(src2, "c1.txt"), "w") as f:
        f.write("\n".join(_lines(hi)))
    _drain(spark, src2, store2, ckpt2)
    with open(os.path.join(src2, "c2.txt"), "w") as f:
        f.write("\n".join(_lines(lo, seq0=100)))
    pipe2 = _drain(spark, src2, store2, ckpt2)
    # every lo doc arrived below the committed high-water mark
    assert pipe2.quota_order_violations() == len(lo)
    st2 = {r.source: r for r in pipe2.quota_state().collect()}
    assert st2[srcname].order_violations == len(lo)
    # high-water mark never regresses
    assert st2[srcname].max_doc_id == max(r.doc_id for r in qd)
    # cumulative tokens still fold additively (count, don't corrupt)
    assert st2[srcname].cum_tokens == state[srcname].cum_tokens

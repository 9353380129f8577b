"""BucketedStateStore: the O(changed-buckets) CDC apply must agree exactly
with the O(state) full-rewrite path, prune untouched partitions at the scan,
express bucket-emptying deletes, and stay idempotent under batch replay."""

from __future__ import annotations

import datetime
import io
import random
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from postgres_cdc_example_spark.operators.cdc_apply import apply_changes
from postgres_cdc_example_spark.streaming.bucket_state import BucketedStateStore
from tests.test_cdc_apply import CHANGE_SCHEMA, STATE_SCHEMA

T0 = datetime.datetime(2024, 1, 1)


def _mk_state(spark, n=200):
    rows = [
        (i, f"s{i % 7}", float(i) * 1.5, T0 + datetime.timedelta(minutes=i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, STATE_SCHEMA)


def _mk_changes(spark, seed, keys, n_events=300, seq0=0):
    rng = random.Random(seed)
    rows = []
    for seq in range(seq0, seq0 + n_events):
        k = rng.choice(keys)
        action = rng.choice(["I", "U", "D"])
        rows.append(
            (
                seq,
                action,
                k,
                f"v{seq % 11}",
                float(seq) * 0.25,
                T0 + datetime.timedelta(minutes=seq),
            )
        )
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _snap(df):
    return sorted(map(tuple, df.collect()))


def test_bucketed_apply_equals_full_rewrite(spark, tmp_path):
    state = _mk_state(spark)
    store = BucketedStateStore(spark, str(tmp_path / "st"), STATE_SCHEMA, n_buckets=16)
    store.commit_full(state)

    # two sequential batches, keys drawn from a subset (some buckets untouched)
    keys = [k for k in range(250) if k % 3 != 1]
    full = state
    for batch, seed in enumerate([7, 11]):
        changes = _mk_changes(spark, seed, keys, seq0=batch * 1000)
        buckets = store.apply_and_commit(changes)
        assert 0 < len(buckets) <= 16
        full = apply_changes(full, changes)
    assert _snap(store.read()) == _snap(full)


def test_read_buckets_prunes_partitions(spark, tmp_path):
    store = BucketedStateStore(spark, str(tmp_path / "st"), STATE_SCHEMA, n_buckets=16)
    store.commit_full(_mk_state(spark))
    df = store.read_buckets([3, 5])
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "__bucket" in plan, "bucket filter must be a partition filter at the scan"
    # and only rows of those buckets come back
    got_buckets = {r[0] % 16 for r in df.select("id").collect()}
    assert got_buckets <= {3, 5}


def test_delete_empties_bucket(spark, tmp_path):
    store = BucketedStateStore(spark, str(tmp_path / "st"), STATE_SCHEMA, n_buckets=16)
    store.commit_full(_mk_state(spark, n=64))  # ids 0..63: bucket b holds {b, b+16, ...}
    victims = [5, 21, 37, 53]  # the whole of bucket 5
    deletes = spark.createDataFrame(
        [(i, "D", k, None, None, None) for i, k in enumerate(victims)], CHANGE_SCHEMA
    )
    store.apply_and_commit(deletes)
    remaining = {r[0] for r in store.read().select("id").collect()}
    assert remaining == set(range(64)) - set(victims)
    assert 5 not in store._existing_buckets(), "emptied partition must be dropped"


def test_replay_is_idempotent(spark, tmp_path):
    store = BucketedStateStore(spark, str(tmp_path / "st"), STATE_SCHEMA, n_buckets=8)
    store.commit_full(_mk_state(spark))
    changes = _mk_changes(spark, seed=13, keys=list(range(100)))
    store.apply_and_commit(changes)
    once = _snap(store.read())
    store.apply_and_commit(changes)  # foreachBatch replay after crash
    assert _snap(store.read()) == once


def test_recover_restores_interrupted_swap(spark, tmp_path):
    """Crash between rename-aside and staged-move-in must be recoverable:
    a leftover .old dir with no live bucket is the pre-batch slice and gets
    restored; one next to a live bucket is completed-swap garbage."""
    import os
    import shutil

    from postgres_cdc_example_spark.streaming.bucket_state import BUCKET_COL

    root = str(tmp_path / "bstate")
    store = BucketedStateStore(spark, root, STATE_SCHEMA, n_buckets=8)
    store.commit_full(_mk_state(spark, 64))
    before = sorted(map(tuple, store.read().collect()))

    # simulate the crash window on bucket 3: live dir moved aside, staged
    # dir never arrived
    live = os.path.join(root, f"{BUCKET_COL}=3")
    aside = os.path.join(root, f".old.{BUCKET_COL}=3")
    os.rename(live, aside)
    # and a completed-swap leftover on bucket 5: live present + stale aside
    shutil.copytree(os.path.join(root, f"{BUCKET_COL}=5"),
                    os.path.join(root, f".old.{BUCKET_COL}=5"))

    store2 = BucketedStateStore(spark, root, STATE_SCHEMA, n_buckets=8)  # recovers
    assert sorted(map(tuple, store2.read().collect())) == before
    assert not os.path.exists(aside)
    assert not os.path.exists(os.path.join(root, f".old.{BUCKET_COL}=5"))

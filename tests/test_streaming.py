"""Stream/batch equivalence: the same windowed aggregation drained via
availableNow must equal the batch result (Structured Streaming is the
engine's extension beyond the batch-only reference — SURVEY §2.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_pipelines_spark.catalog import load_table
from data_integration_pipelines_spark.streaming.events import (
    run_stream_once,
    windowed_counts,
)


def test_stream_matches_batch(spark, sf_small):
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_counts(load_table(spark, sf_small, "events")).collect()
    }
    streamed = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in run_stream_once(spark, sf_small).collect()
    }
    assert batch == streamed
    assert len(batch) > 0


def test_session_window_stream_matches_batch(spark, sf_small):
    from data_integration_pipelines_spark.streaming.events import read_events_stream
    from data_integration_pipelines_spark.streaming.sessions import (
        session_window_counts,
    )

    batch = {
        (r.user_id, r.session_start_us): r.n_events
        for r in session_window_counts(load_table(spark, sf_small, "events")).collect()
    }
    q = (
        session_window_counts(read_events_stream(spark, sf_small))
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.session_start_us): r.n_events
        for r in spark.table("sessions_stream").collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def test_apply_in_pandas_with_state_running_totals(spark, sf_small, tmp_path):
    from data_integration_pipelines_spark.streaming.events import read_events_stream
    from data_integration_pipelines_spark.streaming.sessions import (
        running_user_totals,
    )
    from pyspark.sql import functions as F

    events = load_table(spark, sf_small, "events")
    expected = {
        r.user_id: (r.n, round(r.total, 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    q = (
        running_user_totals(read_events_stream(spark, sf_small))
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode re-emits a cumulative row per user per micro-batch;
    # the LAST row per user is the final state
    rows = spark.table("user_totals").toPandas()
    final = {
        int(r.user_id): (int(r.n_events), round(float(r.total_value), 6))
        for r in rows.groupby("user_id").tail(1).itertuples()
    }
    # state must cover every user with the exact batch totals
    totals_match = {
        u: (n, t) for u, (n, t) in final.items()
    }
    assert totals_match == expected


def test_streaming_dedup_drops_redelivered_events(spark, sf_small, tmp_path):
    from data_integration_pipelines_spark.streaming.dedup import run_dedup_once

    events = load_table(spark, sf_small, "events")
    staging = str(tmp_path / "staged")
    # simulate at-least-once delivery: the full feed plus a re-delivered
    # sample land as separate files in the staged directory
    events.write.mode("overwrite").parquet(staging)
    events.orderBy("event_id").limit(500).write.mode("append").parquet(staging)

    deduped = run_dedup_once(spark, staging)
    got_ids = [r.event_id for r in deduped.collect()]
    expected_n = events.select("event_id").distinct().count()
    assert len(got_ids) == len(set(got_ids)) == expected_n


def test_streaming_upsert_converges_to_batch_keep_latest(spark, sf_small, tmp_path):
    """foreachBatch upsert: final store == batch latest-per-user, for a
    feed delivered as multiple files (multiple micro-batches) with a
    re-delivered (duplicate) slice mixed in."""
    from data_integration_pipelines_spark.operators.merge import keep_latest
    from data_integration_pipelines_spark.streaming.dedup import (
        read_staged_events_stream,
    )
    from data_integration_pipelines_spark.streaming.upsert import (
        read_store,
        streaming_upsert,
    )

    from data_integration_pipelines_spark.functions.time import epoch_us

    events = load_table(spark, sf_small, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    us = epoch_us(events, "ts")
    median_us = events.select(F.percentile(us, F.lit(0.5)).alias("m")).collect()[0].m
    staging = str(tmp_path / "staged")
    store = str(tmp_path / "store")

    def drain():
        q = streaming_upsert(
            read_staged_events_stream(spark, staging).select(
                "event_id", "ts", "user_id", "event_type", "value"
            ),
            store_path=store,
            checkpoint_path=str(tmp_path / "ckpt"),
            key_cols=["user_id"],
            ts_col="ts",
        )
        q.awaitTermination(120)

    # drain 1: the older half of the feed
    old_half = events.filter(us <= median_us)
    old_half.write.mode("overwrite").parquet(staging)
    drain()
    # drain 2 (same checkpoint — resumes from the file-source offset):
    # the newer half plus a re-delivered slice of the old half
    events.filter(us > median_us).write.mode("append").parquet(staging)
    old_half.orderBy("event_id").limit(100).write.mode("append").parquet(staging)
    drain()

    got = read_store(spark, store)
    assert got is not None
    batch_latest = keep_latest(
        events, ["user_id"], "ts", tiebreak_cols=["event_id", "event_type", "value"]
    )
    got_rows = {
        r.user_id: (r.ts, r.event_type, r.value) for r in got.collect()
    }
    want_rows = {
        r.user_id: (r.ts, r.event_type, r.value) for r in batch_latest.collect()
    }
    assert got_rows == want_rows
    # every revision >= 1; at least one user saw an update across batches
    revs = {r.user_id: r._rev for r in got.select("user_id", "_rev").collect()}
    assert all(v >= 1 for v in revs.values())
    assert max(revs.values()) >= 2


def test_upsert_batch_late_rows_never_regress(spark):
    """A batch older than the store leaves values and revisions alone."""
    from data_integration_pipelines_spark.streaming.upsert import upsert_batch

    existing = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00", "new", 5.0, 3)],
        "user_id long, ts string, event_type string, value double, _rev int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    late = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "old", 1.0), (2, "2024-01-01 00:00:00", "o2", 2.0)],
        "user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    merged = upsert_batch(existing, late, ["user_id"], "ts")
    rows = {r.user_id: (r.event_type, r.value, r._rev) for r in merged.collect()}
    assert rows[1] == ("new", 5.0, 3)  # untouched by the stale row
    assert rows[2] == ("o2", 2.0, 1)  # genuinely new key inserted


def test_stream_static_enrichment_matches_batch(spark, sf_small, tmp_path):
    """Events stream joined to a broadcast dimension, windowed per
    cohort: drained availableNow result == same plan on the batch frame."""
    from data_integration_pipelines_spark.streaming.dedup import (
        read_staged_events_stream,
    )
    from data_integration_pipelines_spark.streaming.enrich import (
        enrich_events,
        windowed_enriched_stats,
    )

    events = load_table(spark, sf_small, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    dim = (
        events.select("user_id")
        .distinct()
        .withColumn("cohort", (F.col("user_id") % 3).cast("int"))
    )
    staging = str(tmp_path / "staged")
    events.write.mode("overwrite").parquet(staging)

    stream = read_staged_events_stream(spark, staging).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    out = windowed_enriched_stats(enrich_events(stream, dim), "cohort")
    q = (
        out.writeStream.format("memory")
        .queryName("enriched_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r.window_start), r.cohort): (r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM enriched_counts").collect()
    }
    want = {
        (str(r.window_start), r.cohort): (r.n_events, r.value_sum)
        for r in windowed_enriched_stats(enrich_events(events, dim), "cohort").collect()
    }
    assert got == want and len(got) > 3


def test_stream_stream_attribution_matches_batch(spark, sf_small):
    """Watermarked stream-stream join (view -> purchase within the
    horizon) over the drained backlog == the same range join in batch."""
    from data_integration_pipelines_spark.streaming.joins import (
        run_attribution_once,
        view_purchase_attribution,
    )

    streamed = {
        (r.user_id, r.view_id, r.purchase_id, r.usecs_between)
        for r in run_attribution_once(spark, sf_small, horizon="1 hour").collect()
    }
    batch = {
        (r.user_id, r.view_id, r.purchase_id, r.usecs_between)
        for r in view_purchase_attribution(
            load_table(spark, sf_small, "events"), horizon="1 hour"
        ).collect()
    }
    assert streamed == batch
    assert len(batch) > 0
    # every pair respects the horizon
    assert all(0 <= us <= 3_600_000_000 for *_, us in batch)


def test_state_v2_processor_logic_matches_v1(spark, sf_small):
    """The transformWithState PROCESSOR's arithmetic, executed
    in-process against a stub state handle: feeding each user's rows in
    two micro-batch-sized chunks must land on the same final totals as
    the batch aggregate (and hence as the v1 operator, which is pinned
    to batch elsewhere). This runs in THIS sandbox — it verifies
    everything except Spark's protobuf wire layer and the RocksDB
    store, which only the @realdeps end-to-end test can cover
    (state_v2.py docstring / SCALE.md caveat)."""
    import pandas as pd

    from data_integration_pipelines_spark.streaming.state_v2 import (
        RunningTotalsProcessor,
    )

    class _StubValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class _StubHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, _StubValueState())

    events = load_table(spark, sf_small, "events").select("user_id", "value")
    pdf = events.toPandas()
    expected = {
        int(r.user_id): (int(r.n), round(float(r.total), 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }

    final = {}
    for uid, rows in pdf.groupby("user_id"):
        proc = RunningTotalsProcessor()
        proc.init(_StubHandle())
        half = len(rows) // 2
        out = None
        for chunk in (rows.iloc[:half], rows.iloc[half:]):
            # handleInputRows receives an iterator of pandas batches
            out = list(
                proc.handleInputRows((int(uid),), iter([chunk]), None)
            )[-1]
        proc.close()
        final[int(out["user_id"][0])] = (
            int(out["n_events"][0]),
            round(float(out["total_value"][0]), 6),
        )
    # float-sum chunk order can differ from Spark's partial-agg order
    # by an ulp before the round(6); compare at the rounded precision
    # the operator itself emits
    assert final.keys() == expected.keys()
    for uid in expected:
        n_exp, t_exp = expected[uid]
        n_got, t_got = final[uid]
        assert n_got == n_exp
        assert abs(t_got - t_exp) < 1e-5, (uid, t_got, t_exp)


@pytest.mark.realdeps
def test_transform_with_state_matches_v1_and_batch(spark, sf_small, tmp_path):
    """Spark 4 transformWithStateInPandas (RocksDB state) must produce
    the same final per-user totals as the applyInPandasWithState
    operator and the plain batch aggregate. The API's driver worker
    speaks protobuf to the state server — skip where protobuf is
    absent (the v1 operator test above runs everywhere)."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql import functions as F

    from data_integration_pipelines_spark.streaming.events import read_events_stream
    from data_integration_pipelines_spark.streaming.state_v2 import (
        enable_rocksdb_state,
        running_user_totals_v2,
    )

    events = load_table(spark, sf_small, "events")
    expected = {
        r.user_id: (r.n, round(r.total, 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    enable_rocksdb_state(spark)
    try:
        q = (
            running_user_totals_v2(read_events_stream(spark, sf_small))
            .writeStream.format("memory")
            .queryName("user_totals_v2")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_v2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    rows = spark.table("user_totals_v2").toPandas()
    final = {
        int(r.user_id): (int(r.n_events), round(float(r.total_value), 6))
        for r in rows.groupby("user_id").tail(1).itertuples()
    }
    assert final == expected


def test_streaming_cms_matches_batch_grid(spark, sf_small, tmp_path):
    """CMS folded over micro-batches == CMS built in one batch pass:
    the mergeable-partials contract under at-least-once streaming
    delivery of a multi-file backlog (operators/sketches.py +
    streaming/sketch_fold.py)."""
    from data_integration_pipelines_spark.operators.sketches import cms_build
    from data_integration_pipelines_spark.streaming.dedup import (
        read_staged_events_stream,
    )
    from data_integration_pipelines_spark.streaming.sketch_fold import (
        streaming_cms,
    )
    from data_integration_pipelines_spark.streaming.upsert import read_store

    events = load_table(spark, sf_small, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    staging = str(tmp_path / "staged")
    store = str(tmp_path / "store")
    # two slices -> at least two files; maxFilesPerTrigger=1 forces
    # multiple micro-batches through the fold
    events.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(staging)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(staging)
    q = streaming_cms(
        read_staged_events_stream(spark, staging, max_files_per_trigger=1).select(
            "event_type"
        ),
        value_col="event_type",
        store_path=store,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {(r.d, r.bucket): r.cnt for r in read_store(spark, store).collect()}
    want = {
        (r.d, r.bucket): r.cnt
        for r in cms_build(events.select("event_type"), "event_type").collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_ingest_verdicts_match_batch(spark, sf_small, tmp_path):
    """Ingest classification drained as micro-batches == one-shot batch
    classification: each doc's verdict depends only on (doc, corpus),
    so feed partitioning must not change a single row
    (streaming/ingest.py over operators/dedup.classify_against_corpus)."""
    from data_integration_pipelines_spark.operators.dedup import (
        classify_against_corpus,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_ingest_verdicts,
    )

    docs = load_table(spark, sf_small, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    batch_new = docs.filter(F.col("doc_id") % 10 >= 8)

    staging = str(tmp_path / "staged")
    out = str(tmp_path / "verdicts")
    # two files -> maxFilesPerTrigger=1 forces two micro-batches
    batch_new.filter(F.col("doc_id") % 20 >= 10).write.mode("overwrite").parquet(staging)
    batch_new.filter(F.col("doc_id") % 20 < 10).write.mode("append").parquet(staging)

    q = streaming_ingest_verdicts(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        corpus,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {r.doc_id: (r.verdict, r.exact_match_id, r.n_near_dups, r.best_jaccard_e4)
           for r in spark.read.parquet(out).collect()}
    want = {r.doc_id: (r.verdict, r.exact_match_id, r.n_near_dups, r.best_jaccard_e4)
            for r in classify_against_corpus(batch_new, corpus).collect()}
    assert got == want
    assert len(got) == batch_new.count()

    # same-lineage restart: the checkpoint remembers the drained
    # files, the completed batch_id partitions are skipped — the log
    # stays equal to the one-big-batch answer, never doubled (the
    # versioned-write convention)
    q2 = streaming_ingest_verdicts(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        corpus,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(180)
    redelivered = spark.read.parquet(out)
    assert redelivered.count() == batch_new.count()  # no duplicate rows
    got2 = {r.doc_id: (r.verdict, r.exact_match_id, r.n_near_dups, r.best_jaccard_e4)
            for r in redelivered.collect()}
    assert got2 == want

    # a RECREATED checkpoint is a new lineage with a possibly
    # different doc-to-batch mapping: folding it into the same log
    # must fail loudly (stale/missing-row corruption otherwise) —
    # the same identity binding as sketch_fold's CMS store
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"))
    q3 = streaming_ingest_verdicts(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        corpus,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="bound to checkpoint lineage"):
        q3.awaitTermination(180)
        raise AssertionError("new-lineage fold into an existing log did not fail")


def test_streaming_ingest_nonce_bound_log_survives_query_id(spark, sf_small, tmp_path):
    """A verdict log nonce-bound via a direct foreachBatch-body call
    must keep accepting batches after a real StreamingQuery drives the
    SAME still-live checkpoint (Spark writes query-id metadata into the
    dir — a second identity for the SAME lineage, not a new lineage).
    Mirrors fold_into_store's any-identity acceptance + in-place marker
    upgrade; strict single-identity comparison spuriously fail-closed
    here (round-5 advisory)."""
    import json
    import os

    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_ingest_verdicts,
    )
    from data_integration_pipelines_spark.streaming.sketch_fold import (
        _lineage_identities,
    )

    docs = load_table(spark, sf_small, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    batch_new = docs.filter(F.col("doc_id") % 10 >= 8)

    staging = str(tmp_path / "staged")
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    batch_new.write.mode("overwrite").parquet(staging)

    # direct-body era: checkpoint has no metadata yet -> nonce identity;
    # the log is bound under that nonce
    nonce_id = _lineage_identities(ckpt)[0]
    assert nonce_id.startswith("nonce:")
    os.makedirs(out, exist_ok=True)
    json.dump(
        {"lineage": nonce_id, "checkpoint": ckpt},
        open(os.path.join(out, "_lineage.json"), "w"),
    )

    # a real StreamingQuery now drives the same still-live checkpoint
    # (Spark writes metadata with a query id) — must NOT be refused
    q = streaming_ingest_verdicts(
        read_staged_docs_stream(spark, staging),
        corpus,
        out_path=out,
        checkpoint_path=ckpt,
    )
    q.awaitTermination(180)
    assert spark.read.parquet(out).count() == batch_new.count()
    rebound = json.load(open(os.path.join(out, "_lineage.json")))
    assert rebound["lineage"].startswith("query:")  # upgraded in place


def test_streaming_cms_replay_is_idempotent(spark, sf_small, tmp_path):
    """At-least-once replay of a micro-batch must not double-count:
    within one checkpoint lineage the store version is keyed on
    batch_id, so a redelivered batch finds its version complete and
    skips (sketch_fold.fold_into_store — the foreachBatch body,
    exercised directly to simulate the post-crash redelivery)."""
    from data_integration_pipelines_spark.operators.sketches import cms_build
    from data_integration_pipelines_spark.streaming.sketch_fold import (
        fold_into_store,
    )
    from data_integration_pipelines_spark.streaming.upsert import read_store

    events = load_table(spark, sf_small, "events").select("event_type")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    fold_into_store(events, 0, store, ckpt, "event_type")
    # redelivery of the SAME batch id after a crash-before-commit
    fold_into_store(events, 0, store, ckpt, "event_type")

    got = {(r.d, r.bucket): r.cnt for r in read_store(spark, store).collect()}
    want = {
        (r.d, r.bucket): r.cnt for r in cms_build(events, "event_type").collect()
    }
    assert got == want  # folded once, not twice


def test_streaming_cms_refuses_foreign_checkpoint(spark, sf_small, tmp_path):
    """A store is bound to its checkpoint lineage: a DIFFERENT
    checkpoint re-batches the backlog from 0 with a possibly different
    file mix, so folding it into the same store would silently corrupt
    counts — it must fail loudly instead."""
    from data_integration_pipelines_spark.streaming.sketch_fold import (
        fold_into_store,
    )

    events = load_table(spark, sf_small, "events").select("event_type")
    store = str(tmp_path / "store")
    fold_into_store(events, 0, store, str(tmp_path / "ckpt1"), "event_type")
    with pytest.raises(ValueError, match="bound to checkpoint"):
        fold_into_store(events, 0, store, str(tmp_path / "ckpt2"), "event_type")


def test_streaming_cms_refuses_recreated_checkpoint(spark, sf_small, tmp_path):
    """Lineage binding must survive delete-and-recreate AT THE SAME
    PATH: a fresh checkpoint re-batches from 0 with a possibly
    different file mix, so the guard binds to the lineage IDENTITY
    (query id / creation nonce), not the path string — the exact
    corruption a path-bound guard would wave through."""
    import shutil

    from data_integration_pipelines_spark.streaming.sketch_fold import (
        fold_into_store,
    )

    events = load_table(spark, sf_small, "events").select("event_type")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    fold_into_store(events, 0, store, ckpt, "event_type")
    # same path, same lineage -> replay still fine
    fold_into_store(events, 1, store, ckpt, "event_type")
    # delete + recreate the checkpoint: NEW lineage at the OLD path
    shutil.rmtree(ckpt)
    with pytest.raises(ValueError, match="bound to checkpoint lineage"):
        fold_into_store(events, 0, store, ckpt, "event_type")


def test_streaming_cms_lineage_migrations_accepted(spark, sf_small, tmp_path):
    """Legitimate same-lineage continuations must NOT be refused:
    (a) a store written before the identity guard (path-bound marker)
    upgrades in place on its first post-upgrade fold; (b) a store
    nonce-bound via a direct fold keeps folding after Spark writes the
    query-id metadata into the SAME still-live checkpoint dir."""
    import json
    import os

    from data_integration_pipelines_spark.streaming.sketch_fold import (
        fold_into_store,
    )

    events = load_table(spark, sf_small, "events").select("event_type")

    # (a) legacy path-bound marker -> accepted once, upgraded
    store_a = str(tmp_path / "store_a")
    ckpt_a = str(tmp_path / "ckpt_a")
    fold_into_store(events, 0, store_a, ckpt_a, "event_type")
    marker = os.path.join(store_a, "_checkpoint.json")
    json.dump({"checkpoint": ckpt_a}, open(marker, "w"))  # strip lineage
    fold_into_store(events, 1, store_a, ckpt_a, "event_type")  # no raise
    upgraded = json.load(open(marker))
    assert "lineage" in upgraded  # marker upgraded in place
    with pytest.raises(ValueError):  # a DIFFERENT path still refuses
        fold_into_store(events, 2, store_a, str(tmp_path / "other"), "event_type")

    # (b) nonce-bound store survives the query-id metadata appearing
    store_b = str(tmp_path / "store_b")
    ckpt_b = str(tmp_path / "ckpt_b")
    fold_into_store(events, 0, store_b, ckpt_b, "event_type")  # nonce-bound
    json.dump({"id": "11111111-2222-3333-4444-555555555555"},
              open(os.path.join(ckpt_b, "metadata"), "w"))
    fold_into_store(events, 1, store_b, ckpt_b, "event_type")  # no raise
    rebound = json.load(open(os.path.join(store_b, "_checkpoint.json")))
    assert rebound["lineage"].startswith("query:")  # upgraded to query id


def test_streaming_cluster_assign_matches_batch(spark, sf_small, tmp_path):
    """Map-only k-means assignment runs unchanged inside a streaming
    query: fit centroids in batch, stream the same vectors through
    assign_clusters, and every (id, cluster, dist) row must match the
    batch assignment exactly (streaming/cluster_assign.py)."""
    from data_integration_pipelines_spark.operators.clustering import kmeans_fit
    from data_integration_pipelines_spark.streaming.cluster_assign import (
        read_staged_embeddings_stream,
        streaming_assign,
    )

    emb = load_table(spark, sf_small, "embeddings")
    batch_assigned, cents = kmeans_fit(emb, k=4, iters=2)
    want = {
        r.id: (r.cluster, r.dist)
        for r in batch_assigned.select("id", "cluster", "dist").collect()
    }

    staging = str(tmp_path / "staged")
    out = str(tmp_path / "assigned")
    emb.filter(F.col("vec_id") % 2 == 0).write.mode("overwrite").parquet(staging)
    emb.filter(F.col("vec_id") % 2 == 1).write.mode("append").parquet(staging)
    q = streaming_assign(
        read_staged_embeddings_stream(spark, staging, max_files_per_trigger=1),
        cents,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {r.id: (r.cluster, r.dist) for r in spark.read.parquet(out).collect()}
    assert got == want
    assert len(got) == emb.count()


def test_streaming_topk_matches_batch_bruteforce(spark, sf_small, tmp_path):
    """Streaming ANN fold == one-shot brute force: the corpus arrives
    as micro-batches, each batch's top-k folds into the versioned
    running answer via the top-k monoid — the final store version must
    be the exact brute-force top-k over everything drained
    (streaming/ann.py; the streaming twin of ann_topk_incremental)."""
    from data_integration_pipelines_spark.operators.similarity import (
        brute_force_topk,
    )
    from data_integration_pipelines_spark.streaming.ann import (
        fold_topk_batch,
        read_staged_vectors_stream,
        streaming_topk,
    )
    from data_integration_pipelines_spark.streaming.upsert import read_store

    emb = load_table(spark, sf_small, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    staging = str(tmp_path / "staged_vecs")
    for i in range(3):  # three files -> three micro-batches
        emb.filter(F.pmod(F.col("vec_id"), F.lit(3)) == i).write.mode(
            "append"
        ).parquet(staging)
    store = str(tmp_path / "topk_store")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_topk(
        read_staged_vectors_stream(spark, staging, max_files_per_trigger=1),
        queries,
        store_path=store,
        checkpoint_path=ckpt,
        k=10,
    )
    q.awaitTermination(180)

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine_e4)
        for r in read_store(spark, store).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine_e4)
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    assert got == want and len(want) == 50

    # replay idempotence: redeliver the last batch id directly — the
    # complete version is found and skipped, the answer unchanged
    last_v = max(
        int(n.split("=")[1])
        for n in __import__("os").listdir(store)
        if n.startswith("v=")
    )
    fold_topk_batch(emb.limit(7), last_v, queries, store, ckpt, k=10)
    again = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine_e4)
        for r in read_store(spark, store).collect()
    }
    assert again == want

    # a recreated checkpoint is a new lineage: folding into the same
    # store must refuse
    import shutil

    shutil.rmtree(ckpt)
    with pytest.raises(ValueError, match="bound to checkpoint lineage"):
        fold_topk_batch(emb.limit(7), 0, queries, store, ckpt, k=10)


def test_streaming_drift_psi_matches_batch_query(spark, sf_medium, tmp_path):
    """Drift PSI from micro-batch-folded band counts == the registry
    drift_psi batch query on the same snapshot split: the folded
    (source, bin) monoid plus the report arithmetic must reproduce the
    batch answer bit-for-bit (streaming/drift.py)."""
    from data_integration_pipelines_spark.plans import REGISTRY
    from data_integration_pipelines_spark.streaming.drift import (
        band_counts,
        drift_psi_report,
        streaming_band_counts,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
    )

    docs = load_table(spark, sf_medium, "documents")
    reference = band_counts(docs.filter(F.col("doc_id") % 2 == 0))
    new = docs.filter(F.col("doc_id") % 2 == 1)

    staging = str(tmp_path / "staged")
    store = str(tmp_path / "store")
    # two files -> maxFilesPerTrigger=1 forces two micro-batches
    new.filter(F.col("doc_id") % 4 == 1).write.mode("overwrite").parquet(staging)
    new.filter(F.col("doc_id") % 4 == 3).write.mode("append").parquet(staging)
    q = streaming_band_counts(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        store_path=store,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = [
        tuple(r)
        for r in drift_psi_report(spark, reference, store).collect()
    ]
    want = [
        tuple(r) for r in REGISTRY["drift_psi"].fn(spark, sf_medium).collect()
    ]
    assert got == want
    assert len(got) > 0
    # the fixture is non-vacuous: counts actually folded across >1 batch
    from data_integration_pipelines_spark.streaming.upsert import _versions

    assert len(_versions(store)) >= 2


def test_streaming_drift_batching_invariant(spark, sf_small, tmp_path):
    """One big micro-batch vs many small ones must fold to the same
    band-count state and hence the same PSI report (monoid merge is
    associative; the fold must not depend on delivery slicing)."""
    from data_integration_pipelines_spark.streaming.drift import (
        band_counts,
        drift_psi_report,
        streaming_band_counts,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
    )

    docs = load_table(spark, sf_small, "documents")
    reference = band_counts(docs.filter(F.col("doc_id") % 2 == 0))
    new = docs.filter(F.col("doc_id") % 2 == 1)

    reports = {}
    for label, mfpt in (("many", 1), ("one", None)):
        staging = str(tmp_path / f"staged_{label}")
        store = str(tmp_path / f"store_{label}")
        new.filter(F.col("doc_id") % 4 == 1).write.mode("overwrite").parquet(staging)
        new.filter(F.col("doc_id") % 4 == 3).write.mode("append").parquet(staging)
        q = streaming_band_counts(
            read_staged_docs_stream(spark, staging, max_files_per_trigger=mfpt),
            store_path=store,
            checkpoint_path=str(tmp_path / f"ckpt_{label}"),
        )
        q.awaitTermination(120)
        reports[label] = [
            tuple(r) for r in drift_psi_report(spark, reference, store).collect()
        ]
    assert reports["many"] == reports["one"]


def test_streaming_drift_time_travel_and_lineage_refusal(
    spark, sf_small, tmp_path
):
    """Every fold version stays readable (the drift trajectory is
    time-travelable), and a recreated checkpoint must be refused by the
    store (versioned_fold's lineage binding covers the new state type)."""
    import shutil

    from data_integration_pipelines_spark.streaming.drift import (
        band_counts,
        drift_psi_report,
        streaming_band_counts,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
    )
    from data_integration_pipelines_spark.streaming.upsert import (
        _versions,
        read_store,
    )

    docs = load_table(spark, sf_small, "documents")
    reference = band_counts(docs.filter(F.col("doc_id") % 2 == 0))
    new = docs.filter(F.col("doc_id") % 2 == 1)

    staging = str(tmp_path / "staged")
    store = str(tmp_path / "store")
    new.filter(F.col("doc_id") % 4 == 1).write.mode("overwrite").parquet(staging)
    new.filter(F.col("doc_id") % 4 == 3).write.mode("append").parquet(staging)
    q = streaming_band_counts(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        store_path=store,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    versions = _versions(store)
    assert len(versions) >= 2
    # earlier version reflects strictly fewer folded documents
    n_first = read_store(spark, store, version=versions[0]).agg(
        F.sum("n")
    ).collect()[0][0]
    n_last = read_store(spark, store, version=versions[-1]).agg(
        F.sum("n")
    ).collect()[0][0]
    assert n_first < n_last == new.count()
    # the report is computable at any version
    early = drift_psi_report(spark, reference, store, version=versions[0])
    assert early.count() > 0

    # recreated checkpoint = new lineage: the store must refuse it
    shutil.rmtree(str(tmp_path / "ckpt"))
    q2 = streaming_band_counts(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        store_path=store,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="bound to checkpoint lineage"):
        q2.awaitTermination(120)
        raise AssertionError("new-lineage fold into an existing store did not fail")


def test_streaming_distinct_sketch_matches_one_shot(spark, sf_small, tmp_path):
    """HLL distinct counting folded over micro-batches == the one-shot
    batch sketch estimate, EXACTLY (sketch union is associative and the
    estimate is deterministic for a given algorithm/seed) — per-group
    distinct users per event_type in bounded state
    (streaming/sketch_fold.streaming_distinct on versioned_fold)."""
    from data_integration_pipelines_spark.operators.incremental import (
        finalize_distinct,
        merge_distinct_sketches,
        partial_distinct_sketch,
    )
    from data_integration_pipelines_spark.streaming.dedup import (
        read_staged_events_stream,
    )
    from data_integration_pipelines_spark.streaming.sketch_fold import (
        streaming_distinct,
    )
    from data_integration_pipelines_spark.streaming.upsert import (
        _versions,
        read_store,
    )

    events = load_table(spark, sf_small, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    staging = str(tmp_path / "staged")
    store = str(tmp_path / "store")
    events.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(staging)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(staging)
    q = streaming_distinct(
        read_staged_events_stream(spark, staging, max_files_per_trigger=1).select(
            "event_type", "user_id"
        ),
        keys=["event_type"],
        value_col="user_id",
        store_path=store,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert len(_versions(store)) >= 2  # the fold really ran multi-batch

    got = {
        r.event_type: r.n_distinct_est
        for r in finalize_distinct(
            read_store(spark, store), ["event_type"]
        ).collect()
    }
    want = {
        r.event_type: r.n_distinct_est
        for r in finalize_distinct(
            merge_distinct_sketches(
                None,
                partial_distinct_sketch(events, ["event_type"], "user_id"),
                ["event_type"],
            ),
            ["event_type"],
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_embedding_verdicts_match_batch(spark, sf_small, tmp_path):
    """The embedding tier of streaming ingest dedup (r9): vector feed
    drained as micro-batches == one-shot batch classification — each
    vector's verdict depends only on (vector, corpus), so feed
    partitioning must not change a row; and the versioned log stays
    equal (never doubled) across a same-lineage restart."""
    from data_integration_pipelines_spark.operators.similarity import (
        classify_embeddings_against_corpus,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_embeddings_stream,
        streaming_embedding_verdicts,
    )

    emb = load_table(spark, sf_small, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 < 8)
    batch_new = emb.filter(F.col("vec_id") % 10 >= 8)

    staging = str(tmp_path / "staged")
    out = str(tmp_path / "verdicts")
    batch_new.filter(F.col("vec_id") % 20 >= 10).write.mode("overwrite").parquet(staging)
    batch_new.filter(F.col("vec_id") % 20 < 10).write.mode("append").parquet(staging)

    q = streaming_embedding_verdicts(
        read_staged_embeddings_stream(spark, staging, max_files_per_trigger=1),
        corpus,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    def key(rows):
        return {r.vec_id: (r.n_near, r.max_cosine_e4, r.verdict) for r in rows}

    got = key(spark.read.parquet(out).collect())
    want = key(
        classify_embeddings_against_corpus(batch_new, corpus, threshold=0.35).collect()
    )
    assert got == want
    assert len(got) == batch_new.count()
    assert any(v[2] == "near_dup" for v in got.values()), "fixture must plant cross-split near-dups"

    # same-lineage restart: completed batch_id partitions are skipped
    q2 = streaming_embedding_verdicts(
        read_staged_embeddings_stream(spark, staging, max_files_per_trigger=1),
        corpus,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(180)
    redelivered = spark.read.parquet(out)
    assert redelivered.count() == batch_new.count()
    assert key(redelivered.collect()) == want


def test_streaming_dsir_scores_match_batch(spark, sf_small, tmp_path):
    """DSIR scoring drained as micro-batches against the pinned model
    == one-shot batch scoring: a doc's score is an integer sum over
    (doc, model) only, so feed partitioning must not change a row
    (streaming/ingest.streaming_dsir_scores over operators/dsir)."""
    from data_integration_pipelines_spark.operators.dsir import (
        dsir_bucket_model,
        dsir_scores,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_dsir_scores,
    )

    docs = load_table(spark, sf_small, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    feed = docs.filter(F.col("doc_id") % 10 >= 8)
    model = dsir_bucket_model(corpus, F.col("lang") == "en")

    staging = str(tmp_path / "staged")
    out = str(tmp_path / "scores")
    # two files -> maxFilesPerTrigger=1 forces two micro-batches
    feed.filter(F.col("doc_id") % 20 >= 10).write.mode("overwrite").parquet(staging)
    feed.filter(F.col("doc_id") % 20 < 10).write.mode("append").parquet(staging)

    q = streaming_dsir_scores(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        model,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {
        r.doc_id: (r.n_tokens, r.score_e4)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.score_e4)
        for r in dsir_scores(feed, model).collect()
    }
    assert got == want
    assert len(got) == feed.count()

    # same-lineage restart: completed batch_id partitions are skipped,
    # the log stays equal to the one-big-batch answer, never doubled
    q2 = streaming_dsir_scores(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        model,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(180)
    redelivered = spark.read.parquet(out)
    assert redelivered.count() == feed.count()
    assert {
        r.doc_id: (r.n_tokens, r.score_e4) for r in redelivered.collect()
    } == want


def test_streaming_segment_frequency_fold_equals_one_shot(spark, sf_small, tmp_path):
    """Boilerplate frequency deltas drained as micro-batches, then
    re-summed == the one-shot state over the whole feed; redelivery
    does not double any count; and incremental removal decisions for a
    later batch against the folded state equal the batch operator's."""
    from data_integration_pipelines_spark.operators.boilerplate import (
        remove_boilerplate_incremental,
        segment_frequency_state,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        folded_segment_frequency,
        read_staged_docs_stream,
        streaming_segment_frequency,
    )

    docs = load_table(spark, sf_small, "documents")
    staging = str(tmp_path / "staged")
    out = str(tmp_path / "freq")
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(staging)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(staging)

    q = streaming_segment_frequency(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    def by_key(rows):
        return {(r["__h"], r["__h2"]): r.n for r in rows}

    folded = by_key(folded_segment_frequency(spark, out).collect())
    one_shot = by_key(segment_frequency_state(docs).collect())
    assert folded == one_shot

    # same-lineage restart: no count doubles
    q2 = streaming_segment_frequency(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(180)
    refolded = by_key(folded_segment_frequency(spark, out).collect())
    assert refolded == one_shot

    # decisions for a NEW batch against the folded state == the batch
    # incremental operator against the equivalent state
    new_batch = docs.limit(20)
    incr = remove_boilerplate_incremental(
        new_batch, folded_segment_frequency(spark, out)
    )
    want = remove_boilerplate_incremental(new_batch, segment_frequency_state(docs))
    assert sorted(map(tuple, incr.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_ngram_lm_scores_match_batch(spark, sf_small, tmp_path):
    """LM quality scores drained as micro-batches against the pinned
    snapshot model == one-shot batch scoring, and a same-lineage
    restart never doubles a row (streaming/ingest.
    streaming_ngram_lm_scores over operators/ngram_lm)."""
    from data_integration_pipelines_spark.operators.ngram_lm import (
        bigram_events,
        ngram_lm_fit,
        ngram_lm_scores,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_ngram_lm_scores,
    )

    docs = load_table(spark, sf_small, "documents")
    ev = bigram_events(docs, extra_cols=["lang"])
    pair_model, ctx_model = ngram_lm_fit(
        ev.filter(F.col("lang") == "en").select("b1", "b12")
    )
    feed = docs.filter(F.col("doc_id") % 10 >= 8)

    staging = str(tmp_path / "staged")
    out = str(tmp_path / "scores")
    feed.filter(F.col("doc_id") % 20 >= 10).write.mode("overwrite").parquet(staging)
    feed.filter(F.col("doc_id") % 20 < 10).write.mode("append").parquet(staging)

    q = streaming_ngram_lm_scores(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        pair_model,
        ctx_model,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {
        r.doc_id: (r.n_bigrams, r.logprob_sum_e4)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.n_bigrams, r.logprob_sum_e4)
        for r in ngram_lm_scores(feed, pair_model, ctx_model).collect()
    }
    assert got == want
    assert len(got) == feed.count()

    # same-lineage restart: completed batch_id partitions are skipped
    q2 = streaming_ngram_lm_scores(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        pair_model,
        ctx_model,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(180)
    redelivered = spark.read.parquet(out)
    assert redelivered.count() == feed.count()
    assert {
        r.doc_id: (r.n_bigrams, r.logprob_sum_e4)
        for r in redelivered.collect()
    } == want


def test_streaming_dsir_release_keeps_caller_model_pinned(
    spark, sf_small, tmp_path
):
    """ADVICE r9: the drain pins a PRIVATE copy of the model — its
    release must not evict a persist the CALLER holds on the same
    DataFrame (a shared model serving other consumers)."""
    from pyspark import StorageLevel

    from data_integration_pipelines_spark.operators.dsir import (
        dsir_bucket_model,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_dsir_scores,
    )

    docs = load_table(spark, sf_small, "documents")
    model = dsir_bucket_model(docs, F.col("lang") == "en").persist()
    model.count()
    try:
        staging = str(tmp_path / "staged")
        docs.limit(20).write.mode("overwrite").parquet(staging)
        q = streaming_dsir_scores(
            read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
            model,
            out_path=str(tmp_path / "scores"),
            checkpoint_path=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)
        # the drain's release ran (availableNow termination) — the
        # caller's own persist must still be live
        assert model.storageLevel != StorageLevel.NONE
    finally:
        model.unpersist()


def test_streaming_segment_frequency_line_mode_parity(
    spark, sf_small, tmp_path
):
    """The streaming frequency face in LINE mode: drained deltas fold
    to the one-shot line state, and batch removal decisions against
    the folded state match the batch operator — the production unit
    exercised end-to-end through the stream."""
    from data_integration_pipelines_spark.operators.boilerplate import (
        remove_boilerplate_incremental,
        segment_frequency_state,
    )
    from data_integration_pipelines_spark.plans.queries_text import _lined_docs
    from data_integration_pipelines_spark.streaming.ingest import (
        folded_segment_frequency,
        read_staged_docs_stream,
        streaming_segment_frequency,
    )

    docs = _lined_docs(load_table(spark, sf_small, "documents"))
    staging = str(tmp_path / "staged")
    out = str(tmp_path / "freq")
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(staging)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(staging)

    q = streaming_segment_frequency(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
        unit="line",
    )
    q.awaitTermination(180)

    folded = {
        (r["__h"], r["__h2"]): r.n
        for r in folded_segment_frequency(spark, out).collect()
    }
    one_shot = {
        (r["__h"], r["__h2"]): r.n
        for r in segment_frequency_state(docs, unit="line").collect()
    }
    assert folded == one_shot

    new_batch = docs.limit(15)
    incr = remove_boilerplate_incremental(
        new_batch, folded_segment_frequency(spark, out), unit="line"
    )
    want = remove_boilerplate_incremental(
        new_batch, segment_frequency_state(docs, unit="line"), unit="line"
    )
    assert sorted(map(tuple, incr.collect())) == sorted(map(tuple, want.collect()))


def test_folded_segment_frequency_empty_log(spark, tmp_path):
    """A delta log with no batch partitions yet is a legitimate empty
    state, not a read error."""
    from data_integration_pipelines_spark.streaming.ingest import (
        folded_segment_frequency,
    )

    out = str(tmp_path / "never_written")
    df = folded_segment_frequency(spark, out)
    assert df.columns == ["__h", "__h2", "n"]
    assert df.count() == 0


def test_streaming_perlang_lm_scores_match_batch(spark, sf_small, tmp_path):
    """The PER-LANGUAGE LM streaming face (key_cols=("lang",)):
    micro-batch scoring against the pinned per-lang snapshot models ==
    one-shot batch scoring under the same models — every fed doc
    scores under its own language's target (CCNet's construction)."""
    from data_integration_pipelines_spark.operators.ngram_lm import (
        bigram_events,
        ngram_lm_fit,
        ngram_lm_scores,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_ngram_lm_scores,
    )

    docs = load_table(spark, sf_small, "documents")
    fit_ev = bigram_events(
        docs.filter(
            F.col("source").isin("src0", "src1", "src2", "src3")
        ),
        extra_cols=["lang"],
    ).select("lang", "b1", "b12")
    pair_model, ctx_model = ngram_lm_fit(fit_ev, key_cols=("lang",))
    feed = docs.filter(F.col("doc_id") % 10 >= 8)

    staging = str(tmp_path / "staged")
    out = str(tmp_path / "scores")
    feed.filter(F.col("doc_id") % 20 >= 10).write.mode("overwrite").parquet(staging)
    feed.filter(F.col("doc_id") % 20 < 10).write.mode("append").parquet(staging)

    q = streaming_ngram_lm_scores(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        pair_model,
        ctx_model,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
        key_cols=("lang",),
    )
    q.awaitTermination(180)

    got = {
        r.doc_id: (r.n_bigrams, r.logprob_sum_e4)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.n_bigrams, r.logprob_sum_e4)
        for r in ngram_lm_scores(
            feed, pair_model, ctx_model, key_cols=("lang",)
        ).collect()
    }
    assert got == want
    assert len(got) == feed.count()

def test_streaming_shard_assign_matches_batch(spark, sf_small, tmp_path):
    """Seeded shuffle shard assignment drained as micro-batches == the
    one-shot batch deal: (shard, key) is a pure function of (id, seed),
    so feed partitioning and arrival order change nothing; redelivery
    never duplicates a document (streaming/ingest.streaming_shard_assign
    over sources/shard_export.assign_shuffled)."""
    from data_integration_pipelines_spark.sources.shard_export import (
        SHARD_COL,
        SHUFFLE_KEY_COL,
        assign_shuffled,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_shard_assign,
    )

    docs = load_table(spark, sf_small, "documents")
    staging = str(tmp_path / "staged")
    out = str(tmp_path / "assigned")
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(staging)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(staging)

    q = streaming_shard_assign(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
        n_shards=8,
        seed=0,
    )
    q.awaitTermination(180)

    def by_id(rows):
        return {r["doc_id"]: (r[SHARD_COL], r[SHUFFLE_KEY_COL]) for r in rows}

    got = by_id(spark.read.parquet(out).collect())
    want = by_id(
        assign_shuffled(docs, "doc_id", 8, seed=0)
        .select("doc_id", SHARD_COL, SHUFFLE_KEY_COL)
        .collect()
    )
    assert got == want and len(got) == 500

    # same-lineage restart: completed batch partitions skip, no dupes
    q2 = streaming_shard_assign(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
        n_shards=8,
        seed=0,
    )
    q2.awaitTermination(180)
    assert by_id(spark.read.parquet(out).collect()) == want

def test_streaming_perceptron_scores_match_batch(spark, sf_small, tmp_path):
    """Perceptron scoring drained as micro-batches against the pinned
    4-int weights == one-shot batch scoring: a doc's margin is an exact
    integer dot product of (doc, weights) only, so feed partitioning
    changes nothing; redelivery never doubles a row
    (streaming/ingest.streaming_perceptron_scores)."""
    from data_integration_pipelines_spark.operators.perceptron import (
        perceptron_features,
        perceptron_scores,
        perceptron_train,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_perceptron_scores,
    )

    docs = load_table(spark, sf_small, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    feed = docs.filter(F.col("doc_id") % 10 >= 8)
    hist = perceptron_train(perceptron_features(corpus), n_iters=3)
    w = [hist[-1][k] for k in ("w_bias", "w_swr", "w_atl", "w_ttr")]

    staging = str(tmp_path / "staged")
    out = str(tmp_path / "scores")
    feed.filter(F.col("doc_id") % 20 >= 10).write.mode("overwrite").parquet(staging)
    feed.filter(F.col("doc_id") % 20 < 10).write.mode("append").parquet(staging)

    q = streaming_perceptron_scores(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        w,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    def by_id(rows):
        return {r.doc_id: (r.margin, r.predicted, r.correct) for r in rows}

    got = by_id(spark.read.parquet(out).collect())
    want = by_id(perceptron_scores(perceptron_features(feed), w).collect())
    assert got == want and len(got) == feed.count()

    # same-lineage restart: completed batch partitions skip, no dupes
    q2 = streaming_perceptron_scores(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        w,
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(180)
    assert by_id(spark.read.parquet(out).collect()) == want


def test_streaming_gopher_gate_matches_batch(spark, sf_small, tmp_path):
    """Gopher repetition verdicts drained as micro-batches == one-shot
    batch gating: every signal is a pure per-document function (all
    within-batch groupBys are doc_id-keyed), so feed partitioning and
    arrival order change nothing (streaming/ingest.streaming_gopher_gate)."""
    from pyspark.sql import functions as F

    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.operators.gopher import (
        gopher_filter_frame,
        gopher_signals_frame,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_gopher_gate,
    )

    feed = load_table(spark, sf_small, "documents").select("doc_id", "text")
    staging = str(tmp_path / "staged")
    out = str(tmp_path / "verdicts")
    feed.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(staging)
    feed.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(staging)

    q = streaming_gopher_gate(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    def by_id(rows):
        return {r.doc_id: (r.n_fails, r.keep, r.fail_rules) for r in rows}

    got = by_id(spark.read.parquet(out).collect())
    want = by_id(gopher_filter_frame(gopher_signals_frame(feed)).collect())
    assert got == want and len(got) == feed.count()


def test_streaming_gopher_gate_full_matches_batch(spark, sf_small, tmp_path):
    """The COMPLETE Table-A1 filter (repetition + document rules)
    drained as micro-batches == one-shot batch gating — still a pure
    per-document function, so the full=True face is stateless too."""
    from pyspark.sql import functions as F

    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.operators.gopher import (
        gopher_full_filter_frame,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_gopher_gate,
    )

    feed = (
        load_table(spark, sf_small, "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "text")
    )
    staging = str(tmp_path / "staged")
    out = str(tmp_path / "verdicts")
    feed.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(staging)
    feed.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(staging)

    q = streaming_gopher_gate(
        read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
        out_path=out,
        checkpoint_path=str(tmp_path / "ckpt"),
        full=True,
    )
    q.awaitTermination(180)

    def by_id(rows):
        return {r.doc_id: (r.n_fails, r.keep, r.fail_rules) for r in rows}

    got = by_id(spark.read.parquet(out).collect())
    want = by_id(gopher_full_filter_frame(feed).collect())
    assert got == want and len(got) == feed.count()

"""Scale probe for the STREAMING faces (VERDICT r9 task 7): drain a
1x and a 10x feed through each `_versioned_drain` operator and record
wall + state size, certifying the tier's design claims with rows
instead of narration:

- ``streaming_dsir_scores`` / ``streaming_ngram_lm_scores``: the
  per-batch cost depends on (batch, model) ONLY — both models are
  bounded by construction (n_buckets rows; ctx*pair buckets)
  whatever corpus they were fitted on, so scoring a FIXED feed
  against a model fitted on 10x the corpus must be ~flat (growth
  ~1.0).
- ``streaming_embedding_verdicts``: the corpus index is staged ONCE
  and pinned; a fixed feed against a 10x corpus pays candidate-join
  growth (bounded by the bucket cap), never a per-batch corpus
  re-scan — growth well under 10x.
- ``streaming_segment_frequency`` (segment AND line units): the state
  is the aggregated (hash, count) log, never the corpus — a 10x feed
  costs ~10x wall (it is feed-bound by design: every doc must be
  segmented once) while per-doc cost stays flat; the folded state
  row count is recorded to show state != corpus size.

Methodology matches scale_probe.py: the 10x corpus is the
join-consistent replica (same builder), one session, availableNow
drains, wall = query start -> awaitTermination. Feeds are staged as a
fixed number of files with maxFilesPerTrigger=1, so batch COUNT is
constant across scales and growth reads per-batch work.

Usage: python scripts/streaming_probe.py [--faces a,b] [K] [base_sf_dir]
(--faces filters by substring match on the face name.)
Prints one JSON object; merge into the round's PROBE_r{N}.json runs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F  # noqa: E402

from data_integration_pipelines_spark.catalog import load_table  # noqa: E402
from data_integration_pipelines_spark.session import get_spark  # noqa: E402

_N_FEED_FILES = 4


def _stage(df, path: str) -> None:
    df.repartition(_N_FEED_FILES).write.mode("overwrite").parquet(path)


def _drain(q) -> float:
    t0 = time.time()
    q.awaitTermination(1800)
    return round(time.time() - t0, 3)


def _probe_dsir(spark, base: str, scaled: str, work: str) -> dict:
    """Fixed feed, model fitted on 1x vs Kx corpus."""
    from data_integration_pipelines_spark.operators.dsir import (
        dsir_bucket_model,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_dsir_scores,
    )

    feed = load_table(spark, base, "documents").filter(
        F.col("doc_id") % 10 >= 8
    )
    staging = os.path.join(work, "dsir_feed")
    _stage(feed, staging)
    row: dict = {}
    for tag, sf in (("base", base), ("x", scaled)):
        model = dsir_bucket_model(
            load_table(spark, sf, "documents"), F.col("lang") == "en"
        )
        q = streaming_dsir_scores(
            read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
            model,
            out_path=os.path.join(work, f"dsir_out_{tag}"),
            checkpoint_path=os.path.join(work, f"dsir_ckpt_{tag}"),
        )
        row[f"{tag}_s"] = _drain(q)
    row["growth"] = round(row["x_s"] / row["base_s"], 2)
    row["claim"] = "fixed feed vs Kx-corpus model: flat (model is n_buckets rows)"
    return row


def _probe_ngram_lm(spark, base: str, scaled: str, work: str) -> dict:
    """Fixed feed, LM fitted on 1x vs Kx target corpus (the model is
    bounded at ctx*pair buckets whatever fit it — same flatness claim
    as the DSIR face)."""
    from pyspark.sql import functions as F

    from data_integration_pipelines_spark.operators.ngram_lm import (
        bigram_events,
        ngram_lm_fit,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_ngram_lm_scores,
    )

    feed = load_table(spark, base, "documents").filter(
        F.col("doc_id") % 10 >= 8
    )
    staging = os.path.join(work, "lm_feed")
    _stage(feed, staging)
    row: dict = {}
    for tag, sf in (("base", base), ("x", scaled)):
        docs = load_table(spark, sf, "documents")
        pm, cm = ngram_lm_fit(
            bigram_events(docs.filter(F.col("lang") == "en")).select(
                "b1", "b12"
            )
        )
        q = streaming_ngram_lm_scores(
            read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
            pm,
            cm,
            out_path=os.path.join(work, f"lm_out_{tag}"),
            checkpoint_path=os.path.join(work, f"lm_ckpt_{tag}"),
        )
        row[f"{tag}_s"] = _drain(q)
    row["growth"] = round(row["x_s"] / row["base_s"], 2)
    row["claim"] = (
        "fixed feed vs Kx-corpus LM: flat (model bounded at ctx*pair "
        "buckets by construction)"
    )
    return row


def _probe_embedding(spark, base: str, scaled: str, work: str) -> dict:
    """Fixed feed of new vectors, corpus 1x vs Kx."""
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_embeddings_stream,
        streaming_embedding_verdicts,
    )

    feed = load_table(spark, base, "embeddings").filter(
        F.col("vec_id") % 10 >= 8
    )
    staging = os.path.join(work, "emb_feed")
    _stage(feed, staging)
    row: dict = {}
    for tag, sf in (("base", base), ("x", scaled)):
        corpus = load_table(spark, sf, "embeddings").filter(
            F.col("vec_id") % 10 < 8
        )
        q = streaming_embedding_verdicts(
            read_staged_embeddings_stream(
                spark, staging, max_files_per_trigger=1
            ),
            corpus,
            out_path=os.path.join(work, f"emb_out_{tag}"),
            checkpoint_path=os.path.join(work, f"emb_ckpt_{tag}"),
        )
        row[f"{tag}_s"] = _drain(q)
    row["growth"] = round(row["x_s"] / row["base_s"], 2)
    row["claim"] = (
        "fixed feed vs Kx corpus: index staged once, per-batch cost is "
        "the capped candidate join, never a corpus re-scan"
    )
    return row


def _probe_segment_frequency(
    spark, base: str, scaled: str, work: str, unit: str
) -> dict:
    """Feed 1x vs Kx (the frequency face is feed-bound by design);
    records folded-state rows to show state is the aggregated log."""
    from data_integration_pipelines_spark.streaming.ingest import (
        folded_segment_frequency,
        read_staged_docs_stream,
        streaming_segment_frequency,
    )

    row: dict = {}
    for tag, sf in (("base", base), ("x", scaled)):
        docs = load_table(spark, sf, "documents")
        if unit == "line":
            from data_integration_pipelines_spark.plans.queries_text import (
                _lined_docs,
            )

            docs = _lined_docs(docs)
        staging = os.path.join(work, f"seg_feed_{unit}_{tag}")
        _stage(docs, staging)
        out = os.path.join(work, f"seg_out_{unit}_{tag}")
        q = streaming_segment_frequency(
            read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
            out_path=out,
            checkpoint_path=os.path.join(work, f"seg_ckpt_{unit}_{tag}"),
            unit=unit,
        )
        row[f"{tag}_s"] = _drain(q)
        row[f"state_rows_{tag}"] = folded_segment_frequency(spark, out).count()
        row[f"feed_docs_{tag}"] = docs.count()
    row["growth"] = round(row["x_s"] / row["base_s"], 2)
    row["state_growth"] = round(
        row["state_rows_x"] / row["state_rows_base"], 2
    )
    row["claim"] = (
        "Kx feed: wall tracks feed size (every doc segmented once), "
        "state is the aggregated (hash,count) log"
    )
    return row


def _probe_perceptron(spark, base: str, scaled: str, work: str) -> dict:
    """Fixed feed, perceptron trained on 1x vs Kx corpus — the
    strongest flatness claim in the tier: the pinned model is FOUR
    INTEGERS, so per-batch cost is (batch, 4 literals) only."""
    from data_integration_pipelines_spark.operators.perceptron import (
        perceptron_features,
        perceptron_train,
    )
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_perceptron_scores,
    )

    feed = load_table(spark, base, "documents").filter(
        F.col("doc_id") % 10 >= 8
    )
    staging = os.path.join(work, "perc_feed")
    _stage(feed, staging)
    row: dict = {}
    for tag, sf in (("base", base), ("x", scaled)):
        hist = perceptron_train(
            perceptron_features(load_table(spark, sf, "documents")), n_iters=3
        )
        w = [hist[-1][k] for k in ("w_bias", "w_swr", "w_atl", "w_ttr")]
        q = streaming_perceptron_scores(
            read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
            w,
            out_path=os.path.join(work, f"perc_out_{tag}"),
            checkpoint_path=os.path.join(work, f"perc_ckpt_{tag}"),
        )
        row[f"{tag}_s"] = _drain(q)
    row["growth"] = round(row["x_s"] / row["base_s"], 2)
    row["claim"] = (
        "fixed feed vs Kx-corpus-trained weights: flat (model is 4 ints "
        "substituted as literals — nothing staged, nothing broadcast)"
    )
    return row


def _probe_shard_assign(spark, base: str, scaled: str, work: str) -> dict:
    """Feed 1x vs Kx through the stateless shuffle-shard assignment —
    feed-bound by design (map-only, no state, no model)."""
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_shard_assign,
    )

    row: dict = {}
    for tag, sf in (("base", base), ("x", scaled)):
        docs = load_table(spark, sf, "documents")
        staging = os.path.join(work, f"shard_feed_{tag}")
        _stage(docs, staging)
        out = os.path.join(work, f"shard_out_{tag}")
        q = streaming_shard_assign(
            read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
            out_path=out,
            checkpoint_path=os.path.join(work, f"shard_ckpt_{tag}"),
        )
        row[f"{tag}_s"] = _drain(q)
        row[f"feed_docs_{tag}"] = docs.count()
    row["growth"] = round(row["x_s"] / row["base_s"], 2)
    row["claim"] = (
        "Kx feed: wall tracks feed size only (stateless map — shard and "
        "order key are pure functions of (id, seed))"
    )
    return row


def _probe_gopher_gate(spark, base: str, scaled: str, work: str) -> dict:
    """Feed 1x vs Kx through the stateless Gopher repetition gate —
    feed-bound by design (per-doc pure signals, no state, no model)."""
    from data_integration_pipelines_spark.streaming.ingest import (
        read_staged_docs_stream,
        streaming_gopher_gate,
    )

    row: dict = {}
    for tag, sf in (("base", base), ("x", scaled)):
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        staging = os.path.join(work, f"gopher_feed_{tag}")
        _stage(docs, staging)
        out = os.path.join(work, f"gopher_out_{tag}")
        q = streaming_gopher_gate(
            read_staged_docs_stream(spark, staging, max_files_per_trigger=1),
            out_path=out,
            checkpoint_path=os.path.join(work, f"gopher_ckpt_{tag}"),
        )
        row[f"{tag}_s"] = _drain(q)
        row[f"feed_docs_{tag}"] = docs.count()
    row["growth"] = round(row["x_s"] / row["base_s"], 2)
    row["claim"] = (
        "Kx feed: wall tracks feed size only (every signal is a pure "
        "per-doc function; within-batch groupBys are doc_id-keyed)"
    )
    return row


_FACES = {
    "streaming_dsir_scores": _probe_dsir,
    "streaming_gopher_gate": _probe_gopher_gate,
    "streaming_perceptron_scores": _probe_perceptron,
    "streaming_shard_assign": _probe_shard_assign,
    "streaming_ngram_lm_scores": _probe_ngram_lm,
    "streaming_embedding_verdicts": _probe_embedding,
    "streaming_segment_frequency": lambda s, b, x, w: _probe_segment_frequency(
        s, b, x, w, "segment"
    ),
    "streaming_segment_frequency_lines": (
        lambda s, b, x, w: _probe_segment_frequency(s, b, x, w, "line")
    ),
}


def main() -> None:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--faces" in args:
        i = args.index("--faces")
        only = {f for f in args[i + 1].split(",")}
        del args[i : i + 2]
        unknown = {
            f for f in only if not any(f in name for name in _FACES)
        }
        if unknown:
            raise SystemExit(f"unknown faces (substring match): {unknown}")
    k = int(args[0]) if args else 10
    base = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    scaled = f"/tmp/spark-graft-scale{k}x-{os.path.basename(base.rstrip('/'))}"
    spark = get_spark("streaming-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from scale_probe import _REPLICA_MARKER, build_replica

    if not (
        os.path.exists(os.path.join(scaled, "embeddings.parquet"))
        and os.path.exists(os.path.join(scaled, _REPLICA_MARKER))
    ):
        build_replica(spark, base, scaled, k)

    work = tempfile.mkdtemp(prefix="streaming-probe-")
    try:
        report = {
            name: fn(spark, base, scaled, work)
            for name, fn in _FACES.items()
            if only is None or any(f in name for f in only)
        }
        print(json.dumps({"k": k, "base": base, "faces": report}, indent=2))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

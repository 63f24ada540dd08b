"""Streaming dataset-drift monitor: fold per-micro-batch banded counts
into a versioned store, then report PSI against a frozen reference
snapshot — the continuous-ingestion face of the batch ``drift_psi``
registry query (plans/queries_curation.py).

Why this shape scales: the state carried across the unbounded feed is
the (source, bin) count table — sources × n_bins rows FOREVER, a
mergeable monoid (cell-wise add), so each micro-batch costs one
band-count aggregate over the increment plus a state-sized merge
(exactly the CMS-grid contract, streaming/sketch_fold.py). The PSI
report is computed FROM the folded state on demand; no per-document
state, no watermark, nothing corpus-sized.

Exactly-once: folds go through ``sketch_fold.versioned_fold`` — the
store is lineage-bound to its checkpoint (a foreign or recreated
checkpoint is refused, never silently double-folded) and the version
IS the micro-batch id (a replayed batch finds its version complete and
skips). Every complete version stays readable: the drift trajectory
over time is time-travelable for free.

The report reproduces the batch query's arithmetic bit-for-bit:
add-one smoothing over the OBSERVED cell set, each PSI term quantized
to integer micro-units (functions/quantize.quantized) BEFORE the sum,
and the standard 0.10 / 0.25 alert thresholds on the e6 scale —
pinned equal to the registry ``drift_psi`` output by test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.quantize import quantized
from .sketch_fold import versioned_fold
from .upsert import read_store

# alert thresholds on the e6-scaled PSI (0.10 / 0.25 — the standard
# population-stability rule of thumb); shared with the batch query's
# inline constants and pinned equal by test
PSI_DRIFTING_E6 = 100_000
PSI_SHIFTED_E6 = 250_000


def band_counts(
    df: DataFrame,
    source_col: str = "source",
    chars_col: str = "n_chars",
    bin_width: int = 200,
    n_bins: int = 10,
) -> DataFrame:
    """(source, bin, n) banded histogram — the monoid cell table. The
    binning must match the batch drift_psi query: floor(chars/width)
    clamped to the last bin."""
    return (
        df.select(
            F.col(source_col).alias("source"),
            F.least(F.col(chars_col) / F.lit(bin_width), F.lit(n_bins - 1))
            .cast("long")
            .alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(F.count("*").alias("n"))
    )


def fold_band_counts(
    existing: DataFrame | None, partial: DataFrame
) -> DataFrame:
    """Cell-wise add of two band-count tables (the monoid merge)."""
    if existing is None:
        return partial
    return (
        existing.unionByName(partial)
        .groupBy("source", "bin")
        .agg(F.sum("n").alias("n"))
    )


def streaming_band_counts(
    stream_df: DataFrame,
    store_path: str,
    checkpoint_path: str,
    source_col: str = "source",
    chars_col: str = "n_chars",
    bin_width: int = 200,
    n_bins: int = 10,
):
    """Drain ``stream_df`` with availableNow, folding each micro-batch's
    band counts into the versioned store. Returns the StreamingQuery."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        versioned_fold(
            batch_df,
            batch_id,
            store_path,
            checkpoint_path,
            lambda existing, batch: fold_band_counts(
                existing,
                band_counts(batch, source_col, chars_col, bin_width, n_bins),
            ),
        )

    return (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def drift_psi_report(
    spark: SparkSession,
    reference_counts: DataFrame,
    store_path: str,
    version: int | None = None,
) -> DataFrame:
    """PSI per source: the folded store (the live feed's distribution)
    vs a frozen ``reference_counts`` band table (from ``band_counts``
    over the reference snapshot). ``version`` time-travels the report
    to an earlier fold point.

    Arithmetic is the batch drift_psi query's, bit for bit: the cell
    set is every (source, bin) OBSERVED on either side (full outer,
    zero-filled), add-one smoothing over that per-source cell count,
    per-cell terms quantized to e6 micro-units before the
    order-independent integer sum."""
    live = read_store(spark, store_path, version=version)
    ref = reference_counts.select(
        "source", "bin", F.col("n").alias("n_old")
    )
    new = live.select("source", "bin", F.col("n").alias("n_new"))
    cells = (
        ref.join(new, ["source", "bin"], "full_outer")
        .select(
            "source",
            "bin",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    w = Window.partitionBy("source")
    tot = (
        cells.withColumn("tot_old", F.sum("n_old").over(w))
        .withColumn("tot_new", F.sum("n_new").over(w))
        .withColumn("n_bins", F.count("*").over(w))
    )
    p_new = (F.col("n_new") + 1.0) / (F.col("tot_new") + F.col("n_bins"))
    p_old = (F.col("n_old") + 1.0) / (F.col("tot_old") + F.col("n_bins"))
    terms = tot.select(
        "source",
        quantized((p_new - p_old) * F.log(p_new / p_old), 6).alias("term_e6"),
    )
    return (
        terms.groupBy("source")
        .agg(F.sum("term_e6").cast("long").alias("psi_e6"))
        .select(
            "source",
            "psi_e6",
            F.when(F.col("psi_e6") >= PSI_SHIFTED_E6, "shifted")
            .when(F.col("psi_e6") >= PSI_DRIFTING_E6, "drifting")
            .otherwise("stable")
            .alias("verdict"),
        )
        .orderBy("source")
    )

"""Deduplication operators for training-data curation at scale:
exact, n-gram-Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB of documents):
- **exact**: one shuffle on a 32-hex fingerprint — uniformly
  distributed keys, no skew; map-side partial aggregation applies.
- **jaccard_pairs**: the shingle join is the classic skew trap — a
  stop-shingle appearing in 1M docs creates a 10^12-row join island.
  ``max_doc_freq`` drops high-document-frequency shingles before
  pairing (standard df-capping); AQE skew-join splits what remains.
- **minhash_lsh**: pair generation never compares all N^2 docs — only
  docs sharing a band bucket join, and bucket sizes are bounded by the
  band width. This is THE scale path; jaccard_pairs is the verifier
  run on the candidate set only.
- **simhash**: near-dup via equal 16-bit sketch buckets — one shuffle
  on the sketch, then tiny per-bucket self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint,
    minhash_signature,
    simhash_bits,
    word_shingles,
    ws_tokens,
)


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to cluster parallelism when the scan produced fewer
    partitions (single-row-group parquet files are unsplittable, so a
    small corpus otherwise serializes CPU-dense per-doc work onto one
    core). At real scale the scan already has >= parallelism partitions
    and this is a no-op — it never *reduces* partition count."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on normalized-text fingerprint. Returns one row per
    distinct fingerprint: survivor (min id) + duplicate count."""
    return (
        df.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("id").alias("survivor_id"),
            F.count("*").alias("n_copies"),
        )
    )


def doc_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct (id, shingle) pairs."""
    return (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(ws_tokens(F.col(text_col)), n)).alias("shingle"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with n-gram Jaccard >= threshold.

    ``max_doc_freq``: drop shingles occurring in more than this many
    docs before pairing (df-capping — kills join skew at scale; safe
    for high thresholds since ubiquitous shingles carry no signal).

    Physical plan notes: shingles are hashed to xxhash64 ints and
    deduped per-doc with ``array_distinct`` BEFORE the explode — per-doc
    distinctness needs no shuffle (the naive ``explode().distinct()``
    pays a full exchange of n-word strings), and the per-doc size table
    is then just ``size(array)``: zero aggregation. 64-bit collisions
    are negligible at any corpus size. The compact per-doc array table
    is persisted once; the size table and both join sides derive from
    it with narrow ops only (size / explode).
    """
    hashed = F.array_distinct(
        F.transform(
            word_shingles(ws_tokens(F.col(text_col)), n), lambda s: F.xxhash64(s)
        )
    )
    base = spread(df).select(
        F.col(id_col).alias("id"), hashed.alias("shingles")
    ).persist()
    sh = base.select("id", F.explode("shingles").alias("shingle"))
    sizes = base.select("id", F.size("shingles").alias("sz"))
    pair_sh = sh
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        pair_sh = sh.join(rare, "shingle")
    a = pair_sh.select(F.col("id").alias("id_a"), "shingle")
    b = pair_sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, ["shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_bands(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """(id, band, band_hash) — LSH banding of the MinHash signature.
    rows_per_band = num_hashes // bands; docs agreeing on all rows of
    any band share a band_hash."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    shingles = word_shingles(ws_tokens(F.col(text_col)), n)
    sig = spread(df).select(
        F.col(id_col).alias("id"), *minhash_signature(shingles, num_hashes)
    )
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh{b * r + j}") for j in range(r)]
        # null-PROPAGATING concat (not concat_ws, which skips nulls): a
        # doc with no shingles must yield a NULL band_hash that joins
        # nothing — same semantics as SQL '||'.
        parts: list = [cols[0]]
        for c in cols[1:]:
            parts.extend([F.lit("|"), c])
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"), F.md5(F.concat(*parts)).alias("band_hash")
            )
        )
    # One pass over the signature (explode over band structs) — a
    # per-band UNION would recompute the k-hash signature `bands` times.
    return sig.select("id", F.explode(F.array(*band_structs)).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Distinct candidate near-dup pairs (id_a < id_b) from LSH banding.

    The band table feeds both sides of the bucket self-join, so it is
    persisted — otherwise the md5-heavy signature subtree executes
    twice (at corpus scale this table IS the dedup index and would be
    written to storage once and joined many times)."""
    bands_df = minhash_bands(df, text_col, id_col, n, num_hashes, bands).persist()
    a = bands_df.select(F.col("id").alias("id_a"), "band", "band_hash")
    b = bands_df.select(F.col("id").alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash_sketches(df: DataFrame, text_col: str, id_col: str, nbits: int = 16) -> DataFrame:
    """(id, simhash) sketch table."""
    return spread(df).select(
        F.col(id_col).alias("id"),
        simhash_bits(ws_tokens(F.col(text_col)), nbits).alias("simhash"),
    )


def simhash_bucket_pairs(
    df: DataFrame, text_col: str, id_col: str, nbits: int = 16
) -> DataFrame:
    """Candidate pairs sharing an identical simhash sketch. The sketch
    table feeds both join sides -> persisted (see minhash note)."""
    sk = simhash_sketches(df, text_col, id_col, nbits).persist()
    a = sk.select(F.col("id").alias("id_a"), "simhash")
    b = sk.select(F.col("id").alias("id_b"), "simhash")
    return (
        a.join(b, ["simhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "simhash")
    )

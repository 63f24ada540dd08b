"""Bloom-filter semi-join prefilter (decontamination at corpus scale).

The exact decontamination join (``plans/queries_curation.decontaminate``)
broadcasts the holdout shingle table — fine while eval suites are small,
but the broadcast grows with the holdout. The production pattern at
100 TB is the one Spark's own runtime row-level filtering uses: build a
FIXED-SIZE bit array over the build side's keys, broadcast the bits
(m/8 bytes regardless of key count), drop every probe row whose key
cannot possibly match, then run the exact join on the survivors only.
The bloom filter admits false positives, never false negatives, so an
exact verify join after the prefilter returns the identical result —
the filter only changes HOW MUCH data reaches the shuffle.

Representation: a one-row DataFrame holding MAP<block, bits> of the
NON-ZERO 64-bit blocks (sparse — an m=2^18 filter is <=4096 entries).
Membership is pure Column arithmetic (xxhash64 -> pmod -> bit test) on
the cross-joined map, so the probe side never shuffles and stays in
whole-stage codegen. ``bit_or`` partial aggregation builds the blocks
map-side; only <=m/64 block rows reach the final reduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_bitmap(keys: DataFrame, key_col: str, m_bits: int = 1 << 18, k: int = 3) -> DataFrame:
    """One-row DataFrame ``(bm MAP<BIGINT,BIGINT>)`` — the bloom filter
    over ``keys[key_col]`` (any type; hashed with xxhash64 under ``k``
    seeds). Bit ``p`` of the filter lives at ``bm[p div 64] & (1 << (p
    % 64))``. Zero blocks are absent (sparse map)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    probes = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    blocks = probes.groupBy(F.shiftright("pos", 6).alias("block")).agg(
        F.bit_or(F.expr("shiftleft(1L, int(pos % 64))")).alias("bits")
    )
    return blocks.agg(
        F.map_from_entries(F.collect_list(F.struct("block", "bits"))).alias("bm")
    )


def might_contain(key: Column, bm: Column, m_bits: int = 1 << 18, k: int = 3) -> Column:
    """True iff ``key`` may be in the set ``bm`` was built from (false
    positives possible, false negatives impossible). Pure Column ops —
    runs inside whole-stage codegen, no Python."""
    tests = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
        )
        word = F.coalesce(F.element_at(bm, F.shiftright(pos, 6)), F.lit(0).cast("long"))
        tests.append(word.bitwiseAND(mask) != 0)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_prefilter(
    probe: DataFrame,
    build_keys: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """Rows of ``probe`` whose ``probe_key`` MIGHT appear in
    ``build_keys[build_key]`` — a lossless-reject semi-join prefilter.
    The bitmap row cross-joins in via a 1-row broadcast; every dropped
    row is guaranteed absent from the exact join, so
    ``bloom_prefilter(...)  ⨝ build == probe ⨝ build`` always.

    The two key columns must share a physical type: xxhash64 hashes an
    INT and a BIGINT holding the same value differently, which would
    silently break the no-false-negative guarantee. Mismatched types
    raise instead of dropping matching rows."""
    # resolve through select(), not schema[...]: the engine resolves
    # column names per spark.sql.caseSensitive, and the guard must see
    # exactly the column the join would use
    probe_type = probe.select(probe_key).schema[0].dataType
    build_type = build_keys.select(build_key).schema[0].dataType
    if probe_type != build_type:
        raise TypeError(
            f"bloom_prefilter key type mismatch: probe[{probe_key}]="
            f"{probe_type.simpleString()} vs build[{build_key}]="
            f"{build_type.simpleString()}; xxhash64 is type-sensitive, so "
            "matching values would hash apart and be wrongly rejected — "
            "cast both keys to a common type first"
        )
    bm_row = bloom_bitmap(build_keys, build_key, m_bits, k)
    crossed = probe.crossJoin(F.broadcast(bm_row))
    return crossed.filter(
        might_contain(F.col(probe_key), F.col("bm"), m_bits, k)
    ).drop("bm")

"""Boilerplate segment removal (operators/boilerplate.py): semantics
beyond the oracle hash — segmentation partition laws, whole-unit
removal, conservation, and the degenerate/edge documents the fixture
doesn't exercise."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_integration_pipelines_spark.operators.boilerplate import (
    doc_segments,
    remove_boilerplate_segments,
    segment_frequency_table,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_segmentation_is_a_partition(spark):
    """Segments tile the token stream: non-overlapping, order-preserved,
    final partial segment kept, rejoining reproduces the token stream."""
    rows = [
        (1, "a b c d e f g h i j k l m"),  # 13 tokens -> 6+6+1
        (2, "a b c"),  # shorter than one segment
        (3, "x y z x y z"),  # exactly one segment
    ]
    segs = doc_segments(_docs(spark, rows), seg_tokens=6).collect()
    by_doc: dict[int, list] = {}
    for r in segs:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [len(by_doc[d]) for d in (1, 2, 3)] == [3, 1, 1]
    for doc_id, text in rows:
        parts = sorted(by_doc[doc_id], key=lambda r: r.seg_id)
        assert [p.seg_id for p in parts] == list(range(len(parts)))
        assert " ".join(p.seg for p in parts) == text


def test_removal_is_whole_segment_and_conserving(spark):
    """A heavy segment disappears WHOLE everywhere it occurs (including
    within-doc repeats); counts conserve; untouched docs keep their
    exact text digest."""
    boiler = "the cookie banner text here now"  # 6 tokens
    rows = [
        (1, f"{boiler} unique one two three four five"),
        (2, f"{boiler} other words in this document here"),
        # within-doc repeat: two aligned occurrences in one doc
        (3, f"{boiler} {boiler}"),
        (4, "entirely unique text nothing shared at all"),
    ]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_segments(
            _docs(spark, rows), seg_tokens=6, min_df=3
        ).collect()
    }
    assert out[1].n_segments == 2 and out[1].n_removed == 1
    assert out[2].n_segments == 2 and out[2].n_removed == 1
    assert out[3].n_segments == 2 and out[3].n_removed == 2
    assert out[4].n_segments == 2 and out[4].n_removed == 0
    # doc 3 fully emptied -> digest of empty string
    assert out[3].cleaned_md5 == hashlib.md5(b"").hexdigest()
    # doc 4 untouched -> digest of its canonical (space-joined) text
    assert out[4].cleaned_md5 == hashlib.md5(rows[3][1].encode()).hexdigest()
    # doc 1 keeps exactly the non-boilerplate remainder
    assert (
        out[1].cleaned_md5
        == hashlib.md5(b"unique one two three four five").hexdigest()
    )


def test_below_threshold_segments_survive(spark):
    """df=2 < min_df=3: nothing is removed — this is the line that
    separates boilerplate removal from exact_substring_removal's df>1
    span rule."""
    shared = "one two three four five six"
    rows = [(1, f"{shared} a b c d e f"), (2, f"{shared} g h i j k l")]
    out = remove_boilerplate_segments(
        _docs(spark, rows), seg_tokens=6, min_df=3
    ).collect()
    assert all(r.n_removed == 0 for r in out)


def test_frequency_table_counts_occurrences_and_docs(spark):
    boiler = "the cookie banner text here now"
    rows = [
        (1, f"{boiler} unique one two three four five"),
        (2, f"{boiler} {boiler}"),
    ]
    segs = doc_segments(_docs(spark, rows), seg_tokens=6)
    freq = {
        r.seg: r
        for r in segment_frequency_table(segs, min_df=3).collect()
    }
    assert list(freq) == [boiler]
    assert freq[boiler].n_occurrences == 3
    assert freq[boiler].n_docs == 2


def test_min_df_below_two_rejected(spark):
    with pytest.raises(ValueError, match="min_df"):
        remove_boilerplate_segments(
            _docs(spark, [(1, "a b")]), seg_tokens=6, min_df=1
        )


def test_misaligned_repeat_not_removed(spark):
    """The same 6 words at a different SEGMENT ALIGNMENT are a different
    segment — the whole-line decision is positional, exactly like real
    line dedup (a nav bar mid-sentence is not a line)."""
    boiler = "the cookie banner text here now"
    rows = [
        (1, f"{boiler} tail words pad pad pad pad"),
        (2, f"{boiler} tail words pad pad pad pad"),
        (3, f"shift {boiler} words pad pad pad pad"),  # off by one token
    ]
    out = {
        r.doc_id: r.n_removed
        for r in remove_boilerplate_segments(
            _docs(spark, rows), seg_tokens=6, min_df=2
        ).collect()
    }
    # docs 1/2 share both aligned segments (df=2 each); doc 3's shifted
    # copy aligns differently and survives
    assert out[1] == 2 and out[2] == 2 and out[3] == 0


def test_fixture_non_vacuous(spark, sf_medium):
    """sf0.01 exercises detection AND removal (28 heavy segments, 68
    docs touched — pinned in the registry docstrings)."""
    from data_integration_pipelines_spark.plans import REGISTRY

    freq = REGISTRY["boilerplate_segments"].fn(spark, sf_medium)
    assert freq.count() == 28
    removal = REGISTRY["boilerplate_removal"].fn(spark, sf_medium)
    touched = removal.filter(F.col("n_removed") > 0).count()
    assert touched == 68
    assert removal.count() == 500  # one row per document, always


def test_incremental_fold_equals_one_shot(spark, sf_medium):
    """The incremental tier's invariant: frequency state folded over
    THREE arbitrary batches equals the one-shot state exactly, and
    batch decisions against the folded state equal the full-recount
    decisions restricted to the batch."""
    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.operators.boilerplate import (
        merge_frequency_states,
        remove_boilerplate_incremental,
        remove_boilerplate_segments,
        segment_frequency_state,
    )

    docs = load_table(spark, sf_medium, "documents")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    folded = merge_frequency_states(
        merge_frequency_states(
            segment_frequency_state(b0), segment_frequency_state(b1)
        ),
        segment_frequency_state(b2),
    )
    one_shot = segment_frequency_state(docs)
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, one_shot.collect())
    )
    # decisions: batch b2 against the folded state of b0+b1 == the
    # full recount restricted to b2's docs
    incr = remove_boilerplate_incremental(
        b2, merge_frequency_states(
            segment_frequency_state(b0), segment_frequency_state(b1)
        )
    )
    full = remove_boilerplate_segments(docs).join(
        b2.select("doc_id"), "doc_id", "left_semi"
    )
    assert sorted(map(tuple, incr.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_line_segmentation_splits_on_newlines(spark):
    """unit='line': one segment per line, 0-based positions, rejoining
    with '\\n' reproduces the document; a doc with no newline is its
    own single line."""
    rows = [
        (1, "nav bar\nreal content here\nfooter text"),
        (2, "single line no newline"),
        (3, "a\n\nb"),  # empty middle line is a line
    ]
    segs = doc_segments(_docs(spark, rows), unit="line").collect()
    by_doc: dict[int, list] = {}
    for r in segs:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [len(by_doc[d]) for d in (1, 2, 3)] == [3, 1, 3]
    for doc_id, text in rows:
        parts = sorted(by_doc[doc_id], key=lambda r: r.seg_id)
        assert [p.seg_id for p in parts] == list(range(len(parts)))
        assert "\n".join(p.seg for p in parts) == text
    assert by_doc[3][1].seg == ""


def test_line_removal_is_whole_line_and_rejoins_with_newline(spark):
    """A heavy LINE drops whole wherever it appears; kept lines
    re-join with '\\n' before digesting — the digest is of the actual
    cleaned multi-line document."""
    banner = "accept all cookies"
    rows = [
        (1, f"{banner}\nunique content one"),
        (2, f"{banner}\nother content\nmore content"),
        (3, f"{banner}\n{banner}"),  # within-doc repeat
        (4, "no boilerplate\nat all"),
    ]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_segments(
            _docs(spark, rows), unit="line", min_df=3
        ).collect()
    }
    assert (out[1].n_segments, out[1].n_removed) == (2, 1)
    assert (out[2].n_segments, out[2].n_removed) == (3, 1)
    assert (out[3].n_segments, out[3].n_removed) == (2, 2)
    assert (out[4].n_segments, out[4].n_removed) == (2, 0)
    assert out[3].cleaned_md5 == hashlib.md5(b"").hexdigest()
    assert (
        out[2].cleaned_md5
        == hashlib.md5(b"other content\nmore content").hexdigest()
    )
    assert out[4].cleaned_md5 == hashlib.md5(b"no boilerplate\nat all").hexdigest()


def test_invalid_unit_rejected(spark):
    with pytest.raises(ValueError, match="unit"):
        doc_segments(_docs(spark, [(1, "a b")]), unit="sentence")


def test_line_fixture_non_vacuous(spark, sf_medium):
    """The derived multi-line corpus at sf0.01: exactly the 7 injected
    boilerplate lines are heavy (banner 250, newsletter 218, five
    footer variants 100 each) and EVERY doc keeps exactly its body
    line — removal strips all injected lines and nothing else."""
    from data_integration_pipelines_spark.plans import REGISTRY

    heavy = {
        r.seg: r.n_occurrences
        for r in REGISTRY["boilerplate_lines"].fn(spark, sf_medium).collect()
    }
    assert len(heavy) == 7
    assert heavy["accept cookies to continue"] == 250
    assert heavy["subscribe to our newsletter"] == 218
    assert all(heavy[f"copyright {i} footer"] == 100 for i in range(5))
    rem = REGISTRY["boilerplate_removal_lines"].fn(spark, sf_medium).collect()
    assert len(rem) == 500
    assert all(r.n_segments - r.n_removed == 1 for r in rem)


def test_line_incremental_matches_one_shot(spark, sf_medium):
    """Decision parity in LINE mode: batch decisions against the folded
    line-frequency state equal the one-shot recount restricted to the
    batch — the incremental face runs the production unit, not just
    the segment surrogate."""
    from data_integration_pipelines_spark.catalog import load_table
    from data_integration_pipelines_spark.operators.boilerplate import (
        remove_boilerplate_incremental,
        segment_frequency_state,
    )
    from data_integration_pipelines_spark.plans.queries_text import _lined_docs

    docs = _lined_docs(load_table(spark, sf_medium, "documents"))
    standing = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    incr = remove_boilerplate_incremental(
        batch, segment_frequency_state(standing, unit="line"), unit="line"
    )
    full = remove_boilerplate_segments(docs, unit="line").join(
        batch.select("doc_id"), "doc_id", "left_semi"
    )
    assert sorted(map(tuple, incr.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_null_text_doc_keeps_report_row(spark):
    """NULL text coalesces to '' — the doc still earns its one removal
    row (one empty segment, nothing removable below threshold)."""
    rows = [(1, "a b c d e f"), (2, None)]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_segments(
            spark.createDataFrame(rows, "doc_id bigint, text string"),
            seg_tokens=6,
            min_df=3,
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[2].n_segments == 1 and out[2].n_removed == 0


def test_cleaning_exposes_masked_duplicates(spark, sf_medium):
    """The composition's reason to exist: documents identical except
    for boilerplate collapse to one fingerprint after cleaning. At
    sf0.01: 0 raw exact dupes corpus-wide, 5 after cleaning."""
    from data_integration_pipelines_spark.plans import REGISTRY

    row = REGISTRY["boilerplate_then_exact_dedup"].fn(spark, sf_medium).collect()[0]
    assert row.dupes_raw == 0
    assert row.dupes_cleaned == 5 and row.n_exposed == 5
    assert row.n_docs == 500


def test_heavy_hashes_rejects_single_hash_frame(spark):
    """ADVICE r10: a segments frame carrying only one of the 128-bit
    pair (e.g. a table persisted under the pre-r10 single-hash
    contract) raises a descriptive error up front instead of an
    unresolved-column failure inside the groupBy."""
    from data_integration_pipelines_spark.operators.boilerplate import (
        heavy_segment_hashes,
    )

    segs = doc_segments(_docs(spark, [(1, "a b c d e f")])).withColumn(
        "__h", F.xxhash64("seg")
    )
    with pytest.raises(ValueError, match="__h2"):
        heavy_segment_hashes(segs)
    # the mirrored direction: __h2 without __h
    segs2 = doc_segments(_docs(spark, [(1, "a b c d e f")])).withColumn(
        "__h2", F.xxhash64("seg", F.lit(1))
    )
    with pytest.raises(ValueError, match="__h"):
        heavy_segment_hashes(segs2)

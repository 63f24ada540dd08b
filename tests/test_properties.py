"""Property-based tests (hypothesis): Spark operators vs pure-Python
reference implementations on randomized inputs. Derandomized so runs
are reproducible."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

# --- sessionize -----------------------------------------------------------

GAP_US = 30 * 60 * 1_000_000
BASE = dt.datetime(2024, 1, 1)


def _py_sessions(events: list[tuple[int, int]]) -> dict[int, int]:
    """events = [(user_id, offset_us)]; returns user -> n_sessions."""
    by_user: dict[int, list[int]] = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    out = {}
    for u, ts in by_user.items():
        ts.sort()
        n = 1
        for a, b in zip(ts, ts[1:]):
            if b - a > GAP_US:
                n += 1
        out[u] = n
    return out


event_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # user_id
        st.integers(min_value=0, max_value=6 * 3600 * 1_000_000),  # offset_us
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=25, deadline=None, derandomize=True)
@given(event_lists)
def test_sessionize_matches_python(spark, events):
    expected = _py_sessions(events)
    rows = [
        (i, int(u), BASE + dt.timedelta(microseconds=t))
        for i, (u, t) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    from data_integration_pipelines_spark.streaming.sessions import session_stats

    got = {
        r["user_id"]: r["n_sessions"] for r in session_stats(df).collect()
    }
    assert got == expected


# --- transitive closure ---------------------------------------------------


def _py_closure(edges: list[tuple[int, int]]) -> set[tuple[int, int]]:
    """edges = [(child, parent)] forming a forest; returns
    (ancestor, descendant) pairs (excluding self)."""
    parent = dict(edges)
    out = set()
    for child in parent:
        anc = parent.get(child)
        while anc is not None:
            out.add((anc, child))
            anc = parent.get(anc)
    return out


@st.composite
def forests(draw):
    """Random forest as child->parent edges: node i's parent is drawn
    from nodes < i (acyclic by construction) or None (root)."""
    n = draw(st.integers(min_value=2, max_value=20))
    edges = []
    for child in range(1, n):
        parent = draw(st.one_of(st.none(), st.integers(0, child - 1)))
        if parent is not None:
            edges.append((child, parent))
    return edges


@settings(max_examples=25, deadline=None, derandomize=True)
@given(forests())
def test_transitive_closure_matches_python(spark, edges):
    from data_integration_pipelines_spark.operators.closure import (
        transitive_closure,
    )

    expected = _py_closure(edges)
    if not edges:
        return
    df = spark.createDataFrame(edges, "child int, parent int")
    got = {
        (r["ancestor"], r["node"]) for r in transitive_closure(df).collect()
    }
    assert got == expected


def test_chunking_covers_every_token_with_exact_overlap(spark):
    """chunk_documents invariants on synthetic docs of every boundary
    length: full coverage, stride spacing, only the last chunk short."""
    from data_integration_pipelines_spark.plans.queries_curation import (
        chunk_documents,
    )

    # lengths straddling the chunk/stride boundaries (chunk=32, stride=24)
    lengths = [1, 8, 23, 24, 25, 31, 32, 33, 55, 56, 57, 80, 100]
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)))
        for i, n in enumerate(lengths)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.createOrReplaceTempView("chunk_prop_docs")

    # run the same operator logic the registered query uses, on our frame
    import data_integration_pipelines_spark.plans.queries_curation as qc
    from pyspark.sql import functions as F

    orig = qc._docs
    qc._docs = lambda spark, sf_dir: df
    try:
        got = chunk_documents(spark, "ignored").collect()
    finally:
        qc._docs = orig

    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_tokens))
    for i, n in enumerate(lengths):
        chunks = sorted(by_doc[i])
        idxs = [c for c, _ in chunks]
        sizes = [s for _, s in chunks]
        assert idxs == list(range(len(chunks)))  # contiguous indices
        # every chunk but the last is full
        assert all(s == 32 for s in sizes[:-1])
        assert 1 <= sizes[-1] <= 32
        # coverage: last chunk reaches the final token
        last_start = (len(chunks) - 1) * 24
        assert last_start + sizes[-1] == n
        # no fully-redundant tail: each chunk after the first starts
        # before the previous chunk ended (overlap) but adds new tokens
        if len(chunks) > 1:
            assert last_start < n <= last_start + 32


def test_asof_join_matches_naive_on_random_data(spark):
    """asof_join (union+window) == naive per-left-row argmax of
    right.ts <= left.ts, on random keyed event times with ties."""
    import random

    from data_integration_pipelines_spark.operators.temporal import asof_join

    rng = random.Random(23)
    left = [
        (rng.randint(0, 5), rng.randint(0, 50), i) for i in range(120)
    ]
    right = {}
    for j in range(80):
        k, t = rng.randint(0, 5), rng.randint(0, 50)
        right[(k, t)] = float(j)  # unique per (key, ts)
    ldf = spark.createDataFrame(left, "k int, ts int, lid int")
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in right.items()], "k int, ts int, payload double"
    )
    got = {
        r.lid: (r.payload, r["__matched_ts"])
        for r in asof_join(ldf, rdf, ["k"], "ts", ["payload"]).collect()
    }
    for k, ts, lid in left:
        cands = [(t, v) for (rk, t), v in right.items() if rk == k and t <= ts]
        want = max(cands) if cands else None
        if want is None:
            assert got[lid] == (None, None), lid
        else:
            assert got[lid] == (want[1], want[0]), lid


@settings(max_examples=12, deadline=None, derandomize=True)
@given(
    st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij".split()), min_size=0, max_size=12),
        min_size=0,
        max_size=14,
    )
)
def test_jaccard_pairs_match_python_bruteforce(spark, docs):
    """jaccard_pairs (prefix-filtered, inline-verified) must equal the
    brute-force all-pairs 3-gram Jaccard on arbitrary tiny corpora —
    including empty docs, docs shorter than n, and identical docs."""
    from data_integration_pipelines_spark.operators.dedup import jaccard_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(2)
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.5).collect()
    }

    def shingles(toks):
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    want = {}
    for i, a in enumerate(docs):
        for j in range(i + 1, len(docs)):
            sa, sb = shingles(a), shingles(docs[j])
            if not sa or not sb:
                continue
            jac = len(sa & sb) / len(sa | sb)
            if jac >= 0.5:
                want[(i, j)] = round(jac, 9)
    assert got == want


# --- bloom prefilter -------------------------------------------------------

_key_sets = st.tuples(
    st.sets(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=60),
    st.sets(st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=120),
)


@settings(max_examples=15, deadline=None, derandomize=True)
@given(_key_sets)
def test_bloom_prefilter_never_false_negative(spark, keysets):
    """For ANY build/probe key sets (negatives, overlaps, disjoint):
    every probe key in the build set survives the prefilter, and the
    prefilter ⨝ build equals the plain probe ⨝ build exactly."""
    from data_integration_pipelines_spark.operators.bloom import bloom_prefilter

    build_keys, probe_keys = keysets
    build = spark.createDataFrame([(k,) for k in build_keys], "key long")
    probe = spark.createDataFrame(
        [(k,) for k in probe_keys] or [(0,)], "k long"
    ) if probe_keys else spark.createDataFrame([], "k long")
    kept = {r.k for r in bloom_prefilter(probe, build, "k", "key", m_bits=1 << 12, k=3).collect()}
    members = probe_keys & build_keys
    assert members <= kept  # lossless reject
    assert kept <= probe_keys if probe_keys else kept == set()


# --- retraction-aware incremental join --------------------------------------

_histories = st.lists(
    st.tuples(
        st.sampled_from("ab"),            # which relation
        st.integers(min_value=0, max_value=5),   # key
        st.integers(min_value=0, max_value=3),   # value
        st.booleans(),                    # retraction?
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=6, deadline=None, derandomize=True)
@given(_histories)
def test_mult_delta_join_equals_net_recompute(spark, history):
    """For ANY interleaved insert/retract history (retractions only of
    rows currently present), folding the delta join batch-by-batch
    equals the bag join over the NET relations."""
    from collections import Counter

    from data_integration_pipelines_spark.operators.incremental import (
        fold_join_batches_mult,
        with_mult,
    )

    net = {"a": Counter(), "b": Counter()}
    ops = []
    for rel, k, v, retract in history:
        if retract and net[rel][(k, v)] == 0:
            retract = False  # invalid retraction becomes an insert
        net[rel][(k, v)] += -1 if retract else 1
        ops.append((rel, (k, v), -1 if retract else 1))

    a_batches, b_batches = [], []
    for rel, row, mult in ops:
        if rel == "a":
            a_batches.append(
                with_mult(spark.createDataFrame([row], "k long, va long"), mult)
            )
            b_batches.append(
                with_mult(spark.createDataFrame([], "k long, vb long"))
            )
        else:
            a_batches.append(
                with_mult(spark.createDataFrame([], "k long, va long"))
            )
            b_batches.append(
                with_mult(spark.createDataFrame([row], "k long, vb long"), mult)
            )

    view = fold_join_batches_mult(a_batches, b_batches, ["k"])
    actual = Counter()
    if view is not None:
        for r in view.collect():
            actual[(r.k, r.va, r.vb)] += r["__mult"]
    want = Counter()
    for (ka, va), ma in net["a"].items():
        for (kb, vb), mb in net["b"].items():
            if ka == kb and ma != 0 and mb != 0:
                want[(ka, va, vb)] += ma * mb
    want = Counter({k_: m for k_, m in want.items() if m != 0})
    assert actual == want


@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    st.lists(
        st.sampled_from(["apple", "pear", "kiwi", "plum", "fig", "date"]),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_cms_one_sided_and_merge_invariant(spark, values, n_splits):
    """Count-min over ANY multiset: (a) estimate >= true count for
    every value, exact when width >> distinct values; (b) folding the
    multiset through any partition into per-slice grids merges to the
    same grid as one pass (the mergeable-partials contract under
    arbitrary batching)."""
    from collections import Counter

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from data_integration_pipelines_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    df = spark.createDataFrame([Row(i=i, v=v) for i, v in enumerate(values)])
    wide = cms_build(df.select("v"), "v", width=512, depth=3)
    probes = spark.createDataFrame([Row(v=v) for v in sorted(set(values))])
    est = {
        r.v: r.cms_est
        for r in cms_estimate(wide, probes, "v", width=512, depth=3).collect()
    }
    truth = Counter(values)
    assert est == dict(truth)  # 512 buckets, <=6 values: exact

    tight_parts = [
        cms_build(df.filter(F.col("i") % n_splits == k).select("v"), "v", width=4, depth=2)
        for k in range(n_splits)
    ]
    merged = {
        (r.d, r.bucket): r.cnt for r in cms_merge(*tight_parts).collect()
    }
    one_pass = {
        (r.d, r.bucket): r.cnt
        for r in cms_build(df.select("v"), "v", width=4, depth=2).collect()
    }
    assert merged == one_pass


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    st.integers(min_value=-12_000_000, max_value=12_000_000),
    st.integers(min_value=1, max_value=20_000),
)
def test_round_half_away_matches_duckdb_round(s, n):
    """The k-means centroid update relies on _round_half_away mirroring
    DuckDB's ROUND(double) EXACTLY, including representation edges
    where floor(x+0.5) overshoots. Differential over the actual
    centroid-update expression shape: round(CAST(s AS DOUBLE)*100/n)."""
    import duckdb

    from data_integration_pipelines_spark.operators.clustering import (
        _round_half_away,
    )

    py = _round_half_away(float(s) * 100 / n)
    db = duckdb.sql(
        f"SELECT CAST(ROUND(CAST({s} AS DOUBLE) * 100 / {n}) AS BIGINT)"
    ).fetchone()[0]
    assert py == db, (s, n, py, db)


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=2, max_size=3),
)
def test_z_value_n_roundtrip(spark, coords):
    """Morton interleave is a bijection: de-interleaving the z-value in
    Python recovers every coordinate exactly (bits=8 domain)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from data_integration_pipelines_spark.sources.zorder import z_value_n

    d = len(coords)
    df = spark.createDataFrame([Row(**{f"c{j}": v for j, v in enumerate(coords)})])
    z = df.select(
        z_value_n([F.col(f"c{j}") for j in range(d)], bits=8).alias("z")
    ).first()["z"]
    back = [0] * d
    for i in range(8):
        for j in range(d):
            back[j] |= ((z >> (i * d + j)) & 1) << i
    assert back == coords


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([1, 2, 4, 6]),
)
def test_quantized_tri_engine_equivalence(spark, vals, decimals):
    """The hash-proof output contract's core claim: quantized() (Spark
    Column), quantized_sql() (DuckDB) and np_quantized() (numpy) give
    the IDENTICAL int64 for the same double bits — the whole r5
    correctness surface rests on this expression being one function
    across three engines."""
    import duckdb
    import numpy as np
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from data_integration_pipelines_spark.functions.quantize import (
        np_quantized,
        quantized,
        quantized_sql,
    )

    df = spark.createDataFrame([Row(x=float(v)) for v in vals])
    got_spark = [
        r[0]
        for r in df.select(quantized(F.col("x"), decimals)).collect()
    ]
    got_np = list(np_quantized(np.array(vals, dtype=np.float64), decimals))
    con = duckdb.connect()
    got_db = [
        con.execute(
            f"SELECT {quantized_sql('x', decimals)} "
            "FROM (SELECT CAST(? AS DOUBLE) AS x)",
            [float(v)],
        ).fetchone()[0]
        for v in vals
    ]
    assert got_spark == got_np == got_db, (vals, decimals)


# --- BPE merge fold & encode ----------------------------------------------


def _py_apply_merge(toks, a, b):
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


@settings(max_examples=12, deadline=None, derandomize=True)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "ab", "ba"]), min_size=0, max_size=8),
        min_size=1,
        max_size=24,
    ),
    st.sampled_from([("a", "a"), ("a", "b"), ("ab", "a"), ("b", "ab")]),
)
def test_bpe_apply_merge_matches_python_fold(spark, arrays, pair):
    """The JVM higher-order aggregate fold in operators/bpe.apply_merge
    must equal the greedy left-to-right non-overlapping Python scan on
    arbitrary token runs — including empty arrays, overlapping-run
    cases (aaa under (a,a)) and multi-char symbols that embed the left
    symbol as a substring (the F.get NULL-tail and string-equality
    edges)."""
    from pyspark.sql import functions as F

    from data_integration_pipelines_spark.operators.bpe import apply_merge

    df = spark.createDataFrame([(a,) for a in arrays], "tokens array<string>")
    got = [
        r[0]
        for r in df.select(apply_merge(F.col("tokens"), *pair)).collect()
    ]
    assert got == [_py_apply_merge(a, *pair) for a in arrays]


@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=7),
        min_size=1,
        max_size=30,
    )
)
def test_bpe_encode_matches_sequential_reference(spark, words):
    """bpe_encode with a reference-trained merge list must tokenize
    every word exactly as sequential rank-order merge application does
    (the trainer's own semantics), for random corpora over a small
    alphabet — where same-symbol runs and merge-chains (a+b -> ab,
    ab+c -> abc) are dense."""
    from data_integration_pipelines_spark.operators.bpe import EOW, bpe_encode
    from tests.test_bpe import ref_bpe_train

    corpus = [" ".join(words)]
    merges, _ = ref_bpe_train(corpus, n_merges=8, min_freq=2)
    rules = [(m[1], m[2]) for m in merges]

    def py_encode(word):
        toks = list(word) + [EOW]
        for a, b in rules:
            toks = _py_apply_merge(toks, a, b)
        return toks

    df = spark.createDataFrame([(w,) for w in set(words)], "text string")
    got = {r["text"]: r["bpe_tokens"] for r in bpe_encode(df, rules).collect()}
    assert got == {w: py_encode(w) for w in set(words)}


# --- line-mode boilerplate removal ----------------------------------------

_line = st.lists(
    st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=4
).map(" ".join)
_multiline_text = st.lists(_line, min_size=1, max_size=5).map("\n".join)


@settings(max_examples=20, deadline=None, derandomize=True)
@given(st.lists(_multiline_text, min_size=1, max_size=8))
def test_line_removal_matches_python(spark, texts):
    """remove_boilerplate_segments(unit='line') against a pure-Python
    recount on random multi-line corpora over a tiny alphabet (dense
    line collisions, empty lines, within-doc repeats): per-doc line
    counts, removed counts and the cleaned '\\n'-joined md5 must all
    agree — the whole pipeline (128-bit decision keys, whole-line
    drops, order-preserving reassembly) is integer/md5-exact, no
    float edges."""
    import hashlib

    from data_integration_pipelines_spark.operators.boilerplate import (
        remove_boilerplate_segments,
    )

    min_df = 2
    counts: dict[str, int] = {}
    for t in texts:
        for line in t.split("\n"):
            counts[line] = counts.get(line, 0) + 1
    heavy = {line for line, c in counts.items() if c >= min_df}
    expected = {}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [line for line in lines if line not in heavy]
        expected[i] = (
            len(lines),
            len(lines) - len(kept),
            hashlib.md5("\n".join(kept).encode()).hexdigest(),
        )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.n_segments, r.n_removed, r.cleaned_md5)
        for r in remove_boilerplate_segments(
            df, unit="line", min_df=min_df
        ).collect()
    }
    assert got == expected

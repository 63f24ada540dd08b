"""Gopher repetition-rule tests: hand-computed signal values on crafted
documents, threshold-gate branch coverage, and fixture-corpus
invariants (plans/queries_text.py Gopher section — Rae et al. 2021
arXiv:2112.11446 Table A1 recast; oracle parity is covered by the
parametrized sweep in test_queries_oracle.py)."""

from __future__ import annotations

from data_integration_pipelines_spark.plans import REGISTRY
from data_integration_pipelines_spark.operators.gopher import (
    GOPHER_RULES,
    gopher_filter_frame,
    gopher_signals_frame,
)


def _sig(spark, text: str):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return gopher_signals_frame(df).collect()[0]


class TestSignalsHandComputed:
    def test_single_line_top_grams(self, spark):
        # tokens [a b a b a b]: 'a b'x3 'b a'x2; 3-grams tie at 2 ->
        # greatest gram text 'b a b'; 4-gram 'a b a b'x2; no dup 5+.
        r = _sig(spark, "a b a b a b")
        assert r.n_lines == 1 and r.total_chars == 11
        assert r.dup_line_frac_e4 == 0
        assert r.dup_line_char_frac_e4 == 0
        assert r.top_2gram_char_frac_e4 == 8182  # e4(3*3/11)
        assert r.top_3gram_char_frac_e4 == 9091  # e4(2*5/11), tie->'b a b'
        assert r.top_4gram_char_frac_e4 == 12727  # e4(2*7/11) — overlap >1
        assert r.dup_5gram_char_frac_e4 == 0
        assert r.dup_10gram_char_frac_e4 == 0

    def test_duplicate_lines(self, spark):
        # lines [x, x, 'y y y y y', z]: 4 lines 3 distinct; chars 12
        # total, 11 distinct; top 2-gram 'y y'x4 over 15 total chars.
        r = _sig(spark, "x\nx\ny y y y y\nz")
        assert r.n_lines == 4 and r.total_chars == 15
        assert r.dup_line_frac_e4 == 2500  # (4-3)/4
        assert r.dup_line_char_frac_e4 == 833  # e4(1/12)
        assert r.top_2gram_char_frac_e4 == 8000  # e4(4*3/15)

    def test_dup_gram_occurrence_mass(self, spark):
        # body of 6 tokens repeated on a second line: every 5-gram and
        # 6-gram of the body occurs twice (plus the line-crossing
        # grams, which occur once) -> dup mass = (2-1)*chars per
        # repeated distinct gram.
        body = "u v w x y z"
        r = _sig(spark, body + "\n" + body)
        total = 2 * len(body) + 1
        # 5-grams 'u v w x y' and 'v w x y z' each twice: mass 9+9
        assert r.dup_5gram_char_frac_e4 == round(18 / total * 10000)
        # 6-gram = the whole body, twice: mass 11
        assert r.dup_6gram_char_frac_e4 == round(11 / total * 10000)
        assert r.dup_7gram_char_frac_e4 == 0  # crossing grams unique
        assert r.dup_line_frac_e4 == 5000

    def test_short_doc_no_grams(self, spark):
        # 1-token doc: no n-grams at any n — masses coalesce to 0.
        r = _sig(spark, "lonely")
        assert r.top_2gram_char_frac_e4 == 0
        assert r.dup_10gram_char_frac_e4 == 0


class TestFilterGate:
    def test_failing_rules_named_in_order(self, spark):
        df = spark.createDataFrame(
            [(0, "x\nx\nx\nb")], "doc_id long, text string"
        )
        r = gopher_filter_frame(gopher_signals_frame(df)).collect()[0]
        assert not r.keep and r.n_fails >= 2
        names = r.fail_rules.split(",")
        assert "dup_line" in names and "dup_line_char" in names
        order = [n for n, _, _ in GOPHER_RULES]
        assert names == sorted(names, key=order.index)  # fixed rule order

    def test_clean_doc_keeps(self, spark):
        # needs realistic length: on a tiny doc even a once-occurring
        # top gram exceeds the 0.20 char fraction (Gopher pairs these
        # rules with a min-word-count gate for exactly this reason)
        text = " ".join(f"word{i:02d}" for i in range(60))
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        r = gopher_filter_frame(gopher_signals_frame(df)).collect()[0]
        assert r.keep and r.n_fails == 0 and r.fail_rules == ""

    def test_thresholds_match_published_table(self):
        # Gopher Table A1 cutoffs, e4 integer domain.
        t = {name: thr for name, _, thr in GOPHER_RULES}
        assert t["dup_line"] == 3000 and t["dup_line_char"] == 2000
        assert (t["top_2gram"], t["top_3gram"], t["top_4gram"]) == (
            2000, 1800, 1600,
        )
        assert [t[f"dup_{n}gram"] for n in range(5, 11)] == [
            1500, 1400, 1300, 1200, 1100, 1000,
        ]


class TestFixtureCorpus:
    def test_derived_corpus_branches(self, spark, sf_small):
        rows = REGISTRY["gopher_repetition_filter"].fn(spark, sf_small).collect()
        assert rows, "empty filter output"
        by_id = {r.doc_id: r for r in rows}
        six = [r for r in rows if r.doc_id % 6 == 0]
        # doubled banner + duplicated body -> >=2 dup lines of >=5:
        # dup_line_frac >= 2/5 > 0.30, so every %6 doc fails the gate.
        assert six and all(not r.keep for r in six)
        assert all("dup_line" in r.fail_rules for r in six)
        # the gate keeps a nontrivial slice and rejects a nontrivial
        # slice — thresholds actually discriminate on this corpus
        kept = sum(r.keep for r in rows)
        assert 0 < kept < len(rows)
        # signal columns pass through the gate unchanged
        sig = {
            r.doc_id: r
            for r in REGISTRY["gopher_repetition_signals"]
            .fn(spark, sf_small)
            .collect()
        }
        some = list(by_id)[:20]
        for d in some:
            for _, col, _ in GOPHER_RULES:
                assert getattr(by_id[d], col) == getattr(sig[d], col), (d, col)

    def test_line_fractions_bounded(self, spark, sf_small):
        rows = REGISTRY["gopher_repetition_signals"].fn(spark, sf_small).collect()
        for r in rows:
            assert 0 <= r.dup_line_frac_e4 <= 10000
            assert 0 <= r.dup_line_char_frac_e4 <= 10000
            assert r.n_lines >= 2  # body + footer always present


def _doc_sig(spark, text: str):
    from data_integration_pipelines_spark.operators.gopher import (
        gopher_doc_rules_frame,
    )

    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return gopher_doc_rules_frame(df).collect()[0]


class TestDocRulesHandComputed:
    def test_line_shape_signals(self, spark):
        # 4 lines: 2 bullet-started, 1 ellipsis-ended.
        r = _doc_sig(spark, "- alpha\n- beta\nplain line\nread more...")
        assert r.bullet_line_frac_e4 == 5000
        assert r.ellipsis_line_frac_e4 == 2500
        # the '...' also counts 1 symbol occurrence over 8 words
        assert r.ellipsis_ratio_e4 == 1250
        assert not r.keep  # word_count (<50) at minimum
        assert "word_count" in r.fail_rules

    def test_symbol_and_alpha_signals(self, spark):
        # 2 hash chars over 3 words; 1 of 3 words lacks an alpha char
        # (so alpha frac 6667 < 8000 -> alpha_words fails too).
        r = _doc_sig(spark, "# wordy #")
        assert r.hash_ratio_e4 == 6667
        assert r.alpha_word_frac_e4 == 3333
        assert "symbol_ratio" in r.fail_rules
        assert "alpha_words" in r.fail_rules

    def test_stop_word_gate(self, spark):
        base = " ".join(f"w{i}" for i in range(60))
        # 0 stop hits -> fails; appending a prose line with >=2 -> passes
        r0 = _doc_sig(spark, base)
        assert r0.n_stop_hits == 0 and "stop_words" in r0.fail_rules
        r1 = _doc_sig(spark, base + " note that the results have merit")
        assert r1.n_stop_hits >= 2 and "stop_words" not in r1.fail_rules

    def test_mean_word_len_bounds(self, spark):
        from data_integration_pipelines_spark.operators.gopher import (
            GOPHER_DOC_RULES,
        )

        names = [n for n, _ in GOPHER_DOC_RULES]
        assert names == [
            "word_count", "mean_word_len", "symbol_ratio", "bullet_lines",
            "ellipsis_lines", "alpha_words", "stop_words",
        ]
        # 60 single-char words: mean len 1 < 3 chars
        r = _doc_sig(spark, " ".join("a" * 1 for _ in range(60)))
        assert r.mean_word_len_e4 == 10000
        assert "mean_word_len" in r.fail_rules


class TestFullFilter:
    def test_verdict_composition(self, spark, sf_small):
        rows = REGISTRY["gopher_full_filter"].fn(spark, sf_small).collect()
        assert rows
        for r in rows:
            assert r.n_fails == r.rep_n_fails + r.doc_n_fails
            assert r.keep == (r.n_fails == 0)
            if r.rep_n_fails and r.doc_n_fails:
                # repetition rules listed first, then document rules
                names = r.fail_rules.split(",")
                from data_integration_pipelines_spark.operators.gopher import (
                    GOPHER_DOC_RULES,
                    GOPHER_RULES,
                )

                rep_names = {n for n, _, _ in GOPHER_RULES}
                k = r.rep_n_fails
                assert all(n in rep_names for n in names[:k])
                assert all(n not in rep_names for n in names[k:])
        # menu pages (%11) always fail the bullet rule
        eleven = [r for r in rows if r.doc_id % 11 == 0]
        assert eleven and all("bullet_lines" in r.fail_rules for r in eleven)
        kept = sum(r.keep for r in rows)
        assert 0 < kept < len(rows)

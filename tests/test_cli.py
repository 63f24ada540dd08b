"""CLI entry points (cli.py) — in-process invocation, report files out.

Mirrors how the reference is actually operated: every pipeline is an
argparse batch job (ref src/arguments.py:12-52). The CLI is the
"switchable front door" parity surface, so each command must run end
to end and leave the reference's report formats behind."""

from __future__ import annotations

import csv
import json
import os
import zipfile

from data_integration_pipelines_spark.cli import main


def _run(tmp_path, *argv) -> str:
    out = str(tmp_path / "out")
    rc = main([*argv, "--sf-dir", "/root/testdata/sf0.001", "--output-dir", out])
    assert rc == 0
    return out


def _csv_rows(path: str) -> list[dict]:
    # single_file sinks write a directory with one part csv
    if os.path.isdir(path):
        part = [f for f in os.listdir(path) if f.endswith(".csv")][0]
        path = os.path.join(path, part)
    with open(path, newline="") as fh:
        return list(csv.DictReader(fh))


class TestCLI:
    def test_trace_audit_reports(self, spark, tmp_path):
        out = _run(tmp_path, "trace-audit")
        rows = _csv_rows(os.path.join(out, "trace_audit.csv"))
        assert rows and set(rows[0]) >= {"id", "bucket", "passed", "has_nwb"}
        # deprecated resources (orderkey % 50 == 0) never appear
        assert all(int(r["id"].split("-")[1]) % 50 != 0 for r in rows)
        errors = json.load(open(os.path.join(out, "bucket_errors.json")))
        assert errors and all("n_errors" in v for v in errors.values())
        # the workbook is a real OOXML zip with one sheet per bucket
        with zipfile.ZipFile(os.path.join(out, "trace_audit.xlsx")) as z:
            sheets = [n for n in z.namelist() if n.startswith("xl/worksheets/")]
            assert len(sheets) == len(errors)

    def test_trace_audit_curated_filter(self, spark, tmp_path):
        out_all = _run(tmp_path / "a", "trace-audit", "--curated", "both")
        out_cur = _run(tmp_path / "b", "trace-audit", "--curated", "yes")
        n_all = len(_csv_rows(os.path.join(out_all, "trace_audit.csv")))
        n_cur = len(_csv_rows(os.path.join(out_cur, "trace_audit.csv")))
        assert 0 < n_cur < n_all

    def test_schema_audit(self, spark, tmp_path):
        out = _run(tmp_path, "schema-audit")
        rows = _csv_rows(os.path.join(out, "schema_audit.csv"))
        assert rows and set(rows[0]) >= {"bucket", "type", "n_resources"}

    def test_morphology_quality(self, spark, tmp_path):
        out = _run(tmp_path, "morphology-quality")
        tsv_dir = os.path.join(out, "morphology_report.tsv")
        part = [f for f in os.listdir(tsv_dir) if f.endswith(".csv")][0]
        with open(os.path.join(tsv_dir, part)) as fh:
            header = fh.readline().strip().split("\t")
        assert "file" in header and "n_points" in header

    def test_index_discrepancy(self, spark, tmp_path):
        out = _run(tmp_path, "index-discrepancy")
        rows = _csv_rows(os.path.join(out, "index_discrepancy.csv"))
        # 3 indices -> 6 ordered pairs; 'sparql' is the superset so
        # nothing is ever only-in-es/search relative to it
        assert len(rows) == 6
        by_pair = {(r["index_a"], r["index_b"]): int(r["only_in_a"]) for r in rows}
        assert by_pair[("es", "sparql")] == 0
        assert by_pair[("sparql", "es")] > 0

    def test_query_command_writes_csv(self, spark, tmp_path):
        out = _run(tmp_path, "query", "top_k")
        rows = _csv_rows(os.path.join(out, "top_k.csv"))
        assert len(rows) == 10

    def test_unknown_query_rejected(self, tmp_path):
        rc = main(["query", "no_such_query", "--output-dir", str(tmp_path)])
        assert rc == 2

    def test_morphology_quality_on_real_swc_dir(self, spark, tmp_path):
        """--swc-dir path on the reference's genuine SWC test files."""
        import pytest as _pytest

        src = "/root/reference/data/swcs"
        if not os.path.isdir(src):
            _pytest.skip("reference SWC data not present")
        import shutil

        swc_dir = tmp_path / "swcs"
        swc_dir.mkdir()
        for name in sorted(os.listdir(src))[:2]:
            shutil.copy(os.path.join(src, name), swc_dir / name)
        out = str(tmp_path / "out")
        rc = main(
            ["morphology-quality", "--swc-dir", str(swc_dir),
             "--sf-dir", "/root/testdata/sf0.001", "--output-dir", out]
        )
        assert rc == 0
        tsv_dir = os.path.join(out, "morphology_report.tsv")
        part = [f for f in os.listdir(tsv_dir) if f.endswith(".csv")][0]
        with open(os.path.join(tsv_dir, part)) as fh:
            lines = fh.read().strip().splitlines()
        assert len(lines) == 3  # header + one row per file

    def test_annotate_store_lifecycle(self, spark, tmp_path):
        """create -> keep -> deprecate across three runs (S17: _rev
        bumps only on real change, vanished targets tombstoned)."""
        import shutil

        src = "/root/reference/data/swcs"
        if not os.path.isdir(src):
            import pytest as _pytest

            _pytest.skip("reference SWC data not present")
        names = sorted(os.listdir(src))[:2]
        two = tmp_path / "two"
        two.mkdir()
        for n in names:
            shutil.copy(os.path.join(src, n), two / n)
        one = tmp_path / "one"
        one.mkdir()
        shutil.copy(os.path.join(src, names[0]), one / names[0])
        store = str(tmp_path / "store")
        base = ["--sf-dir", "/root/testdata/sf0.001"]

        assert main(["annotate", "--store", store, "--swc-dir", str(two), *base]) == 0
        assert main(["annotate", "--store", store, "--swc-dir", str(two), *base]) == 0
        assert main(["annotate", "--store", store, "--swc-dir", str(one), *base]) == 0

        from data_integration_pipelines_spark.streaming.upsert import read_store

        rows = {r.target_id: r for r in read_store(spark, store).collect()}
        assert len(rows) == 2
        kept = [r for r in rows.values() if not r._deprecated]
        dead = [r for r in rows.values() if r._deprecated]
        assert len(kept) == 1 and len(dead) == 1
        # unchanged metrics across runs 1-2 never bumped the revision
        assert kept[0]._rev == 1
        # the tombstone is a real update (rev 2), stamped with run 3
        assert dead[0]._rev == 2 and dead[0].run == 3

    def test_stream_windows(self, spark, tmp_path):
        """availableNow streaming drain == the batch windowed counts."""
        out = _run(tmp_path, "stream-windows")
        rows = _csv_rows(os.path.join(out, "stream_windows.csv"))
        assert rows and set(rows[0]) == {
            "window_start", "event_type", "n_events", "total_value",
        }
        from data_integration_pipelines_spark.catalog import load_table
        from data_integration_pipelines_spark.streaming.events import windowed_counts

        batch = windowed_counts(
            load_table(spark, "/root/testdata/sf0.001", "events")
        ).count()
        assert len(rows) == batch

    def test_store_time_travel(self, spark, tmp_path):
        """read_store(version=N) reads any earlier complete version."""
        import pytest as _pytest

        from data_integration_pipelines_spark.streaming.upsert import read_store

        store = str(tmp_path / "store")
        base = ["--sf-dir", "/root/testdata/sf0.001"]
        assert main(["annotate", "--store", store, *base]) == 0
        assert main(["annotate", "--store", store, *base]) == 0
        v1 = read_store(spark, store, version=1)
        latest = read_store(spark, store)
        assert v1.count() == latest.count()
        assert {r.run for r in v1.select("run").distinct().collect()} == {1}
        with _pytest.raises(KeyError):
            read_store(spark, store, version=99)

    def test_explain_command(self, capsys):
        rc = main(["explain", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001"])
        assert rc == 0
        outp = capsys.readouterr().out
        assert "Physical Plan" in outp and "Exchange" in outp

    def test_curate(self, spark, tmp_path):
        out = _run(tmp_path, "curate")
        funnel = _csv_rows(os.path.join(out, "funnel_report.csv"))
        stages = [r["stage"] for r in funnel]
        assert stages == sorted(stages) and len(stages) == 5
        # monotone: each stage keeps at most the previous stage's docs
        counts = [int(r["n_docs"]) for r in funnel]
        assert all(a >= b for a, b in zip(counts, counts[1:]))
        assert _csv_rows(os.path.join(out, "survivors.csv"))
        assert _csv_rows(os.path.join(out, "contaminated.csv"))

    def test_monitor(self, spark, tmp_path):
        out = _run(tmp_path, "monitor")
        drift = _csv_rows(os.path.join(out, "drift_report.csv"))
        assert drift and {r["verdict"] for r in drift} <= {
            "stable", "drifting", "shifted"
        }
        weights = _csv_rows(os.path.join(out, "mixture_weights.csv"))
        # the new mixture weights are a (basis-point) distribution
        assert abs(sum(int(r["weight_e4"]) for r in weights) - 10000) <= len(weights)
        consensus = _csv_rows(os.path.join(out, "dedup_consensus.csv"))
        assert consensus and {r["verdict"] for r in consensus} <= {
            "both", "text_only", "embedding_only"
        }

    def test_export_shards(self, spark, tmp_path):
        """Deterministic shard membership, in-shard ordering, manifest
        consistent with the files."""
        out = _run(tmp_path, "export-shards", "--shards", "4")
        import json as _json

        shards_dir = os.path.join(out, "shards")
        manifest = _json.load(open(os.path.join(shards_dir, "_manifest.json")))
        assert manifest["n_shards"] == 4
        df = spark.read.parquet(shards_dir)
        total = 0
        from pyspark.sql import functions as F

        for sid, meta in manifest["shards"].items():
            part = df.filter(F.col("__shard") == int(sid))
            rows = part.select("n_tokens", "doc_id").collect()
            total += len(rows)
            assert len(rows) == meta["n_rows"]
            # parquet files preserve write order per shard: sorted
            ordered = [(r.n_tokens, r.doc_id) for r in rows]
            assert ordered == sorted(ordered)
            # shard membership is the documented pure function of the key
            ids = {r.doc_id for r in rows}
            check = df.sparkSession.createDataFrame(
                [(i,) for i in ids], "doc_id long"
            ).select(F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int").alias("s"))
            assert {r.s for r in check.collect()} == {int(sid)}
        assert total == 500

    def test_zorder(self, spark, tmp_path):
        out = _run(tmp_path, "zorder", "events", "event_id", "user_id",
                   "--files", "8")
        zdir = os.path.join(out, "zorder_events")
        df = spark.read.parquet(zdir)
        assert df.count() == spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        ).count()
        from data_integration_pipelines_spark.sources.zorder import zorder_stats

        stats = zorder_stats(zdir, "event_id", "user_id")
        # per-file spans are bounded ON AVERAGE (a curve segment that
        # straddles a quadrant boundary can span one full dimension)
        for c in ("event_id_frac", "user_id_frac"):
            assert sum(r[c] for r in stats) / len(stats) < 0.7, c

    def test_split(self, spark, tmp_path):
        out = _run(tmp_path, "split")
        sdir = os.path.join(out, "splits")
        df = spark.read.parquet(sdir)
        assert df.count() == 500
        assert set(r.split for r in df.select("split").distinct().collect()) == {
            "train", "val", "test",
        }

    def test_profile(self, spark, tmp_path):
        out = _run(tmp_path, "profile", "lineitem")
        rows = {r["col"]: r for r in _csv_rows(os.path.join(out, "profile_lineitem.csv"))}
        assert set(rows) == {
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        }
        q = rows["l_quantity"]
        # numeric min/max must be numeric order, not lexicographic
        assert float(q["min_val"]) <= float(q["max_val"])
        assert int(q["n_nulls"]) == 0 and int(q["n_rows"]) > 0
        assert rows["l_shipdate"]["min_val"].startswith("19")

    def test_profile_unknown_table(self, tmp_path):
        assert main(["profile", "nope", "--output-dir", str(tmp_path)]) == 2


class TestIngestCLI:
    def test_ingest_verdicts_and_counts(self, spark, tmp_path, capsys):
        out = _run(tmp_path, "ingest")
        payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        vdir = os.path.join(out, "ingest_verdicts")
        df = spark.read.parquet(vdir)
        rows = df.collect()
        # batch = doc_id % 10 >= 8 of the sf table; every row classified
        assert all(r.doc_id % 10 >= 8 for r in rows)
        assert set(payload["counts"]) <= {"exact_dup", "near_dup", "novel"}
        assert sum(payload["counts"].values()) == len(rows)
        assert payload["counts"].get("novel", 0) > 0


class TestCompactCLI:
    def test_compact_command(self, spark, tmp_path, capsys):
        out = _run(tmp_path, "compact", "documents", "--target-mb", "64")
        payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert payload["files_after"] >= 1
        assert payload["rows_total"] == 500
        df = spark.read.parquet(os.path.join(out, "compact_documents"))
        assert df.count() == 500


class TestClusterCLI:
    def test_cluster_command(self, spark, tmp_path, capsys):
        out = _run(tmp_path, "cluster", "--k", "4", "--iters", "2")
        payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert len(payload["sizes"]) == 4
        assert sum(payload["sizes"].values()) == 500
        assert payload["inertia_scaled"] > 0
        df = spark.read.parquet(os.path.join(out, "cluster_assignments"))
        assert df.count() == 500
        assert set(df.columns) == {"id", "cluster", "dist"}


class TestIndexCLI:
    def test_index_build_then_query(self, spark, tmp_path, capsys):
        out = _run(tmp_path, "index", "build", "--pivots", "8")
        manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert 1 <= manifest["n_buckets"] <= 8
        _run(tmp_path, "index", "query", "--k", "3", "--query-ids", "100", "101")
        rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
        assert {r["query_id"] for r in rows} == {100, 101}
        assert all(1 <= r["rank"] <= 3 for r in rows)


class TestTokenizerCLI:
    def test_train_then_encode_with_stored_merges(self, spark, tmp_path, capsys):
        out = _run(tmp_path, "tokenizer", "train", "--merges", "10")
        manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert manifest["n_merges"] == 10
        merges = spark.read.parquet(os.path.join(out, "bpe_merges"))
        assert merges.count() == 10
        assert set(merges.columns) == {"rank", "left", "right", "merged", "pair_freq"}

        rc = main(
            [
                "tokenizer",
                "encode",
                "--merges-dir",
                os.path.join(out, "bpe_merges"),
                "--sf-dir",
                "/root/testdata/sf0.001",
                "--output-dir",
                str(tmp_path / "enc"),
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # BPE merges strictly compress the char stream but each word is
        # >= 1 token, so fertility (BPE per ws token) stays >= 1.0
        assert stats["bpe_tokens"] >= stats["ws_tokens"]
        assert stats["fertility_e4"] >= 10000
        enc = spark.read.parquet(str(tmp_path / "enc" / "bpe_tokens"))
        assert enc.count() == 500
        assert set(enc.columns) == {"doc_id", "bpe_tokens"}


class TestTokenizedExport:
    def test_export_shuffled(self, spark, tmp_path):
        """Seeded shuffle export: each shard is ONE file whose row
        order matches the manifest's order-canonical digest, and the
        order is actually shuffled (not id-sorted)."""
        out = _run(tmp_path, "export-shuffled", "--shards", "4", "--seed", "0")
        import glob
        import hashlib
        import json as _json

        import pyarrow.parquet as pq

        shards_dir = os.path.join(out, "shuffled_shards")
        manifest = _json.load(open(os.path.join(shards_dir, "_manifest.json")))
        assert manifest["n_shards"] == 4 and manifest["seed"] == 0
        total = 0
        for sid, meta in manifest["shards"].items():
            files = glob.glob(
                os.path.join(shards_dir, f"__shard={sid}", "*.parquet")
            )
            # repartition(n, __shard) puts every row of a shard in one
            # task, so exactly one file — the row order is well-defined
            assert len(files) == 1
            ids = pq.read_table(files[0], columns=["doc_id"])["doc_id"].to_pylist()
            total += len(ids)
            digest = hashlib.md5(
                ",".join(str(i) for i in ids).encode()
            ).hexdigest()
            assert digest == meta["order_md5"]
            # a ~125-row shard in md5 order is not id-sorted
            assert ids != sorted(ids)
        assert total == 500

    def test_export_shards_tokenized(self, spark, tmp_path, capsys):
        """--tokenize M ships training-ready shards: real BPE token
        arrays, in-shard sort by TRUE token count, and the merge table
        beside the shards; tokens re-encode identically with the
        shipped merges (the handoff is self-contained)."""
        out = _run(
            tmp_path, "export-shards", "--shards", "2", "--tokenize", "8"
        )
        manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert manifest["tokenizer"] == os.path.join(out, "bpe_merges")

        merges_df = spark.read.parquet(manifest["tokenizer"]).orderBy("rank")
        merges = [(r["left"], r["right"]) for r in merges_df.collect()]
        assert len(merges) == 8

        df = spark.read.parquet(os.path.join(out, "shards"))
        assert "bpe_tokens" in df.columns
        from pyspark.sql import functions as F

        rows = df.select("doc_id", "text", "bpe_tokens", "n_tokens").collect()
        assert len(rows) == 500
        assert all(r.n_tokens == len(r.bpe_tokens) for r in rows)

        # re-encoding with the SHIPPED merge table reproduces the
        # exported token arrays exactly
        from data_integration_pipelines_spark.operators.bpe import bpe_encode

        re_enc = {
            r["doc_id"]: r["re_tokens"]
            for r in bpe_encode(
                df.select("doc_id", "text"), merges, out_col="re_tokens"
            ).collect()
        }
        assert all(re_enc[r.doc_id] == list(r.bpe_tokens) for r in rows)


class TestExportSplits:
    def test_export_splits_manifest_and_no_straddling(self, spark, tmp_path):
        """The leakage-safe sink face: split-partitioned parquet whose
        membership matches the _manifest.json digests, and no near-dup
        cluster straddles splits (every doc's split is a pure function
        of its cluster representative)."""
        import hashlib

        out = _run(tmp_path, "export-splits")
        sdir = os.path.join(out, "safe_splits")
        df = spark.read.parquet(sdir)
        assert df.count() == 500
        assert set(
            r.split for r in df.select("split").distinct().collect()
        ) == {"train", "val", "test"}
        with open(os.path.join(sdir, "_manifest.json")) as fh:
            manifest = json.load(fh)
        cells = {
            (c["split"], c["lang"]): (c["n_docs"], c["membership_md5"])
            for c in manifest["splits"]
        }
        got: dict = {}
        for r in df.select("split", "lang", "doc_id").collect():
            got.setdefault((r.split, r.lang), []).append(r.doc_id)
        assert set(got) == set(cells)
        for cell, ids in got.items():
            digest = hashlib.md5(
                ",".join(str(i) for i in sorted(ids)).encode()
            ).hexdigest()
            assert cells[cell] == (len(ids), digest), cell


class TestQualityTrain:
    def test_quality_train_artifacts(self, spark, tmp_path, capsys):
        """The trainer's handoff: CSV history (oracle-certified
        trajectory shape), JSON weights, scored parquet — and the
        three agree with each other."""
        import json as _json

        out = _run(tmp_path, "quality-train", "--iters", "3")
        hist = _csv_rows(os.path.join(out, "quality_train_history.csv"))
        assert [int(r["iter"]) for r in hist] == [1, 2, 3]
        weights = _json.load(open(os.path.join(out, "quality_weights.json")))
        last = hist[-1]
        assert weights["weights"] == [
            int(last["w_bias"]),
            int(last["w_swr"]),
            int(last["w_atl"]),
            int(last["w_ttr"]),
        ]
        assert weights["final_n_miss"] == int(last["n_miss"])
        scored = spark.read.parquet(os.path.join(out, "quality_scored"))
        assert scored.count() == 500
        # iteration 1 misses everything (w=0 start); training improved
        assert int(hist[0]["n_miss"]) == 500
        assert weights["final_n_miss"] < 500


class TestGopherFilterCLI:
    def test_gopher_filter_artifacts(self, spark, tmp_path, capsys):
        """The repetition gate's batch-job face: verdict parquet agrees
        with the operator frames, and the printed summary's counts and
        per-rule histogram agree with the verdict table."""
        import json as _json

        from pyspark.sql import functions as F

        from data_integration_pipelines_spark.catalog import load_table
        from data_integration_pipelines_spark.operators.gopher import (
            gopher_filter_frame,
            gopher_signals_frame,
        )

        out = _run(tmp_path, "gopher-filter")
        summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        verdicts = spark.read.parquet(os.path.join(out, "gopher_verdicts"))
        kept = verdicts.filter(F.col("keep")).count()
        assert summary["kept"] == kept
        assert summary["rejected"] == verdicts.count() - kept
        # histogram totals = sum of per-doc fail counts
        n_fail_sum = (
            verdicts.agg(F.sum("n_fails").alias("s")).collect()[0].s or 0
        )
        assert sum(summary["fail_rule_histogram"].values()) == n_fail_sum
        # parquet verdicts == operator frames run directly
        docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
            "doc_id", "text"
        )
        want = {
            r.doc_id: (r.n_fails, r.keep, r.fail_rules)
            for r in gopher_filter_frame(gopher_signals_frame(docs)).collect()
        }
        got = {
            r.doc_id: (r.n_fails, r.keep, r.fail_rules)
            for r in verdicts.collect()
        }
        assert got == want

    def test_gopher_filter_full_flag(self, spark, tmp_path, capsys):
        """--full runs the complete Table-A1 filter: verdicts carry
        the composed rep/doc fail counts."""
        import json as _json

        out = _run(tmp_path, "gopher-filter", "--full")
        summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        verdicts = spark.read.parquet(os.path.join(out, "gopher_verdicts"))
        assert {"rep_n_fails", "doc_n_fails"} <= set(verdicts.columns)
        assert summary["kept"] + summary["rejected"] == verdicts.count()

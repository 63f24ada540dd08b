"""Named-failure SWC fixtures (reference test-strategy SURVEY §5 item 1:
file names encode the expected failing check), source readers, sinks."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_integration_pipelines_spark.operators.morphology import (
    morphology_flags,
    quality_report,
    tree_metrics,
)
from data_integration_pipelines_spark.sources.binary_files import (
    binary_metadata,
    extract_sweeps,
    read_binary_files,
)
from data_integration_pipelines_spark.sources.resources import (
    normalize_resources,
    read_resources,
    split_store_metadata,
)
from data_integration_pipelines_spark.sources.sinks import sparse_bool, write_tsv
from data_integration_pipelines_spark.sources.swc import normalize_header, read_swc_points

# --- named-failure SWC fixtures -------------------------------------------
# n type x y z radius parent ; type: 1=soma 2=axon 3=basal 4=apical

_SOMA = "1 1 0 0 0 5 -1"

SWC_FIXTURES = {
    "ok_neuron": f"""# ok
{_SOMA}
2 2 5 0 0 4.8 1
3 2 10 0 0 4.5 2
4 2 15 5 0 4.5 3
5 2 15 -5 0 4.5 3
6 3 -5 0 0 4.9 1
7 3 -10 0 0 4.0 6
8 4 0 5 0 4.8 1
9 4 0 10 0 4.0 8
""",
    "zero_radius": f"""{_SOMA}
2 2 5 0 0 0 1
3 2 10 0 0 4 2
""",
    "zero_soma_radius": """1 1 0 0 0 0 -1
2 2 5 0 0 4.9 1
""",
    "z_jump": f"""{_SOMA}
2 2 5 0 0 4.9 1
3 2 6 0 50 4.8 2
""",
    "root_node_jump": f"""{_SOMA}
2 2 50 0 0 4.9 1
3 2 55 0 0 4.8 2
""",
    "dangling_axon": f"""{_SOMA}
2 3 5 0 0 4.9 1
3 2 100 100 100 4.8 -1
4 2 105 100 100 4.7 3
""",
    "zero_length_segments": f"""{_SOMA}
2 2 5 0 0 4.9 1
3 2 5 0 0 4.8 2
""",
    "single_axon": f"""{_SOMA}
2 2 5 0 0 4.9 1
3 2 10 0 0 4.8 2
""",
    "single_basal": f"""{_SOMA}
2 3 5 0 0 4.9 1
3 3 10 0 0 4.8 2
""",
    "multifurcation": f"""{_SOMA}
2 2 5 0 0 4.9 1
3 2 10 0 0 4.8 2
4 2 15 5 0 4.7 3
5 2 15 -5 0 4.7 3
6 2 15 0 5 4.7 3
""",
    "fat_end": f"""{_SOMA}
2 2 5 0 0 2 1
3 2 10 0 0 2 2
4 2 15 0 0 9 3
""",
    "narrow_start": f"""{_SOMA}
2 2 5 0 0 0.5 1
3 2 10 0 0 0.5 2
""",
    "hetero_near_soma": f"""{_SOMA}
2 2 5 0 0 4.9 1
3 3 10 0 0 4.8 2
""",
    "radical_diameter": f"""{_SOMA}
2 2 5 0 0 4.0 1
3 2 10 0 0 1.0 2
4 2 15 0 0 2.5 3
""",
    "flat_neurite": f"""{_SOMA}
2 2 5 0 0 4.9 1
3 2 10 0 0 4.8 2
4 2 15 5 0 4.7 3
""",
    "single_apical": f"""{_SOMA}
2 4 0 5 0 4.9 1
3 4 0 10 0 4.8 2
""",
    "nonflat_neurite": f"""{_SOMA}
2 2 5 0 0 4.9 1
3 2 10 2 3 4.8 2
4 2 15 5 7 4.7 3
""",
}


@pytest.fixture(scope="module")
def swc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("swc")
    for name, content in SWC_FIXTURES.items():
        (d / f"{name}.swc").write_text(content)
    return str(d)


@pytest.fixture(scope="module")
def report(spark, swc_dir):
    points = read_swc_points(spark, swc_dir + "/*.swc")
    rep = quality_report(points)
    return {
        os.path.basename(r.file).removesuffix(".swc"): r.asDict()
        for r in rep.collect()
    }


class TestSWCBattery:
    def test_all_fixtures_read(self, report):
        assert set(report) == set(SWC_FIXTURES)

    def test_ok_neuron_passes_everything(self, report):
        ok = report["ok_neuron"]
        assert ok["n_zero_radius"] == 0
        assert ok["n_zero_soma_radius"] == 0
        assert ok["n_zero_len_segments"] == 0
        assert ok["n_z_jumps"] == 0
        assert ok["n_root_jumps"] == 0
        assert ok["n_multifurcations"] == 0
        assert ok["n_fat_ends"] == 0
        assert ok["n_narrow_starts"] == 0
        assert ok["n_hetero_near_soma"] == 0
        assert ok["has_axon"] and ok["has_basal_dendrite"] and ok["has_apical_dendrite"]
        assert not ok["has_dangling_branch"] and not ok["has_multiple_components"]

    @pytest.mark.parametrize(
        ("fixture", "column", "predicate"),
        [
            ("zero_radius", "n_zero_radius", lambda v: v >= 1),
            ("zero_soma_radius", "n_zero_soma_radius", lambda v: v >= 1),
            ("z_jump", "n_z_jumps", lambda v: v >= 1),
            ("root_node_jump", "n_root_jumps", lambda v: v >= 1),
            ("dangling_axon", "has_dangling_branch", bool),
            ("dangling_axon", "has_multiple_components", bool),
            ("zero_length_segments", "n_zero_len_segments", lambda v: v >= 1),
            ("single_axon", "has_basal_dendrite", lambda v: not v),
            ("single_basal", "has_axon", lambda v: not v),
            ("multifurcation", "n_multifurcations", lambda v: v == 1),
            ("fat_end", "n_fat_ends", lambda v: v >= 1),
            ("narrow_start", "n_narrow_starts", lambda v: v >= 1),
            ("hetero_near_soma", "n_hetero_near_soma", lambda v: v >= 1),
            # 4.0 -> 1.0 is a >= 2x drop; 1.0 -> 2.5 a >= 2x rise
            ("radical_diameter", "n_radical_diameter_changes", lambda v: v == 2),
            ("ok_neuron", "n_radical_diameter_changes", lambda v: v == 0),
            # ok_neuron stems: one axon, one basal + one apical dendrite
            ("ok_neuron", "n_axon_trees", lambda v: v == 1),
            ("ok_neuron", "n_dendritic_trees", lambda v: v == 2),
            ("single_axon", "n_dendritic_trees", lambda v: v == 0),
            # all flat_neurite axon points have z == 0 (extent 0 < tol)
            ("flat_neurite", "n_flat_neurite_types", lambda v: v == 1),
            # genuinely 3-D axon: every axis extent > 0
            ("nonflat_neurite", "n_flat_neurite_types", lambda v: v == 0),
            ("single_apical", "has_apical_dendrite", bool),
            ("single_apical", "has_axon", lambda v: not v),
        ],
    )
    def test_named_failure(self, report, fixture, column, predicate):
        assert predicate(report[fixture][column]), (fixture, column, report[fixture][column])

    def test_tree_metrics_components(self, spark, swc_dir):
        points = read_swc_points(spark, swc_dir + "/dangling_axon.swc")
        row = tree_metrics(points).collect()[0]
        assert row.n_components == 2

    def test_header_synonyms(self):
        assert normalize_header(["n", "T", "x", "y", "z", "r", "PID"]) == [
            "n", "type", "x", "y", "z", "radius", "parent",
        ]
        with pytest.raises(ValueError, match="unknown SWC column"):
            normalize_header(["wat"])


class TestResources:
    def test_normalize_scalar_or_array_and_value_unwrap(self, spark, tmp_path):
        docs = [
            {"id": "r1", "type": "Trace", "coord": {"@value": 1.5}, "_rev": 2,
             "_deprecated": False},
            {"id": "r2", "type": ["Trace", "Dataset"], "coord": 2.5, "_rev": 1,
             "_deprecated": True},
            {"id": "r3", "_rev": 1, "_deprecated": False},
        ]
        p = tmp_path / "res.jsonl"
        p.write_text("\n".join(json.dumps(d) for d in docs))
        df = read_resources(
            spark, str(p), array_fields=("type",), value_fields={"coord": "double"}
        )
        rows = {r.id: r for r in df.collect()}
        assert rows["r1"].type == ["Trace"]
        assert sorted(rows["r2"].type) == ["Dataset", "Trace"]
        assert rows["r3"].type == []
        assert rows["r1"].coord == 1.5  # {"@value": 1.5} unwrapped
        assert rows["r2"].coord == 2.5  # bare scalar cast
        assert rows["r3"].coord is None

    def test_split_store_metadata(self, spark):
        df = spark.createDataFrame(
            [("r1", "x", 1, False)], ["id", "name", "_rev", "_deprecated"]
        )
        user, meta = split_store_metadata(df)
        assert set(user.columns) == {"id", "name"}
        assert set(meta.columns) == {"id", "_rev", "_deprecated"}

    def test_normalize_is_noop_on_regular_columns(self, spark):
        df = spark.createDataFrame([(1, "a")], ["n", "s"])
        got = normalize_resources(df).collect()
        assert got == [(1, "a")] or [(r.n, r.s) for r in got] == [(1, "a")]

    def test_flatten_unflatten_dotted_roundtrip(self, spark):
        from data_integration_pipelines_spark.sources.resources import (
            flatten_dotted,
            unflatten_dotted,
        )

        df = spark.createDataFrame(
            [
                ("r1", {"brainRegion": {"id": "mba/8", "label": "roots"},
                        "layer": "L5"}, ["a", "b"]),
                ("r2", None, []),
            ],
            "id string, "
            "brainLocation struct<brainRegion:struct<id:string,label:string>,"
            "layer:string>, tags array<string>",
        )
        flat = flatten_dotted(df)
        assert flat.columns == [
            "id",
            "brainLocation.brainRegion.id",
            "brainLocation.brainRegion.label",
            "brainLocation.layer",
            "tags",
        ]
        rows = {r["id"]: r for r in flat.collect()}
        assert rows["r1"]["brainLocation.brainRegion.label"] == "roots"
        assert rows["r2"]["brainLocation.layer"] is None

        back = unflatten_dotted(flat)
        assert back.schema == df.schema
        orig = {r.id: r for r in df.collect()}
        got = {r.id: r for r in back.collect()}
        assert got["r1"] == orig["r1"]
        assert got["r2"].brainLocation is None  # all-null struct -> NULL


class TestBinaryAndSinks:
    def test_binary_metadata_and_fake_sweeps(self, spark, tmp_path):
        png = b"\x89PNG\r\n\x1a\n" + b"fakepayload"
        blob = b"justbytes"
        (tmp_path / "a.png").write_bytes(png)
        (tmp_path / "b.bin").write_bytes(blob)
        bdf = read_binary_files(spark, str(tmp_path) + "/*")
        meta = {os.path.basename(r.path): r for r in binary_metadata(bdf).collect()}
        assert meta["a.png"].detected_format == "image/png"
        assert meta["b.bin"].detected_format is None
        assert meta["b.bin"].content_size == len(blob)

        sweeps = extract_sweeps(bdf, use_fake=True)
        pdf = sweeps.toPandas()
        assert set(pdf.columns) == {
            "file", "stimulus_type", "repetition", "sweep_id",
            "channel", "rate", "conversion", "t", "value",
        }
        assert len(pdf) > 0
        # deterministic: same bytes -> same sweeps
        pdf2 = extract_sweeps(bdf, use_fake=True).toPandas()
        assert pdf.sort_values(list(pdf.columns)).equals(
            pdf2.sort_values(list(pdf.columns))
        )

    def test_extract_sweeps_real_hdf5_path(self, spark):
        """S10 real path: the golden NWB-layout fixture (true HDF5
        bytes, native parser — no h5py) flattens to the long sweep
        table with per-sweep stimulus/rate/repetition and both
        channels, distributed through mapInPandas."""
        golden = os.path.join(os.path.dirname(__file__), "fixtures",
                              "golden_sweeps.nwb")
        bdf = read_binary_files(spark, golden)
        pdf = extract_sweeps(bdf).toPandas()
        assert set(pdf["sweep_id"]) == {"sweep0", "sweep1", "sweep2"}
        by_sweep = pdf.groupby("sweep_id")
        assert by_sweep["stimulus_type"].first().tolist() == [
            "IDRest", "APWaveform", "IV",
        ]
        # sweep0 has both channels x 16 samples; sweep1 v-only x 8
        assert len(pdf[pdf.sweep_id == "sweep0"]) == 32
        s1 = pdf[pdf.sweep_id == "sweep1"]
        assert set(s1["channel"]) == {"v"} and len(s1) == 8
        assert (s1["rate"] == 20000.0).all() and (s1["repetition"] == 2).all()
        # time axis derived from rate
        t = sorted(s1["t"])
        assert t[1] - t[0] == pytest.approx(1 / 20000.0)
        # i-channel conversion propagated
        s2 = pdf[pdf.sweep_id == "sweep2"]
        assert (s2["conversion"] == 1e-12).all()

    def test_extract_sweeps_icephys_table_layout(self, spark):
        """S10 second layout (ref lnmc_nwb_visualization.py:16-29):
        hierarchical icephys sweep tables — repetitions ->
        sequential -> simultaneous -> recordings -> response series
        linked by ragged-index columns — flatten to the same long
        schema as the acquisition/sweep* layout."""
        golden = os.path.join(os.path.dirname(__file__), "fixtures",
                              "golden_sweeps_v2.nwb")
        bdf = read_binary_files(spark, golden)
        pdf = extract_sweeps(bdf).toPandas()
        key = pdf.groupby(["repetition", "stimulus_type", "sweep_id", "channel"])
        assert dict(key.size()) == {
            (1, "IDRest", "sweep0", "v"): 6,
            (1, "IDRest", "sweep0", "i"): 6,
            (1, "IDRest", "sweep1", "v"): 4,
            (1, "APWaveform", "sweep2", "v"): 5,
            (2, "IV", "sweep3", "v"): 3,
            (2, "IV", "sweep3", "i"): 3,
        }
        s3 = pdf[(pdf.sweep_id == "sweep3") & (pdf.channel == "i")]
        assert (s3["rate"] == 50000.0).all()
        assert (s3["conversion"] == 1e-12).all()
        t = sorted(s3["t"])
        assert t[1] - t[0] == pytest.approx(1 / 50000.0)
        # values come from the named /acquisition series, in t order
        import numpy as np
        expect = np.round(np.cos(np.arange(3) * 0.2 + 5) * 50.0, 6)
        assert s3.sort_values("t")["value"].tolist() == expect.tolist()

    def test_sparse_bool_tsv(self, spark, tmp_path):
        df = spark.createDataFrame([(1, True), (2, False)], ["id", "ok"])
        rendered = df.select(
            "id", sparse_bool(F.col("ok"), F.lit("FAILED")).alias("cell")
        )
        out = str(tmp_path / "report")
        write_tsv(rendered, out)
        files = [f for f in os.listdir(out) if f.endswith(".csv")]
        content = open(os.path.join(out, files[0])).read()
        assert "FAILED" in content


# --- ASC / Neurolucida source ---------------------------------------------

ASC_UNI = """
((CellBody) (-1 0 0 2) (1 0 0 2))

 ((Dendrite)
  (0 0 0 2)
  (0 5 0 2)
  (
   (-5 5 0 3)
   (
    (-10 5 0 3)
   )
   |
   (6 5 0 3)
   )
  )
"""

ASC_MULTI = """
((CellBody) (-1 0 0 2) (1 0 0 2))
( (Color Blue)
  (Axon)
  (0 5 0 2)
  (2 9 0 2)
  (0 13 0 2)
  (
    (0 13 0 2)
    (4 13 0 2)
    |
    (0 13 0 2)
    (4 13 0 2)
    |
    (0 13 0 2)
    (4 13 0 2)
    |
    (0 13 0 2)
    (4 13 0 2)
  )
)
"""


class TestASCSource:
    def test_parse_unifurcation_grammar(self):
        from data_integration_pipelines_spark.sources.asc import parse_asc_text

        rows = parse_asc_text(ASC_UNI)
        # 2 soma contour points + 5 dendrite points
        assert [(n, t, p) for n, t, _, _, _, _, p in rows] == [
            (1, 1, -1), (2, 1, 1),                      # CellBody chain
            (3, 3, -1), (4, 3, 3),                      # dendrite trunk
            (5, 3, 4), (6, 3, 5),                       # branch A + unifurcation
            (7, 3, 4),                                  # branch B
        ]
        # diameter -> radius halving
        assert rows[0][5] == 1.0 and rows[4][5] == 1.5

    def test_parse_multifurcation_counts_children(self):
        from data_integration_pipelines_spark.sources.asc import parse_asc_text

        rows = parse_asc_text(ASC_MULTI)
        assert len(rows) == 13
        # the Axon header (after a Color attribute) sets type 2
        assert {t for _, t, _, _, _, _, _ in rows[2:]} == {2}
        # node 5 has four children (the multifurcation)
        parents = [p for *_, p in rows]
        assert parents.count(5) == 4

    def test_comments_and_spines_stripped(self):
        from data_integration_pipelines_spark.sources.asc import parse_asc_text

        txt = """
        ((Axon) ; trailing comment
         (0 0 0 2) <(99 99 99 1)>
         (1 0 0 2))
        """
        rows = parse_asc_text(txt)
        assert [(r[2], r[6]) for r in rows] == [(0.0, -1), (1.0, 1)]

    def test_read_asc_points_distributed(self, spark, tmp_path):
        from data_integration_pipelines_spark.sources.asc import read_asc_points

        d = tmp_path / "asc"
        d.mkdir()
        (d / "uni.asc").write_text(ASC_UNI)
        (d / "multi.asc").write_text(ASC_MULTI)
        pts = read_asc_points(spark, str(d) + "/*.asc")
        got = {
            os.path.basename(r.file): r.n
            for r in pts.groupBy("file").agg(F.max("n").alias("n")).collect()
        }
        assert got == {"uni.asc": 7, "multi.asc": 13}

    def test_mixed_dir_battery(self, spark, tmp_path):
        # SWC and ASC in ONE directory -> one points table -> the same
        # battery; n_roots distinguishes multi-form ASC trees
        from data_integration_pipelines_spark.sources.asc import (
            read_morphology_points,
        )

        d = tmp_path / "mixed"
        d.mkdir()
        (d / "uni.asc").write_text(ASC_UNI)
        (d / "chain.swc").write_text("1 1 0 0 0 5 -1\n2 2 5 0 0 4 1\n3 2 9 0 0 4 2\n")
        pts = read_morphology_points(spark, str(d))
        flags = morphology_flags(pts)
        got = {
            os.path.basename(r.file): (r.n_points, r.n_roots, r.has_axon)
            for r in flags.collect()
        }
        assert got == {"uni.asc": (7, 2, False), "chain.swc": (3, 1, True)}

    def test_mixed_dir_missing_format_ok(self, spark, tmp_path):
        from data_integration_pipelines_spark.sources.asc import (
            read_morphology_points,
        )

        d = tmp_path / "only_swc"
        d.mkdir()
        (d / "chain.swc").write_text("1 1 0 0 0 5 -1\n2 2 5 0 0 4 1\n")
        assert read_morphology_points(spark, str(d)).count() == 2


class TestASCRender:
    @staticmethod
    def _edges(rows):
        """Renumbering-independent tree signature: set of
        (child coords+type, parent coords or None). A soma parent
        normalizes to None — the ASC grammar has no explicit
        neurite->soma link (each form roots its own tree), so SWC's
        soma-attached neurite roots legitimately become form roots."""
        by_n = {r[0]: r for r in rows}
        out = set()
        for n, t, x, y, z, rad, parent in rows:
            p = by_n.get(parent)
            pc = (p[2], p[3], p[4]) if p is not None and p[1] != 1 else None
            out.add(((t, x, y, z, rad), pc))
        return out

    def test_roundtrip_reference_fixtures(self):
        from data_integration_pipelines_spark.sources.asc import (
            parse_asc_text,
            render_asc_text,
        )

        for fixture in (ASC_UNI, ASC_MULTI):
            original = parse_asc_text(fixture)
            rendered = render_asc_text(original)
            reparsed = parse_asc_text(rendered)
            assert self._edges(reparsed) == self._edges(original)

    def test_swc_to_asc_conversion_distributed(self, spark, swc_dir, tmp_path):
        """The reference's swc->asc conversion
        (check_swc_on_resource.py:56-166): SWC points -> rendered ASC
        docs -> reparse -> same trees."""
        from data_integration_pipelines_spark.sources.asc import (
            parse_asc_frame,
            render_asc_frame,
        )

        # hetero_* fixtures change type mid-tree — not representable in
        # ASC (a form carries one type), so conversion is tested on the
        # format-representable fixtures
        pts = read_swc_points(spark, swc_dir + "/*.swc").filter(
            ~F.col("file").contains("hetero")
        )
        docs = render_asc_frame(pts)
        reparsed = parse_asc_frame(docs)
        orig = {}
        for r in pts.collect():
            orig.setdefault(r.file, []).append(
                (r.n, r.type, r.x, r.y, r.z, r.radius, r.parent)
            )
        back = {}
        for r in reparsed.collect():
            back.setdefault(r.file, []).append(
                (r.n, r.type, r.x, r.y, r.z, r.radius, r.parent)
            )
        assert set(orig) == set(back)
        for f in orig:
            assert self._edges(back[f]) == self._edges(orig[f]), f


class TestH5MorphologySource:
    def _roundtrip_points(self, spark, tree):
        import numpy as np

        from data_integration_pipelines_spark.sources.h5_morph import (
            parse_h5_frame,
        )
        from data_integration_pipelines_spark.sources.hdf5_lite import write_hdf5

        content = bytearray(write_hdf5(tree))
        df = spark.createDataFrame(
            [("cell", content)], "file string, content binary"
        ).repartition(1)
        return {r["n"]: r for r in parse_h5_frame(df).collect()}

    def test_v1_layout_parent_derivation(self, spark):
        import numpy as np

        got = self._roundtrip_points(
            spark,
            {
                # soma 2 pts, axon section off soma, child section off axon
                "points": np.array(
                    [(-1, 0, 0, 2), (1, 0, 0, 2), (0, 0, 0, 2), (0, 5, 0, 2),
                     (-5, 5, 0, 3)],
                    dtype=np.float64,
                ),
                "structure": np.array(
                    [(0, 1, -1), (2, 2, 0), (4, 2, 1)], dtype=np.int64
                ),
            },
        )
        assert len(got) == 5
        # chain within section, section head -> last point of parent
        assert [got[n]["parent"] for n in sorted(got)] == [-1, 1, 2, 3, 4]
        assert got[1]["type"] == 1 and got[3]["type"] == 2
        assert got[5]["radius"] == 1.5  # diameter/2
        assert got[4]["y"] == 5.0

    def test_h5_points_feed_morphology_flags(self, spark):
        import numpy as np

        from data_integration_pipelines_spark.operators.morphology import (
            morphology_flags,
        )
        from data_integration_pipelines_spark.sources.h5_morph import (
            parse_h5_frame,
        )
        from data_integration_pipelines_spark.sources.hdf5_lite import write_hdf5

        content = bytearray(
            write_hdf5(
                {
                    "points": np.array(
                        [(0, 0, 0, 2), (0, 5, 0, 2), (0, 10, 0, 2)],
                        dtype=np.float64,
                    ),
                    "structure": np.array([(0, 1, -1), (1, 2, 0)], dtype=np.int64),
                }
            )
        )
        df = spark.createDataFrame(
            [("m", content)], "file string, content binary"
        ).repartition(1)
        flags = morphology_flags(parse_h5_frame(df)).collect()[0]
        assert flags["n_points"] == 3 and flags["has_axon"]

    @pytest.mark.skipif(
        not os.path.isdir("/root/reference/data/test_data/h5"),
        reason="reference h5 test data not present",
    )
    def test_reads_real_reference_morphologies(self, spark):
        """Conformance on genuine libhdf5-written morphology files (v1
        AND v2 layouts): the points table must be tree-consistent
        (parents resolve, one root per section tree, positive radii)."""
        import glob as _glob

        from data_integration_pipelines_spark.sources.h5_morph import (
            read_h5_morph_points,
        )

        paths = sorted(
            _glob.glob("/root/reference/data/test_data/h5/**/*.h5", recursive=True)
        )
        pts = read_h5_morph_points(spark, paths).toPandas()
        assert pts.groupby("file").size().min() > 0
        for _, grp in pts.groupby("file"):
            ns = set(grp["n"])
            parents = set(grp["parent"]) - {-1}
            assert parents <= ns  # every parent pointer resolves
            assert (grp["n"] >= 1).all()


class TestMorphologyConversion:
    """Format conversion (ref check_swc_on_resource.py:56-166 swc->h5
    via morph_tool): the tree must survive conversion EXACTLY — every
    battery metric invariant under swc -> h5 -> points round trip."""

    def _report(self, points_df):
        keep = [
            "n_points", "n_roots", "n_zero_radius", "n_distinct_radii",
            "has_axon", "has_basal_dendrite", "n_zero_len_segments",
            "n_z_jumps", "n_axon_trees", "n_dendritic_trees",
            "n_radical_diameter_changes", "n_multifurcations",
            "total_length", "max_seg_len_e4",
        ]
        return {
            os.path.basename(r["file"]).split(".")[0].removeprefix("swc_"): tuple(
                r[c] for c in keep
            )
            for r in morphology_flags(points_df).collect()
        }

    def test_swc_to_h5_roundtrip_preserves_battery(self, spark, swc_dir):
        from data_integration_pipelines_spark.sources.h5_morph import (
            parse_h5_frame,
        )
        from data_integration_pipelines_spark.sources.morph_convert import (
            convert_morphologies,
        )

        points = read_swc_points(spark, swc_dir + "/*.swc")
        before = self._report(points)
        h5 = convert_morphologies(points, to="h5")
        back = parse_h5_frame(h5)
        after = self._report(back)
        assert after == before and len(before) == len(SWC_FIXTURES)

    def test_swc_text_roundtrip(self, spark, swc_dir, tmp_path):
        from data_integration_pipelines_spark.sources.morph_convert import (
            convert_morphologies,
        )

        points = read_swc_points(spark, swc_dir + "/ok_neuron.swc")
        out = convert_morphologies(points, to="swc").collect()[0]
        p = tmp_path / "round.swc"
        p.write_bytes(bytes(out["content"]))
        back = read_swc_points(spark, str(p))
        orig = {(r.n, r.type, r.x, r.y, r.z, r.radius, r.parent)
                for r in points.collect()}
        got = {(r.n, r.type, r.x, r.y, r.z, r.radius, r.parent)
               for r in back.collect()}
        assert got == orig

    def test_section_reconstruction_shapes(self, spark):
        """Branching SWC -> h5 structure: correct section count, types,
        parent-section links, and contiguous point ranges."""
        import pandas as pd

        from data_integration_pipelines_spark.sources.morph_convert import (
            _sections_from_points,
        )

        pdf = pd.DataFrame(
            [
                (1, 1, 0.0, 0.0, 0.0, 1.0, -1),
                (2, 2, 1.0, 0.0, 0.0, 0.5, 1),
                (3, 2, 2.0, 0.0, 0.0, 0.5, 2),
                (4, 2, 3.0, 1.0, 0.0, 0.5, 3),  # branch child A
                (5, 2, 3.0, -1.0, 0.0, 0.5, 3),  # branch child B
            ],
            columns=["n", "type", "x", "y", "z", "radius", "parent"],
        )
        pts, structure = _sections_from_points(pdf)
        assert pts.shape == (5, 4)
        # soma, axon trunk, two branch children = 4 sections
        assert [tuple(s) for s in structure] == [
            (0, 1, -1), (1, 2, 0), (3, 2, 1), (4, 2, 1),
        ]
        assert pts[0, 3] == 2.0  # diameter = 2 * radius


def test_repack_sweeps_random_access_container(spark):
    """NWB -> random-access repack (the reference's RAB step): golden
    NWB bytes -> sweep table -> one native-HDF5 container per file with
    an index dataset and one float64 series per (stimulus, sweep,
    channel), each readable individually."""
    import json as _json

    from data_integration_pipelines_spark.sources.binary_files import (
        repack_sweeps,
    )
    from data_integration_pipelines_spark.sources.hdf5_lite import open_bytes

    golden = os.path.join(os.path.dirname(__file__), "fixtures",
                          "golden_sweeps.nwb")
    sweeps = extract_sweeps(read_binary_files(spark, golden))
    packed = repack_sweeps(sweeps).collect()
    assert len(packed) == 1
    f = open_bytes(bytes(packed[0]["content"]))
    index = _json.loads(str(f["index"][()]))
    # 3 stimulus types; sweep0 contributes i+v, sweep1 v, sweep2 i
    assert set(index) == {"IDRest", "APWaveform", "IV"}
    total_series = sum(len(v) for v in index.values())
    assert total_series == 4
    for stim, entries in index.items():
        for _, meta in entries.items():
            series = f[meta["dataset"]][()]
            assert len(series) == meta["n"] > 0
            assert meta["rate"] > 0
    # random access: one specific series round-trips exactly
    ids = index["APWaveform"]
    key = next(iter(ids.values()))["dataset"]
    vals = f[key][()]
    want = sorted(
        r["value"] for r in sweeps.collect()
        if f'{r["stimulus_type"]} {r["sweep_id"]} {r["channel"]}' == key
    )
    assert sorted(vals.tolist()) == want


class TestAscWriter:
    def test_swc_to_asc_roundtrip_with_detached_stems(self, spark, swc_dir):
        """swc -> asc -> parse: points and in-neurite segments survive;
        soma-attached stems become separate forms (the format's
        semantics), so n_roots grows by exactly the stem count."""
        import pandas as pd

        from data_integration_pipelines_spark.sources.asc import parse_asc_text
        from data_integration_pipelines_spark.sources.morph_convert import (
            points_to_asc_text,
        )

        points = read_swc_points(spark, swc_dir + "/ok_neuron.swc")
        pdf = points.toPandas()
        text = points_to_asc_text(pdf)
        back = pd.DataFrame(
            parse_asc_text(text),
            columns=["n", "type", "x", "y", "z", "radius", "parent"],
        )
        assert len(back) == len(pdf)
        # per-type point multisets survive exactly
        for t in (1, 2, 3, 4):
            a = sorted(map(tuple, pdf[pdf.type == t][["x", "y", "z", "radius"]].values))
            b = sorted(map(tuple, back[back.type == t][["x", "y", "z", "radius"]].values))
            assert a == b, t
        # ok_neuron: 1 swc root + 3 detached stems (axon, basal, apical)
        assert (back["parent"] == -1).sum() == 4
        # branch structure survives: the axon's fork is still a fork
        kid_counts = back.groupby("parent").size()
        assert (kid_counts >= 2).any()

    def test_asc_writer_rejects_hetero_neurite(self, spark, swc_dir):
        from data_integration_pipelines_spark.sources.morph_convert import (
            points_to_asc_text,
        )

        points = read_swc_points(spark, swc_dir + "/hetero_near_soma.swc")
        with pytest.raises(ValueError, match="type change"):
            points_to_asc_text(points.toPandas())


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/data/test_data/neurolucida"),
    reason="reference neurolucida test data not present",
)
def test_asc_parser_reads_real_neurolucida_files():
    """Conformance beyond the inline fixtures: every genuine
    Neurolucida file in the reference's public test data must parse
    into a resolvable tree (spines/comments stripped, branch groups
    attached, types recognized)."""
    import glob as _glob

    from data_integration_pipelines_spark.sources.asc import parse_asc_text

    paths = sorted(_glob.glob("/root/reference/data/test_data/neurolucida/*.asc"))
    assert paths
    for p in paths:
        rows = parse_asc_text(open(p, encoding="utf-8", errors="replace").read())
        assert rows, p
        ns = {r[0] for r in rows}
        assert all(r[6] == -1 or r[6] in ns for r in rows), p


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/data/test_data/swc"),
    reason="reference swc test data not present",
)
def test_swc_reader_reads_real_reference_files(spark):
    """The distributed SWC reader over the reference's named-defect
    files (disconnected components, missing soma, bifurcating soma...):
    every file yields a resolvable parent-pointer table and the
    quality battery runs over the whole set."""
    import glob as _glob

    paths = sorted(
        _glob.glob("/root/reference/data/test_data/swc/**/*.swc", recursive=True)
    )
    assert paths
    pts = read_swc_points(spark, paths).toPandas()
    assert pts.groupby("file").size().min() > 0
    flags = morphology_flags(
        read_swc_points(spark, paths)
    ).toPandas()
    assert len(flags) == pts["file"].nunique()
    # the named disconnected-components file must flag multi-component
    disc = flags[flags["file"].str.contains("disconnected_components")]
    assert not disc.empty and bool(disc["has_multiple_components"].iloc[0])

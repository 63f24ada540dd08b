"""EP1/EP2/EP3 pipeline compositions on small nested fixtures."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_integration_pipelines_spark.operators.voxel import make_affine
from data_integration_pipelines_spark.pipelines import (
    bucket_error_report,
    morphology_quality,
    schema_audit,
    trace_audit,
)


def _dist(name, url="u"):
    return Row(name=name, encodingFormat="x", contentUrl=url)


@pytest.fixture(scope="module")
def traces(spark):
    rows = [
        Row(
            id="t1", bucket="org/a", _deprecated=False,
            description="ok",
            annotation=[Row(hasBody=Row(label="Curated"))],
            subject=Row(species="Mouse"),
            distribution=[_dist("t1.nwb")],
        ),
        Row(
            id="t2", bucket="org/a", _deprecated=False,
            description=None,
            annotation=[Row(hasBody=Row(label="Unassessed"))],
            subject=None,
            distribution=[_dist("t2.abf", url=None)],
        ),
        Row(
            id="t3", bucket="org/b", _deprecated=False,
            description="fine",
            annotation=[Row(hasBody=Row(label="Curated"))],
            subject=Row(species="Rat"),
            distribution=None,
        ),
        Row(
            id="t4", bucket="org/b", _deprecated=True,  # dropped
            description="x",
            annotation=[Row(hasBody=Row(label="Curated"))],
            subject=Row(species="Rat"),
            distribution=[_dist("t4.nwb")],
        ),
    ]
    return spark.createDataFrame(rows)


class TestTraceAudit:
    def test_all_resources(self, traces):
        out = {r["id"]: r.asDict() for r in trace_audit(traces).collect()}
        assert set(out) == {"t1", "t2", "t3"}  # deprecated dropped
        assert out["t1"]["passed"] and out["t1"]["errors"] == []
        assert set(out["t2"]["errors"]) == {
            "has_description", "has_subject", "has_nwb", "urls_ok"
        }
        assert set(out["t3"]["errors"]) == {"has_distribution", "has_nwb"}

    def test_curated_switch(self, traces):
        assert {r["id"] for r in trace_audit(traces, curated=True).collect()} == {"t1", "t3"}
        assert {r["id"] for r in trace_audit(traces, curated=False).collect()} == {"t2"}

    def test_uncurated_includes_null_annotation(self, spark, traces):
        # SPARQL FILTER NOT EXISTS includes resources with NO annotation
        # at all (validation.py:405-411) — a NULL annotation array must
        # not silently drop the row from the uncurated audit.
        extra = spark.createDataFrame(
            [("t5", "org/a", False, "ok", None, None, None)],
            traces.schema,
        )
        both = traces.unionByName(extra)
        assert {r["id"] for r in trace_audit(both, curated=False).collect()} == {
            "t2",
            "t5",
        }
        # and the curated side still excludes it
        assert {r["id"] for r in trace_audit(both, curated=True).collect()} == {
            "t1",
            "t3",
        }

    def test_bucket_error_report(self, traces):
        rep = {
            r["bucket"]: (r["n_errors"], r["distinct_errors"])
            for r in bucket_error_report(trace_audit(traces)).collect()
        }
        assert rep["org/a"] == (4, ["has_description", "has_nwb", "has_subject", "urls_ok"])
        assert rep["org/b"] == (2, ["has_distribution", "has_nwb"])


class TestMorphologyQuality:
    @pytest.fixture(scope="class")
    def points(self, spark):
        # one tiny 2-point neuron at origin; soma root + one axon point
        rows = [
            Row(file="m1.swc", n=1, type=1, x=1.0, y=1.0, z=1.0, radius=2.0, parent=-1),
            Row(file="m1.swc", n=2, type=2, x=3.0, y=1.0, z=1.0, radius=0.5, parent=1),
        ]
        return spark.createDataFrame(rows)

    def test_report_with_region(self, points):
        vol = np.arange(4 * 4 * 4, dtype=np.int32).reshape(4, 4, 4)
        report, plan = morphology_quality(
            points, volume=vol, affine=make_affine((2, 2, 2), (0, 0, 0))
        )
        assert plan is None
        row = report.collect()[0]
        assert row["n_points"] == 2
        assert row["soma_region_id"] == vol[0, 0, 0]

    def test_region_agreement_grading(self, spark, points):
        """EP2 step 4 end-to-end: observed soma region (voxel lookup)
        graded against the declared region via the broadcast ancestor
        closure (ref region_comparison.py:286-331)."""
        vol = np.arange(4 * 4 * 4, dtype=np.int32).reshape(4, 4, 4)
        observed = int(vol[0, 0, 0])  # soma at origin -> region 0
        # hierarchy: observed region 0 is a child of 100
        edges = spark.createDataFrame(
            [(observed, 100), (7, 100)], "child int, parent int"
        )
        declared = spark.createDataFrame(
            [Row(file="m1.swc", declared_region_id=100)]
        )
        report, _ = morphology_quality(
            points,
            volume=vol,
            affine=make_affine((2, 2, 2), (0, 0, 0)),
            declared_regions=declared,
            region_edges=edges,
        )
        row = report.collect()[0]
        # observed is a child of declared -> 'descendant', FCA = declared
        assert row["region_agreement"] == "descendant"
        assert row["region_fca"] == 100

    def test_merge_plan(self, spark, points):
        existing = spark.createDataFrame(
            [
                Row(target_id="m1.swc", n_points=1, total_length=9.9, _createdAt=1),
                Row(target_id="gone.swc", n_points=5, total_length=1.0, _createdAt=2),
            ]
        )
        _report, plan = morphology_quality(points, existing_annotations=existing)
        acts = {r["target_id"]: r["action"] for r in plan.collect()}
        assert acts["m1.swc"] == "update"  # metrics changed
        assert acts["gone.swc"] == "deprecate"  # no longer computed


class TestSchemaAudit:
    def test_census(self, spark):
        resources = spark.createDataFrame(
            [
                Row(id="r1", bucket="org/a", type="Trace", _deprecated=False,
                    _constrainedBy="schema:trace"),
                Row(id="r2", bucket="org/a", type="Trace", _deprecated=True,
                    _constrainedBy="schema:trace"),
                Row(id="r3", bucket="org/a", type="Trace", _deprecated=False,
                    _constrainedBy="unconstrained"),
                Row(id="r4", bucket="org/a", type="Trace", _deprecated=False,
                    _constrainedBy="schema:WRONG"),
                Row(id="r5", bucket="org/b", type="Morph", _deprecated=False,
                    _constrainedBy=None),
            ]
        )
        schema_map = spark.createDataFrame(
            [Row(type="Trace", schema="schema:trace")]
        )
        out = {
            (r["bucket"], r["type"]): r.asDict()
            for r in schema_audit(resources, schema_map).collect()
        }
        a = out[("org/a", "Trace")]
        assert (a["n_resources"], a["n_deprecated"], a["n_unconstrained"], a["n_wrong_schema"]) == (4, 1, 1, 1)
        b = out[("org/b", "Morph")]
        assert (b["n_resources"], b["n_unconstrained"], b["n_wrong_schema"]) == (1, 1, 0)


class TestRegistrationMapping:
    def _inputs(self, spark):
        from data_integration_pipelines_spark.pipelines import registration_mapping

        metadata = spark.createDataFrame(
            [
                ("m1", "Mus musculus", "female", "PN14", "CA1", "r1", 1.0, 2.0, 3.0, "March 2024"),
                ("m2", "Rattus norvegicus", "male", "adult", "SSp", "r2", 4.0, 5.0, 6.0, "January 2023"),
            ],
            "name string, species_label string, sex_label string, age_code string, "
            "region_label string, region_id string, x double, y double, z double, "
            "capture_month string",
        )
        files = spark.createDataFrame(
            [("m1", "/staged/m1.swc"), ("m2", "/staged/m2.swc")], "name string, path string"
        )
        species_map = spark.createDataFrame(
            [("Mus musculus", "NCBITaxon:10090"), ("Rattus norvegicus", "NCBITaxon:10116")],
            "label string, species_id string",
        )
        sex_map = spark.createDataFrame(
            [("female", "PATO:0000383"), ("male", "PATO:0000384")],
            "label string, sex_id string",
        )
        return registration_mapping(metadata, files, species_map, sex_map)

    def test_nested_structs_and_resolvers(self, spark):
        rows = {r["name"]: r for r in self._inputs(spark).collect()}
        m1 = rows["m1"]
        assert m1.brainLocation.brainRegion.label == "CA1"
        assert m1.brainLocation.coordinatesInBrainAtlas.valueX == 1.0
        assert m1.subject.species.id == "NCBITaxon:10090"
        assert m1.subject.sex.id == "PATO:0000383"
        # PN14 -> structured post-natal age; non-PN code -> null age
        assert m1.subject.age.value == 14 and m1.subject.age.period == "Post-natal"
        assert rows["m2"].subject.age is None
        # "%B %Y" + one day, as the reference does
        assert str(m1.generation_date) == "2024-03-02"

    def test_coverage_assertion(self, spark):
        from data_integration_pipelines_spark.pipelines import registration_coverage

        metadata = spark.createDataFrame([("a",), ("b",)], "name string")
        files = spark.createDataFrame([("b",), ("c",)], "name string")
        assert registration_coverage(metadata, files) == (1, 1)


def test_emodel_completeness(spark):
    from data_integration_pipelines_spark.pipelines import emodel_completeness

    emodels = spark.createDataFrame(
        [
            ("e1", {"activity": {"followedWorkflow": "w1"}}),
            ("e2", {"activity": {"followedWorkflow": "w2"}}),
            ("e3", {"activity": {"followedWorkflow": None}}),
        ],
        "id string, generation struct<activity: struct<followedWorkflow: string>>",
    )
    workflows = spark.createDataFrame(
        [
            ("w1", [{"type": "Morphology"}, {"type": "Script"}]),
            ("w2", [{"type": "Script"}]),
        ],
        "id string, hasPart array<struct<type: string>>",
    )
    got = {
        r.emodel_id: (r.has_morphology, r.has_script, r.complete)
        for r in emodel_completeness(emodels, workflows, ["Morphology", "Script"]).collect()
    }
    assert got == {
        "e1": (True, True, True),
        "e2": (False, True, False),
        "e3": (False, False, False),
    }


def test_index_discrepancy_directions(spark):
    from data_integration_pipelines_spark.pipelines import index_discrepancy

    sparql = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    es = spark.createDataFrame([("b",), ("c",), ("d",)], "id string")
    search = spark.createDataFrame([("b",), ("c",)], "id string")
    rows = {
        (r.index_a, r.index_b): (r.only_in_a, list(r.sample_ids))
        for r in index_discrepancy({"sparql": sparql, "es": es, "search": search}).collect()
    }
    assert rows[("sparql", "es")] == (1, ["a"])
    assert rows[("es", "sparql")] == (1, ["d"])
    assert rows[("sparql", "search")] == (1, ["a"])
    assert rows[("search", "sparql")] == (0, [])
    assert rows[("es", "search")] == (1, ["d"])


def test_register_views_sql_entry_path(spark, sf_small):
    """The spark.sql entry path: every table registered as a view, and
    a SQL-text query over them matches the DataFrame formulation."""
    from data_integration_pipelines_spark.catalog import TABLES, register_views

    register_views(spark, sf_small, suffix="_v")
    for t in TABLES:
        assert spark.catalog.tableExists(t + "_v")
    got = {
        (r.o_orderstatus, r.n)
        for r in spark.sql(
            "SELECT o_orderstatus, COUNT(*) AS n FROM orders_v GROUP BY 1"
        ).collect()
    }
    from data_integration_pipelines_spark.catalog import load_table

    want = {
        (r.o_orderstatus, r.n)
        for r in load_table(spark, sf_small, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_morphology_quality_source_agnostic(spark, tmp_path):
    """EP2 runs identically from SWC text and from real H5 bytes: the
    pipeline consumes the canonical points table, so the source format
    must not change a single metric."""
    from data_integration_pipelines_spark.pipelines import morphology_quality
    from data_integration_pipelines_spark.sources.h5_morph import parse_h5_frame
    from data_integration_pipelines_spark.sources.morph_convert import (
        convert_morphologies,
    )
    from data_integration_pipelines_spark.sources.swc import read_swc_points

    swc = tmp_path / "m1.swc"
    swc.write_text(
        "1 1 0 0 0 5 -1\n2 2 5 0 0 4.8 1\n3 2 10 0 0 4.5 2\n"
        "4 2 15 5 2 4.5 3\n5 2 15 -5 1 4.5 3\n6 3 -5 0 3 4.9 1\n"
    )
    points_swc = read_swc_points(spark, str(swc))
    points_h5 = parse_h5_frame(convert_morphologies(points_swc, to="h5"))

    keep = ["n_points", "n_roots", "n_multifurcations", "n_axon_trees",
            "n_dendritic_trees", "total_length", "max_seg_len_e4", "has_axon"]
    a = morphology_quality(points_swc)[0].select(*keep).collect()[0]
    b = morphology_quality(points_h5)[0].select(*keep).collect()[0]
    assert a.asDict() == b.asDict()

"""Transitive closure over parent-pointer hierarchies (J7/J8).

The reference walks brain-region trees and ``rdfs:subClassOf+`` /
``hasPart*`` property paths (ref src/neuron_morphology/validation/
region_comparison.py:108-131, src/trace/stimulus_type_ontology_querying.py:22-27).
Here: semi-naive iterative DataFrame self-join to fixpoint.

Scale notes: ontology/hierarchy tables are small (<= thousands of
nodes), so the closure is computed once and **broadcast** when joined
against fact tables — the fact side never shuffles. The iteration
count is bounded by tree depth (log n for balanced trees); each step
localCheckpoints to cut lineage so plans don't grow exponentially.
For genuinely large graphs the same loop works with shuffle joins on
(node) — semi-naive evaluation only ever joins the newest frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iterations: int = 64,
) -> DataFrame:
    """All (node, ancestor, depth) pairs reachable via parent pointers.

    ``edges`` holds direct links (depth 1). Output columns:
    ``node``, ``ancestor``, ``depth`` (>=1; direct parents have depth 1,
    so direct-vs-transitive reachability stays distinguishable).
    """
    direct = edges.select(
        F.col(child_col).alias("node"),
        F.col(parent_col).alias("ancestor"),
        F.lit(1).alias("depth"),
    ).filter(F.col("ancestor").isNotNull())

    up = direct.select(
        F.col("node").alias("_c"), F.col("ancestor").alias("_p")
    )  # static hop table
    closure = direct
    frontier = direct
    for _ in range(max_iterations):
        # extend the newest paths by one hop (semi-naive: only frontier joins)
        nxt = (
            frontier.join(up, frontier.ancestor == up._c)
            .select(frontier.node, up._p.alias("ancestor"), (frontier.depth + 1).alias("depth"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt)
        frontier = nxt
    else:
        raise RuntimeError(f"closure did not converge in {max_iterations} iterations (cycle?)")
    return closure


def ancestors_of(closure: DataFrame, node_ids: DataFrame, id_col: str) -> DataFrame:
    """Join helper: all ancestors for the given node ids (broadcast closure)."""
    return node_ids.join(
        F.broadcast(closure), node_ids[id_col] == closure.node, "left"
    )


def siblings(edges: DataFrame, child_col: str = "child", parent_col: str = "parent") -> DataFrame:
    """Sibling pairs = self-join on parent (a < b to emit each pair once);
    ref region_comparison.py:296-299 (same-isPartOf sibling rule)."""
    a = edges.select(F.col(child_col).alias("a"), F.col(parent_col).alias("p"))
    b = edges.select(F.col(child_col).alias("b"), F.col(parent_col).alias("p2"))
    return (
        a.join(b, (a.p == b.p2) & (a.a < b.b))
        .select("a", "b", F.col("p").alias("parent"))
    )

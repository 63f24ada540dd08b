"""Shared DuckDB-oracle SQL fragments for hyperplane-LSH embedding
near-dup candidate generation, so every consumer query pins the SAME
semantics from one definition.

Two fragments compose after a ``long`` CTE (vec_id, pos, val over the
``embeddings`` table):

- :func:`lsh_sig_cte` — the n_planes-bit signature per vector (the
  identical integer-hyperplane expression as
  ``operators/similarity.hyperplane_signatures``).
- :func:`hamming_cand_cte` — the DISTINCT Hamming<=h candidate pair
  set. The oracle generates it via pigeonhole block probes + an exact
  Hamming verify (the only formulation DuckDB can run without an N^2
  self-join); the engine generates the same set via QUERY-SIDE
  signature probing (``operators/similarity.embedding_near_dup_probed``
  — the linear-at-scale default kernel) or the block multiprobe twin.
  Candidate strategy is physical, never semantic: all three emit
  exactly the Hamming<=h pairs, so one oracle covers them all.

Consumers: ``embedding_near_dup_probed`` / ``_multiprobe``
(queries_vector), ``dedup_consensus`` and ``embedding_dup_clusters``
(recomposed onto the probed kernel in round 7).
"""

from __future__ import annotations


def lsh_sig_cte(n_planes: int = 8) -> str:
    """CTE ``sig(vec_id, signature)``: the n_planes-bit hyperplane-LSH
    signature, bit j = sign(sum(val * (((j*31 + dim*7) % 11) - 5)))."""
    return f"""
    sig AS (
        SELECT vec_id,
               string_agg(CASE WHEN dotj > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS signature
        FROM (
            SELECT vec_id, j, SUM(val * (((j*31 + (pos-1)*7) % 11) - 5)) AS dotj
            FROM long, UNNEST(range({n_planes})) AS t(j)
            GROUP BY vec_id, j
        ) GROUP BY vec_id
    )"""


def planes_cte(target_bucket: int = 256, src: str = "embeddings") -> str:
    """CTE ``p(np)``: ``recommended_n_planes(COUNT(*))`` in pure-integer
    SQL — np = 8 for N <= target, else bit_length(ceil(N/t) - 1) + 8
    (bit_length via length(bin(x))). EXACTLY the Python rule
    (operators/similarity.recommended_n_planes, integer form since r7),
    so the oracle sizes its signatures with the engine at ANY corpus
    size — the width is no longer a fixture pin. ``src`` lets a
    composition size over its own survivor set (exact_then_near_dup)."""
    t = target_bucket
    return f"""
    p AS (
        SELECT CASE WHEN COUNT(*) <= {t} THEN 8
               ELSE length(bin(CAST((COUNT(*) + {t - 1}) // {t} - 1 AS BIGINT))) + 8
               END AS np
        FROM {src}
    )"""


def cap_cte(mult: int = 16, src: str = "embeddings") -> str:
    """CTE ``c(cap)``: ``auto_max_bucket(COUNT(*), np)`` in pure-integer
    SQL — cap = mult * max(1, ceil(N / 2^np)) — EXACTLY the Python rule
    (operators/similarity.auto_max_bucket, the DEFAULT bucket cap since
    r9), composing after :func:`planes_cte`. Like the width, the cap
    stays dynamic with N in both engines, never a fixture pin."""
    return f"""
    c AS (
        SELECT {mult} * GREATEST(1, CAST((COUNT(*) + (1 << p.np) - 1) // (1 << p.np) AS BIGINT)) AS cap
        FROM {src}, p
        GROUP BY p.np
    )"""


def lsh_sig_cte_dyn(long_src: str = "long", name: str = "sig") -> str:
    """CTE ``{name}(vec_id, signature)`` at the DYNAMIC width from ``p``
    (requires :func:`planes_cte`); same hyperplane formula as
    :func:`lsh_sig_cte`. ``long_src``/``name`` let two-sided consumers
    (incremental_embedding_dedup: a new-batch side and a corpus side)
    stamp the identical formula over both long tables."""
    return f"""
    {name} AS (
        SELECT vec_id,
               string_agg(CASE WHEN dotj > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS signature
        FROM (
            SELECT vec_id, j, SUM(val * (((j*31 + (pos-1)*7) % 11) - 5)) AS dotj
            FROM {long_src}, p, LATERAL (SELECT UNNEST(range(p.np)) AS j) t
            GROUP BY vec_id, j
        ) GROUP BY vec_id
    )"""


def capped_sig_cte(max_bucket: int, src: str = "sig") -> str:
    """CTE ``sigc``: ``src`` minus every signature bucket with
    population > max_bucket — EXACTLY operators/similarity._cap_buckets
    (drop candidate generation in degenerate buckets; the jaccard
    max_doc_freq precedent). Both the probe side and the exact side of
    the candidate join must read ``sigc``, mirroring the engine."""
    return f"""
    sigc AS (
        SELECT s.vec_id, s.signature
        FROM {src} s
        JOIN (SELECT signature FROM {src}
              GROUP BY signature HAVING COUNT(*) <= {max_bucket}) ok
          ON s.signature = ok.signature
    )"""


def capped_sig_cte_dyn(src: str = "sig", name: str = "sigc") -> str:
    """CTE ``sigc``: ``src`` minus every signature bucket with
    population > the DYNAMIC cap from :func:`cap_cte` — the r9 default
    routing of operators/similarity._cap_buckets (auto_max_bucket).
    Both the probe side and the exact side of the candidate join must
    read the capped CTE, mirroring the engine (one-sided consumers —
    incremental_embedding_dedup — cap only the corpus/index side, which
    alone bounds candidates at (planes+1) x |new| x cap)."""
    return f"""
    {name} AS (
        SELECT s.vec_id, s.signature
        FROM {src} s
        JOIN (SELECT signature FROM {src}, c
              GROUP BY signature, c.cap HAVING COUNT(*) <= c.cap) ok
          ON s.signature = ok.signature
    )"""


def probed_cand_cte_dyn(src: str = "sig") -> str:
    """CTEs ``probes`` + ``cand(id_a, id_b)``: Hamming<=1 candidate
    pairs via QUERY-SIDE probing at the dynamic width — the identity
    probe (j=0) plus every 1-bit flip equi-joins the exact full-width
    signatures, mirroring the engine kernel
    (operators/similarity.embedding_near_dup_probed) operation for
    operation. A Hamming<=1 pair matches on exactly one probe per
    orientation and only id_a < id_b survives, so no DISTINCT (the
    same argument as the Spark plan)."""
    return f"""
    probes AS (
        SELECT vec_id,
               CASE WHEN j = 0 THEN signature
                    ELSE substr(signature, 1, CAST(j - 1 AS INT))
                         || (CASE WHEN substr(signature, CAST(j AS INT), 1) = '1'
                             THEN '0' ELSE '1' END)
                         || substr(signature, CAST(j + 1 AS INT))
               END AS probe
        FROM {src}, p, LATERAL (SELECT UNNEST(range(p.np + 1)) AS j) t
    ),
    cand AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM probes a JOIN {src} b ON a.probe = b.signature AND a.vec_id < b.vec_id
    )"""


def hamming_cand_cte(n_planes: int = 8, max_hamming: int = 1) -> str:
    """CTEs ``probes`` + ``cand(id_a, id_b)``: the distinct pairs whose
    signatures differ in <= max_hamming bits (requires ``sig``)."""
    from ..operators.dedup import simhash_blocks

    probe_selects = "\n        UNION ALL\n".join(
        f"        SELECT vec_id, signature, {b} AS block,"
        f" substr(signature, {start}, {length}) AS bits FROM sig"
        for b, (start, length) in enumerate(simhash_blocks(n_planes, max_hamming + 1))
    )
    ham = (
        f"len([i FOR i IN range(1, {n_planes + 1}) "
        "IF substr(a.signature, CAST(i AS INT), 1) <> substr(b.signature, CAST(i AS INT), 1)])"
    )
    return f"""
    probes AS (
{probe_selects}
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM probes a JOIN probes b
          ON a.block = b.block AND a.bits = b.bits AND a.vec_id < b.vec_id
        WHERE {ham} <= {max_hamming}
    )"""

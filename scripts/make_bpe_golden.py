"""Generate the BPE golden tables from the INDEPENDENT pure-Python
reference implementation (tests/test_bpe.py's ref trainer — never the
Spark code under test), keyed by a corpus digest so the oracle SQL can
select the golden matching whatever fixture it is run against.

Writes data_integration_pipelines_spark/plans/bpe_golden.json:

    { "<md5 of string_agg(text,'|' ORDER BY doc_id)>": {
        "sf_dir": "...",                      # provenance note only
        "train24": [[rank, left, right, merged, pair_freq], ...],
        "encode16": [[doc_id, n_bpe_tokens, n_ws_tokens, tokens_md5], ...]
    }, ... }

Covered corpora: sf0.001 (pytest oracle sweep), sf0.01 (the
driver's CORRECTNESS comparison SF) and sf0.1 (bench SF — so the
full-sweep cross-check at sf0.1 stays 100% green; r9). Re-run after
any fixture change.
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import duckdb

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from tests.test_bpe import _ref_apply, ref_bpe_train  # noqa: E402

EOW = "</w>"
OUT = (
    _REPO
    / "data_integration_pipelines_spark"
    / "plans"
    / "bpe_golden.json"
)


def _encode_word(word: str, rules: list[tuple[str, str]]) -> tuple[str, ...]:
    toks = tuple(list(word) + [EOW])
    for a, b in rules:
        if len(toks) < 2:
            break
        toks = _ref_apply(toks, a, b)
    return toks


def golden_for(sf_dir: str) -> tuple[str, dict]:
    # n_ws via the SAME SQL expression every other oracle uses for
    # whitespace tokens (== Spark's F.size(F.split(F.trim(text), '\\s+')))
    rows = duckdb.sql(
        "SELECT doc_id, text,"
        " len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws"
        f" FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    texts = [t for _, t, _ in rows]
    corpus_md5 = hashlib.md5("|".join(texts).encode()).hexdigest()

    train24, _ = ref_bpe_train(texts, n_merges=24)
    merges16, _ = ref_bpe_train(texts, n_merges=16)
    rules = [(a, b) for _, a, b, _, _ in merges16]

    cache: dict[str, tuple[str, ...]] = {}
    encode16 = []
    for doc_id, text, n_ws in rows:
        toks: list[str] = []
        for w in (text or "").split():
            hit = cache.get(w)
            if hit is None:
                hit = cache[w] = _encode_word(w, rules)
            toks.extend(hit)
        md5 = hashlib.md5(" ".join(toks).encode()).hexdigest()
        encode16.append([int(doc_id), len(toks), int(n_ws), md5])

    return corpus_md5, {
        "sf_dir": sf_dir,
        "train24": [list(m) for m in train24],
        "encode16": encode16,
    }


def main() -> None:
    golden: dict[str, dict] = {}
    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        h, g = golden_for(sf_dir)
        golden[h] = g
        print(f"{sf_dir}: corpus md5 {h}, {len(g['train24'])} merges, "
              f"{len(g['encode16'])} docs")
    OUT.write_text(json.dumps(golden, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

"""Text-analysis Column builders for large-scale training-data curation.

Everything here is built-in Column expressions (split / transform /
aggregate / md5) — JVM-side, Arrow-free, no Python in the hot path —
so the same operators run unchanged over 100 TB of documents. Hashes
are md5-hex (identical across engines) rather than engine-private hash
functions, which keeps every operator differential-testable against a
SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny embedded stopword list (language-marker sets for the lang-ID
# heuristic and the stopword-ratio quality metric).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(F.trim(text), r"\s+")


def bpe_token_count(text: Column) -> Column:
    """Token count under a BPE-ish regex pre-tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0)))


def normalized(text: Column) -> Column:
    """Dedup normalization: lowercase + collapse whitespace + trim."""
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint = md5 of normalized text
    (the rolling-hash document fingerprint of the curation pipeline)."""
    return F.md5(normalized(text))


def word_shingles(tokens: Column, n: int) -> Column:
    """n-word shingles as an array<string> (space-joined windows).

    Built as a zip of n shifted slices folded with concat — ~3x faster
    than the transform(sequence, element_at) formulation (zip_with
    walks the arrays once; per-position element_at re-indexes)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return tokens
    count = F.size(tokens) - (n - 1)
    shifted = [F.slice(tokens, k + 1, count) for k in range(n)]
    joined = shifted[0]
    for p in shifted[1:]:
        joined = F.zip_with(joined, p, lambda a, b: F.concat(a, F.lit(" "), b))
    # guard: short/empty token arrays yield no shingles (the negative-
    # length slice in the other branch is never evaluated — If is lazy)
    return F.when(F.size(tokens) >= n, joined).otherwise(F.array())


def minhash_signature(shingles: Column, k: int) -> list[Column]:
    """k MinHash components; component i = lexicographic min of
    md5('<i>:' || shingle) over the shingle set. Using the hex string
    as the ordered domain avoids engine-specific int hashing, so the
    signature is reproducible in any engine with md5."""
    def hasher(i: int):
        def h(s):
            return F.md5(F.concat(F.lit(f"{i}:"), s))

        return h

    return [
        F.array_min(F.transform(shingles, hasher(i))).alias(f"mh{i}") for i in range(k)
    ]


# Hex chars whose high nibble bit is set (>= 8): bit extraction for simhash.
_HIGH_HEX = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash_bits(tokens: Column, nbits: int = 16) -> Column:
    """SimHash over whitespace tokens, returned as an nbits-char '0'/'1'
    string. Bit i = majority vote of bit i of md5(token) across tokens,
    where bit i is the high bit of the i-th hex nibble — a cross-engine
    bit extraction (char in [89abcdef])."""
    if not 1 <= nbits <= 32:
        raise ValueError("nbits must be in [1, 32]")
    def make_vote(i: int):
        # factory keeps the lambda binary — PySpark dispatches higher-
        # order-function lambdas on arity, so default-arg closures break
        def fold(acc, t):
            return acc + F.when(
                F.substring(F.md5(t), i + 1, 1).isin(*_HIGH_HEX), 1
            ).otherwise(-1)

        return fold

    bit_cols = []
    for i in range(nbits):
        vote = F.aggregate(tokens, F.lit(0), make_vote(i))
        bit_cols.append(F.when(vote > 0, "1").otherwise("0"))
    return F.concat(*bit_cols)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:'\"]", ""))
    return F.when(F.length(text) > 0, n_punct / F.length(text)).otherwise(F.lit(0.0))


# --- linear quality classifier (single source of truth) -------------
# The fixed published weights of the fasttext-style quality scorer.
# Every consumer — quality_classifier_score, corpus_card, their DuckDB
# oracles — derives from THESE constants, so retraining the model is a
# one-place change and a card can never describe a stale filter.
QUALITY_BIAS = -6.0
QUALITY_W_SWR = 20.0  # stopword ratio
QUALITY_W_ATL = 1.0  # mean token length
QUALITY_W_TTR = 1.0  # type-token ratio

#: stopword list as a SQL IN-list fragment (DuckDB oracles)
SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def quality_features(tokens: Column) -> dict[str, Column]:
    """The scorer's three engine-exact features — each a ratio of
    exact integers (one IEEE division): stopword ratio, mean token
    length, type-token ratio."""
    from pyspark.sql import functions as _F

    n = _F.size(tokens)
    return {
        "swr": _F.size(_F.filter(tokens, lambda t: t.isin(*STOPWORDS))) / n,
        "atl": _F.aggregate(tokens, _F.lit(0), lambda acc, t: acc + _F.length(t)) / n,
        "ttr": _F.size(_F.array_distinct(tokens)) / n,
    }


def quality_logit(tokens: Column) -> Column:
    """Fixed-weight linear score over ``quality_features`` — a fixed
    left-associated expression tree, bit-identical across engines."""
    from pyspark.sql import functions as _F

    f = quality_features(tokens)
    return (
        _F.lit(QUALITY_BIAS)
        + _F.lit(QUALITY_W_SWR) * f["swr"]
        + _F.lit(QUALITY_W_ATL) * f["atl"]
        + _F.lit(QUALITY_W_TTR) * f["ttr"]
    )


def quality_features_sql(toks: str = "toks") -> str:
    """DuckDB projection fragment computing swr/atl/ttr from a token
    list column — the oracle mirror of ``quality_features``."""
    return (
        f"len(list_filter({toks}, x -> x IN ({SW_SQL}))) / len({toks}) AS swr,\n"
        f"               list_sum(list_transform({toks}, x -> len(x)))"
        f" / len({toks}) AS atl,\n"
        f"               len(list_distinct({toks})) / len({toks}) AS ttr"
    )


def quality_logit_sql() -> str:
    """DuckDB expression for the logit over projected swr/atl/ttr
    columns, built from the SAME weight constants as the Spark side."""
    return (
        f"{QUALITY_BIAS} + {QUALITY_W_SWR} * swr"
        f" + {QUALITY_W_ATL} * atl + {QUALITY_W_TTR} * ttr"
    )


def stopword_ratio(tokens: Column) -> Column:
    """Fraction of tokens that are stopwords."""
    hits = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(tokens) > 0, hits / F.size(tokens)).otherwise(F.lit(0.0))


def avg_token_len(tokens: Column) -> Column:
    total = F.aggregate(tokens, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(tokens) > 0, total / F.size(tokens)).otherwise(F.lit(0.0))


def base64url_encode(data: Column) -> Column:
    """RFC 4648 base64url (the JWT alphabet): standard base64 with
    ``+/`` -> ``-_`` and padding stripped. Pure Column exprs."""
    std = F.regexp_replace(F.base64(data.cast("binary")), "=+$", "")
    return F.translate(std, "+/", "-_")


def base64url_decode(text: Column) -> Column:
    """base64url -> binary: restore the standard alphabet, re-pad to a
    multiple of 4, ``unbase64``."""
    std = F.translate(text, "-_", "+/")
    pad = F.lit("===").substr(F.lit(1), (F.lit(4) - F.length(std) % 4) % 4)
    return F.unbase64(F.concat(std, pad))


def jwt_claim(token: Column, claim: str) -> Column:
    """Extract one claim from a JWT's payload segment — DECODE only, no
    signature verification (the reference reads ``preferred_username``
    from its session token the same way: split on '.', base64url-decode
    segment 1, JSON-extract; ref src/neuron_morphology/
    creation_helpers.py:12-20). F11."""
    payload = F.split(token, r"\.").getItem(1)
    return F.get_json_object(
        base64url_decode(payload).cast("string"), f"$.{claim}"
    )


# PII scrub patterns — kept to the regex subset Java and RE2 interpret
# identically (no lookaround/backrefs), so the redaction is exactly
# reproducible in the DuckDB oracle.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\+?\d[\d -]{7,14}\d\b", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Training-data PII scrub: emails, IPv4 addresses and phone-shaped
    digit runs replaced with typed placeholders. Chained
    ``regexp_replace`` — pure JVM, order fixed (emails first so their
    digit runs don't half-match as phones)."""
    out = text
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out

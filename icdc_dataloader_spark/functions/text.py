"""Text analysis for training-data pipelines — all native Catalyst exprs.

- token counting (whitespace + a BPE-ish subword regex estimate)
- quality scoring (length / punctuation / stopword ratios)
- language ID (stopword-hit heuristic, n-gram-free but extensible)
- document fingerprinting (rolling polynomial hash over word stream)

Everything stays JVM-side (split/filter/aggregate/xxhash64) — no Python in
the hot path, so these run at scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOPWORDS = [
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be", "are",
]


def tokens(col: Column) -> Column:
    """Whitespace tokens; empty string -> empty array.

    array_remove rather than a filter() lambda: higher-order-function
    lambdas run on the interpreted expression evaluator, while
    array_remove stays inside whole-stage codegen.  Identical values:
    split never yields NULL elements, and after trim the only empty
    token is the lone "" a fully-empty string produces — both forms
    drop exactly the "" elements, preserving order (round 6)."""
    return F.array_remove(F.split(F.trim(col), r"\s+"), "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def subword_count_estimate(col: Column) -> Column:
    """BPE-ish token estimate: count word pieces of <=4 chars after
    splitting on non-alphanumerics (a cheap, deterministic proxy)."""
    pieces = F.filter(F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: t != "")
    return F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, p: acc + F.ceil(F.length(p) / F.lit(4.0)).cast("int"),
    )


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks).cast("double")).otherwise(
        F.lit(0.0)
    )


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^\p{Punct}]", ""))
    return F.when(n > 0, p / n.cast("double")).otherwise(F.lit(0.0))


def mean_token_length(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(
        F.size(toks) > 0, total / F.size(toks).cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]: long enough, word-like tokens, low punct,
    some stopwords (prose-ness).  Deterministic, tunable weights."""
    n_tok = token_count(col).cast("double")
    len_ok = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    tok_len = mean_token_length(col)
    tok_ok = F.when((tok_len >= 2.0) & (tok_len <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    sw_ok = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    return F.round(
        0.3 * len_ok + 0.2 * tok_ok + 0.2 * punct_ok + 0.3 * sw_ok, 4
    )


LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}


def lang_scores(col: Column) -> dict:
    toks = tokens(F.lower(col))
    n = F.size(toks)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        out[lang] = F.when(n > 0, F.round(hits / n.cast("double"), 6)).otherwise(
            F.lit(0.0)
        )
    return out


def lang_id(col: Column) -> Column:
    """argmax of marker-hit ratios; 'und' (undetermined) when all zero."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(v.alias("score"), F.lit(k).alias("lang"))
            for k, v in sorted(scores.items())
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(
    col: Column,
    modulus: int = 1_000_000_007,
    base: int = 131,
    hash_mode: str = "xxhash64",
) -> Column:
    """Rolling polynomial hash over word hashes: fp = sum(h_i * base^i) mod M.

    Order-sensitive (unlike a bag-of-words hash) and computable in one
    aggregate pass.  ``hash_mode='portable'`` swaps the word hash for the
    md5-derived cross-engine primitive (functions/porthash.py) so the exact
    value is verifiable in DuckDB; 'xxhash64' is the codegen scale path.
    """
    from .porthash import hex_int

    word_hash = (
        (lambda t: F.pmod(hex_int(t), F.lit(modulus)))
        if hash_mode == "portable"
        else (lambda t: F.pmod(F.xxhash64(t), F.lit(modulus)))
    )
    word_hashes = F.transform(tokens(F.lower(col)), word_hash)
    acc0 = F.struct(F.lit(0).cast("long").alias("fp"), F.lit(1).cast("long").alias("pw"))
    step = lambda acc, h: F.struct(
        F.pmod(acc["fp"] + h * acc["pw"], F.lit(modulus)).alias("fp"),
        F.pmod(acc["pw"] * F.lit(base), F.lit(modulus)).alias("pw"),
    )
    return F.aggregate(word_hashes, acc0, step, lambda acc: acc["fp"])

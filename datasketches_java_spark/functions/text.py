"""Text analysis columns — JVM-side Column expressions (no Python).

Everything here compiles to Catalyst expressions inside whole-stage
codegen: tokenization, w-shingling, shingle hashing, token counts,
quality scores, language-ID heuristic, rolling fingerprints.  Each has
a matching ANSI-SQL oracle formulation in __spark_entry__.oracle_sql().

The shingle hash uses F.xxhash64 (the reference ships the same family,
hash/XxHash.java:44; exact murmur3 reference-parity is only needed for
sketch update hashes, which hash these int64s again Python-side —
SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..config import SHINGLE_W

# Unicode-aware "word" separator: anything that is not letter/digit.
_SEP_RE = r"[^\p{L}\p{N}]+"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "nicht", "auf"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "en", "una", "por", "con", "para"],
}


def tokens(text: Column | str) -> Column:
    """Lowercased word tokens; deterministic normalization."""
    c = F.col(text) if isinstance(text, str) else text
    raw = F.split(F.lower(c), _SEP_RE)
    return F.filter(raw, lambda t: t != F.lit(""))


def shingles(toks: Column, w: int = SHINGLE_W) -> Column:
    """w-word shingles as strings; short docs fall back to one shingle
    of all tokens (keeps every doc LSH-able)."""
    n = F.size(toks)
    full = F.transform(
        F.sequence(F.lit(0), n - F.lit(w)),
        lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), F.lit(w))))
    short = F.array(F.concat_ws(" ", toks))
    return F.when(n >= F.lit(w), full).otherwise(short)


def shingle_hashes(text: Column | str, w: int = SHINGLE_W) -> Column:
    """Distinct int64 shingle-set of a document — the input to MinHash,
    SimHash and exact-Jaccard verification.  Sorted for deterministic
    downstream numpy ops.

    NOTE: inside higher-order-function lambdas, non-trivial argument
    subtrees are re-evaluated per element — O(tokens²) per doc if the
    tokenizer rides inside.  Hot paths must bind the token array to a
    real column first and use ``shingle_hashes_from_tokens``
    (operators/lsh.add_signatures does)."""
    sh = shingles(tokens(text), w)
    return F.array_sort(F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s))))


def shingle_hashes_from_tokens(toks: Column | str, w: int = SHINGLE_W) -> Column:
    """Same as shingle_hashes but over a pre-bound token-array column —
    the O(tokens·w) path."""
    c = F.col(toks) if isinstance(toks, str) else toks
    sh = shingles(c, w)
    return F.array_sort(F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s))))


def ordered_shingle_hashes(toks: Column | str, w: int = SHINGLE_W) -> Column:
    """Shingle hashes in DOCUMENT ORDER (not sorted/deduped) — the
    input winnowing fingerprints require; bind ``toks`` to a real
    column first (see shingle_hashes NOTE)."""
    c = F.col(toks) if isinstance(toks, str) else toks
    return F.transform(shingles(c, w), lambda s: F.xxhash64(s))


def exact_jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two shingle-hash arrays (verification join;
    counterpart of theta/JaccardSimilarity.java:55 exact mode)."""
    inter = F.size(F.array_intersect(a, b))
    uni = F.size(F.array_union(a, b))
    return F.when(uni > 0, inter.cast("double") / uni.cast("double")).otherwise(F.lit(1.0))


# ---------------------------------------------------------------------------
# quality / stats columns (training-data pipeline ops)
# ---------------------------------------------------------------------------

def token_count(text: Column | str) -> Column:
    """Whitespace/punct token count — pure codegen Column."""
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    """Character length — pure codegen Column."""
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


# GPT-2-style pre-tokenizer pattern, lookahead-free so it runs
# identically under Java regex (Spark) and RE2 (DuckDB oracle):
# contraction suffixes | space?letters | space?digits | space?punct-run.
BPE_TOKEN_RE = (r"'s|'t|'re|'ve|'m|'ll|'d"
                r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+")


def bpe_token_count(text: Column | str) -> Column:
    """BPE-ish token count: number of pre-tokenizer segments under the
    GPT-2-style pattern — the standard cheap proxy for LLM token
    budgeting (each segment maps to ≥ 1 BPE token).  Pure codegen
    (regexp_extract_all + size)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars."""
    c = F.col(text) if isinstance(text, str) else text
    total = F.length(c)
    punct = total - F.length(F.regexp_replace(c, r"[\.,;:!\?]", ""))
    return F.when(total > 0, punct.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens in the language's stopword list (a
    quality-filter feature) — pure codegen Column."""
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    hits = F.size(F.array_intersect(F.array_distinct(toks), sw))
    # ratio of distinct stopwords present (0..1) — cheap quality proxy
    return hits.cast("double") / float(len(STOPWORDS[lang]))


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality proxy: length band + stopword
    presence − punctuation excess.  SQL-oracle-expressible."""
    tc = token_count(text).cast("double")
    len_term = F.least(tc / F.lit(100.0), F.lit(1.0))
    sw_term = stopword_ratio(text, "en")
    punct_term = F.least(punct_ratio(text) * F.lit(5.0), F.lit(1.0))
    return F.round(F.greatest(
        F.least(F.lit(0.5) * len_term + F.lit(0.5) * sw_term
                - F.lit(0.2) * punct_term, F.lit(1.0)),
        F.lit(0.0)), 6)


def lang_guess(text: Column | str) -> Column:
    """Stopword-hit language ID over {en,de,fr,es}; 'und' when no hits.
    Deterministic tie-break: highest hits, then alphabetical lang."""
    toks = F.array_distinct(tokens(text))
    best = None
    for lg in sorted(STOPWORDS):
        sw = F.array(*[F.lit(s) for s in STOPWORDS[lg]])
        hits = F.size(F.array_intersect(toks, sw))
        entry = F.struct(hits.alias("hits"), F.lit(lg).alias("lang"))
        best = entry if best is None else F.when(
            entry["hits"] > best["hits"], entry).otherwise(best)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column | str) -> Column:
    """64-bit document fingerprint: xxhash64 of the normalized token
    stream (rolling-hash counterpart; exact-dup key)."""
    return F.xxhash64(F.concat_ws(" ", tokens(text)))


def text_sha256(text: Column | str) -> Column:
    """Byte-identity invariant column (BASELINE.json input_hint:
    byte-identical extracted text per url)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.sha2(c.cast("binary"), 256)

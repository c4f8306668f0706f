"""Text-analysis column functions for training-data pipelines:
language-ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting. All pure `pyspark.sql.functions` compositions —
JVM-side, codegen'd, shuffle-free projections that scale linearly.

These extend the reference's scalar-function surface (SURVEY.md §2.8 X5
string ops) to the document-corpus domain the engine targets.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword probes for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "nicht"),
    "fr": ("le", "la", "et", "les", "des"),
}

EN_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

# word-ish tokens OR punctuation runs — a BPE-ish segmentation regex
TOKEN_REGEX = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]+"

_MOD = 1_000_000_007


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col: Column | str) -> Column:
    return F.split(_c(col), " ")


def n_words(col: Column | str) -> Column:
    return F.size(words(col))


def token_count(col: Column | str) -> Column:
    """Regex token count (BPE-ish segmentation)."""
    return F.regexp_count(_c(col), F.lit(TOKEN_REGEX))


def stopword_ratio(col: Column | str, stopwords=EN_STOPWORDS) -> Column:
    ws = words(col)
    hits = F.size(F.filter(ws, lambda w: w.isin(*stopwords)))
    # try_divide: NULL (not an ANSI error) on degenerate/empty input
    return F.try_divide(hits.cast("double"), F.size(ws))


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    stripped = F.regexp_replace(c, r"[^A-Za-z0-9\s]", "")
    return F.try_divide((F.length(c) - F.length(stripped)).cast("double"), F.length(c))


def mean_word_len(col: Column | str) -> Column:
    c = _c(col)
    return F.try_divide((F.length(c) - (n_words(c) - 1)).cast("double"), n_words(c))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic ∈ [0,1]: rewards stopword presence and
    mid-range word length, penalizes punctuation soup. Deterministic,
    monotone components — property-tested for bounds like the reference's
    morphometrics_reference.json min/max catalog."""
    sw = stopword_ratio(col)
    pr = punct_ratio(col)
    wl = mean_word_len(col)
    wl_score = F.lit(1.0) - F.least(F.abs(wl - F.lit(5.0)) / F.lit(5.0), F.lit(1.0))
    score = (
        F.least(sw * 4, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(pr * 5, F.lit(1.0))) * 0.3
        + wl_score * 0.3
    )
    return F.round(score, 6)


def _in_set(stopwords):
    # arity-1 closure: a `lambda w, s=sw:` default arg would make PySpark
    # treat it as the 2-arg (element, index) lambda form
    return lambda w: w.isin(*stopwords)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit-rate — the n-gram language-ID heuristic."""
    ws = words(col)
    n = F.size(ws)
    return {
        lang: F.try_divide(F.size(F.filter(ws, _in_set(sw))).cast("double"), n)
        for lang, sw in LANG_STOPWORDS.items()
    }


def lang_id(col: Column | str) -> Column:
    """argmax language by stopword hit-rate; 'und' when all scores are 0.
    Deterministic tie-break: lexicographically first language wins."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(s.alias("score"), F.lit(lang).alias("lang"))
            for lang, s in sorted(scores.items())
        ]
    )
    best = F.array_max(pairs)  # struct compare: score first, then lang
    # on ties array_max picks the LAST lang alphabetically; invert by
    # selecting the first struct equal to the max score
    first_best = F.filter(pairs, lambda p: p["score"] == best["score"])[0]
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(first_best["lang"])


def fingerprint(col: Column | str) -> Column:
    """Positional rolling hash of the word stream:
    Σ ascii(first char of word_i) · i  (1-based i)  mod 1e9+7.
    Order-sensitive (a permutation changes it) and incremental — the
    document-fingerprint primitive. Matches DuckDB
    `list_transform(..., (w, i) -> ascii(w) * i)` whose lambda index is
    1-based, hence the i+1 here (Spark's transform index is 0-based)."""
    ws = words(col)
    terms = F.transform(
        ws, lambda w, i: (F.ascii(w).cast("long") * (i + F.lit(1))) % _MOD
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: (a + x) % _MOD)

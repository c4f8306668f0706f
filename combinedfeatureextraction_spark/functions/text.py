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

# word-ish tokens OR punctuation runs — a BPE-ish segmentation regex.
# NOTE: kept as documentation of the SEMANTICS; the implementation avoids
# the negated class — `[^A-Za-z0-9\s]` in java.util.regex measured
# ~150 ns/char (15.8 s over a 95 MB corpus, flat across cores) while the
# equivalent positive-class / translate forms run in ~0.2 s.
TOKEN_REGEX = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]+"

import string as _string

_ALNUM = _string.ascii_letters + _string.digits
_WS = " \t\n\r\x0b\x0c"  # java regex \s

_MOD = 1_000_000_007


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col: Column | str) -> Column:
    return F.split(_c(col), " ")


def n_words(col: Column | str) -> Column:
    return F.size(words(col))


def token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish segmentation TOKEN_REGEX (alnum runs
    + punctuation runs), evaluated as ONE cheap regex over a translate-
    canonicalized copy (every alnum char → 'a', runs preserved 1:1):
    ``a+|[^a\\s]+``. Two reasons this form and not the literal TOKEN_REGEX:
    (a) range-heavy negated classes are ~150 ns/char in java.util.regex;
    (b) TWO DISTINCT regex patterns in one generated stage thrash a shared
    pattern cache and recompile per row (measured 0.25 s + 0.24 s alone →
    5.0 s together) — keep a stage at ONE distinct pattern."""
    canon = F.translate(_c(col), _ALNUM, "a" * len(_ALNUM))
    return F.regexp_count(canon, F.lit(r"a+|[^a\s]+"))


def _hit_count(ws: Column, stopwords) -> Column:
    """Occurrence count of any stopword in the word array — NATIVE form:
    Σ_sw (size(ws) − size(array_remove(ws, sw))). One codegen'd array scan
    per stopword, no interpreted lambda (F.filter with a lambda shares
    NamedLambdaVariable state across local executor threads and measured
    INVERSE 8→32 scaling on a 320k-doc corpus — CLAUDE.md)."""
    n = F.size(ws)
    out = F.lit(0)
    for sw in stopwords:
        out = out + (n - F.size(F.array_remove(ws, sw)))
    return out


def stopword_ratio(col: Column | str, stopwords=EN_STOPWORDS) -> Column:
    ws = words(col)
    hits = _hit_count(ws, stopwords)
    # try_divide: NULL (not an ANSI error) on degenerate/empty input
    return F.try_divide(hits.cast("double"), F.size(ws))


def punct_ratio(col: Column | str) -> Column:
    """Share of characters outside [A-Za-z0-9\\s]. translate-delete of the
    alnum+whitespace alphabet leaves exactly those characters — same value
    as the regexp_replace-and-diff form at ~90× less cost (see
    TOKEN_REGEX note)."""
    c = _c(col)
    punct = F.length(F.translate(c, _ALNUM + _WS, ""))
    return F.try_divide(punct.cast("double"), F.length(c))


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


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit-rate — the n-gram language-ID heuristic.
    Native array_remove differencing per probe word (see _hit_count)."""
    ws = words(col)
    n = F.size(ws)
    return {
        lang: F.try_divide(_hit_count(ws, sw).cast("double"), n)
        for lang, sw in LANG_STOPWORDS.items()
    }


def lang_id(col: Column | str) -> Column:
    """argmax language by stopword hit-rate; 'und' when all scores are 0.
    Deterministic tie-break: lexicographically first language wins.
    Pure chained CASE over greatest() — no array/lambda machinery."""
    scores = lang_scores(col)
    ordered = sorted(scores.items())
    best = F.greatest(*[s for _, s in ordered])
    # NULL input → every score (and thus `best`) is NULL → every WHEN
    # below evaluates NULL → without this first arm the chained CASE
    # would fall through to the last language; NULL docs are 'und'.
    expr = F.when(best.isNull() | (best <= 0), F.lit("und"))
    for lang, s in ordered[:-1]:
        expr = expr.when(s == best, F.lit(lang))
    return expr.otherwise(F.lit(ordered[-1][0]))


def fingerprint(col: Column | str) -> Column:
    """Positional rolling hash of the word stream:
    Σ ascii(first char of word_i) · i  (1-based i)  mod 1e9+7.
    Order-sensitive (a permutation changes it) and incremental — the
    document-fingerprint primitive. Matches DuckDB
    `list_transform(..., (w, i) -> ascii(w) * i)` whose lambda index is
    1-based, hence the i+1 here (Spark's transform index is 0-based).

    This per-row Column form is an interpreted-lambda chain
    (transform + aggregate) — fine for cold paths and property tests,
    but NOT for scan-side hot projections (NamedLambdaVariable
    contention inverse-scales at local[32] — CLAUDE.md). Hot paths use
    :func:`fingerprint_agg`, the native explode-shaped dual."""
    ws = words(col)
    terms = F.transform(
        ws, lambda w, i: (F.ascii(w).cast("long") * (i + F.lit(1))) % _MOD
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: (a + x) % _MOD)


def fingerprint_agg(df, id_col: str, text_col: str, out_col: str = "fp"):
    """Native (lambda-free) dual of :func:`fingerprint`: posexplode the
    word array and take ONE map-side-combinable sum per document —
    Σ (ascii(word)·(pos+1) mod M) ≡ the fold mod M because every term is
    in [0, M) and a 64-bit partial sum cannot overflow below ~9·10⁹
    words/doc. This is the 100 TB form: whole-stage-codegen'd projection
    + partial aggregation, no interpreted lambda, shuffle carries only
    (id, partial-sum).

    posexplode_outer keeps NULL-text documents as a row (fp NULL),
    matching the Column form. Output: (id_col, out_col); requires
    ``id_col`` unique (document key).
    """
    pos_w = df.select(
        F.col(id_col), F.posexplode_outer(words(text_col)).alias("_pos", "_w")
    )
    term = (F.ascii("_w").cast("long") * (F.col("_pos") + F.lit(1))) % _MOD
    return pos_w.groupBy(id_col).agg((F.sum(term) % _MOD).alias(out_col))


def dup_ngram_frac(col: Column | str, n: int = 2) -> Column:
    """Gopher-style repetition signal (Rae et al. 2021 quality filters;
    beyond-reference training-data tier): the fraction of word n-grams
    that repeat an earlier n-gram in the same document —
    1 − distinct/total, 0 for documents shorter than n words. Pure
    native array math at the scan (split + shifted-slice shingles +
    array_distinct): zero shuffle, zero interpreted lambdas in the
    counting path."""
    from combinedfeatureextraction_spark.operators.dedup import word_shingles

    c = _c(col)
    total = F.greatest(F.size(F.split(c, " ")) - (n - 1), F.lit(0))
    distinct = F.size(word_shingles(c, n))
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - distinct.cast("double") / total.cast("double")
    )


def top_ngram_stats(
    df,
    id_col: str,
    text_col: str,
    n: int = 2,
    count_out: str = "top_ngram_count",
    frac_out: str = "top_ngram_char_frac",
):
    """The aggregate-shaped Gopher repetition signal: the most frequent
    word n-gram per document and the fraction of the document's
    characters it covers (count × gram length / text length). Explode →
    per-(doc, gram) count → per-doc argmax (deterministic tie-break:
    count desc, gram asc) — the combinable explode+groupBy shape
    (fingerprint_agg's pattern), never a per-row lambda fold. The argmax
    is ``min(struct(-cnt, gram))`` — struct ordering compares -cnt then
    gram, the EXACT dual of ``row_number over (cnt desc, gram asc)`` —
    so both aggregation levels get full map-side partial aggregation
    and the plan never sorts (the previous window formulation paid an
    extra exchange + full sort of every (doc, gram) count row). Returns
    (id_col, count_out, frac_out); documents with no n-gram get count 0
    and fraction 0.

    Physical note: the argmax uses ``max(cnt)`` + ``min_by(gram,
    struct(-cnt, gram))`` rather than ``min(struct(-cnt, gram))`` — a
    struct-typed min buffer is not hash-aggregable and planned as TWO
    SortAggregates (full sort of every (doc, gram) count row); min_by is
    a TypedImperativeAggregate and runs in ObjectHashAggregateExec,
    sort-free. min_by's on-tie "first seen wins" nondeterminism is
    neutralized by putting the gram itself in the ordering struct: equal
    order keys imply equal grams, so every tie-winner is identical."""
    from combinedfeatureextraction_spark.operators.dedup import (
        word_shingles_all,
    )

    base = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("double").alias("_chars"),
        word_shingles_all(text_col, n).alias("_sh"),
    )
    counts = (
        base.select(id_col, "_chars", F.explode("_sh").alias("_g"))
        .groupBy(id_col, "_chars", "_g")
        .agg(F.count("*").alias("_cnt"))
    )
    best = counts.groupBy(id_col, "_chars").agg(
        F.max("_cnt").alias("_cnt"),
        F.min_by(
            "_g", F.struct((-F.col("_cnt")).alias("_neg"), F.col("_g"))
        ).alias("_g"),
    )
    top = best.select(
        id_col,
        F.col("_cnt").alias(count_out),
        F.round(
            F.col("_cnt") * F.length("_g") / F.col("_chars"), 6
        ).alias(frac_out),
    )
    # left join back so short documents (no n-grams) keep a row
    return (
        df.select(id_col)
        .join(top, id_col, "left")
        .na.fill({count_out: 0, frac_out: 0.0})
    )

"""Text analysis operators: language ID, quality scoring, token counting.

Beyond-reference training-data-pipeline operators. Pure Catalyst expressions,
deterministic, DuckDB-mirrorable. Constants (stopword lists, weights) are the
single source of truth for both the Spark and the oracle SQL sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fastembed_rs_spark.functions.text import tokens

# Tiny ASCII stopword lists per language for the n-gram/stopword-hit heuristic.
# Order of LANGS is the deterministic tiebreak order of the argmax.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "les", "de", "des", "et", "en", "un", "une", "que"],
    "es": ["el", "la", "los", "las", "de", "y", "en", "un", "una", "que"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ein"],
}
LANGS = list(STOPWORDS)

#: punctuation/symbol class shared with the oracle regex (no shorthand classes
#: so Java and RE2-ish engines agree)
NON_WORD_CLASS = "[^a-zA-Z0-9 ]"


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Count of token instances that are stopwords of `lang` (long)."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(*sw))).cast("long")


def predicted_lang(text: Column | str) -> Column:
    """argmax over per-language stopword hits; ties → first language in LANGS
    order; all-zero → 'und' (undetermined)."""
    hit_cols = {lang: stopword_hits(text, lang) for lang in LANGS}
    best = F.greatest(*hit_cols.values())
    expr = F.lit("und")
    # build the CASE chain in reverse so earlier langs win ties
    for lang in reversed(LANGS):
        expr = F.when((hit_cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def token_count(text: Column | str) -> Column:
    """Whitespace/punctuation token count (long)."""
    return F.size(tokens(text)).cast("long")


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not [a-zA-Z0-9 ] (double, 0.0 if empty)."""
    t = F.col(text) if isinstance(text, str) else text
    total = F.length(t).cast("double")
    nonword = (F.length(t) - F.length(F.regexp_replace(t, NON_WORD_CLASS, ""))).cast("double")
    return F.when(total == 0.0, F.lit(0.0)).otherwise(nonword / total)


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are any-language stopwords (double)."""
    all_sw = sorted({w for ws in STOPWORDS.values() for w in ws})
    toks = tokens(text)
    n = F.size(toks).cast("double")
    hits = F.size(F.filter(toks, lambda t: t.isin(*all_sw))).cast("double")
    return F.when(n == 0.0, F.lit(0.0)).otherwise(hits / n)


def avg_token_len(text: Column | str) -> Column:
    """Mean token length in chars (double, 0.0 for token-less docs)."""
    toks = tokens(text)
    n = F.size(toks).cast("double")
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ).cast("double")
    return F.when(n == 0.0, F.lit(0.0)).otherwise(total / n)


def quality_score(text: Column | str) -> Column:
    """Heuristic quality in [0,1]: rewards mid-length docs with word-like
    tokens and some stopwords, penalizes punctuation soup. Deterministic
    rational arithmetic; weights mirrored in the oracle SQL."""
    n = token_count(text).cast("double")
    len_score = F.least(n / F.lit(50.0), F.lit(1.0))
    atl = avg_token_len(text)
    shape_score = F.when((atl >= 3.0) & (atl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw = stopword_ratio(text)
    sw_score = F.least(sw * F.lit(4.0), F.lit(1.0))
    p_penalty = punct_ratio(text)
    return (
        F.lit(0.4) * len_score + F.lit(0.3) * shape_score + F.lit(0.3) * sw_score
    ) * (F.lit(1.0) - p_penalty)


# ---------------------------------------------------------------------------
# From-counts builders (pair with fast_text.text_stat_counts_fast): the same
# arithmetic in the same order as the expression path above, operating on
# the kernel's exact integer count columns — so scores, rounding and tie
# semantics stay bit-identical to the DuckDB oracle.
# ---------------------------------------------------------------------------

def avg_token_len_from_counts() -> Column:
    n = F.col("n_tokens").cast("double")
    return F.when(n == 0.0, F.lit(0.0)).otherwise(
        F.col("tok_chars").cast("double") / n
    )


def stopword_ratio_from_counts() -> Column:
    n = F.col("n_tokens").cast("double")
    return F.when(n == 0.0, F.lit(0.0)).otherwise(
        F.col("sw_any").cast("double") / n
    )


def punct_ratio_from_counts() -> Column:
    total = F.col("n_chars").cast("double")
    return F.when(total == 0.0, F.lit(0.0)).otherwise(
        F.col("n_punct").cast("double") / total
    )


def quality_score_from_counts() -> Column:
    n = F.col("n_tokens").cast("double")
    len_score = F.least(n / F.lit(50.0), F.lit(1.0))
    atl = avg_token_len_from_counts()
    shape_score = F.when((atl >= 3.0) & (atl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw_score = F.least(stopword_ratio_from_counts() * F.lit(4.0), F.lit(1.0))
    return (
        F.lit(0.4) * len_score + F.lit(0.3) * shape_score + F.lit(0.3) * sw_score
    ) * (F.lit(1.0) - punct_ratio_from_counts())


def predicted_lang_from_counts() -> Column:
    hit_cols = {lang: F.col(f"hits_{lang}") for lang in LANGS}
    best = F.greatest(*hit_cols.values())
    expr = F.lit("und")
    for lang in reversed(LANGS):
        expr = F.when((hit_cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr

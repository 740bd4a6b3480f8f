"""Text-analysis operators over the ``documents`` table.

Language ID (stopword n-gram heuristic), quality scoring, token
statistics, and rolling-hash fingerprinting — all as single-pass
column expressions (no UDFs, no shuffles beyond the final aggregate
where one exists). Each is oracle-checkable in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword lists (public, standard function words).
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "von", "zu", "ein", "mit"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "un"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "zh": ["的", "了", "和", "是", "在", "我", "有", "他"],
}

MOD_PRIME = 1_000_000_007


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ", -1)


def _stop_hits(lang: str, text_col: str) -> Column:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(
        f"size(filter(split({text_col}, ' ', -1), t -> t IN ({words})))"
    ).cast("long")


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: argmax of stopword hits per language.

    One pass, one ``filter()`` higher-order scan per language — no
    explode, no shuffle. Ties break alphabetically; zero hits in every
    language → ``'und'`` (BCP-47 undetermined). Output:
    (id, pred_lang, plus per-language hit counts).
    """
    langs = sorted(STOPWORDS)
    hits = {lang: _stop_hits(lang, text_col) for lang in langs}
    best = F.greatest(*[hits[lang] for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:  # alphabetical priority on ties
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return df.select(
        F.col(id_col),
        *[hits[lang].alias(f"hits_{lang}") for lang in langs],
        pred.alias("pred_lang"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document quality features + composite score, single pass.

    Features follow the standard web-corpus filters (length, mean
    token length, stopword ratio, digit/punct density). The composite
    is a transparent linear blend — a placeholder for a trained
    classifier with the same column contract.
    """
    n_chars = F.length(F.col(text_col)).cast("long")
    toks = _tokens(text_col)
    n_tokens = F.size(toks).cast("long")
    mean_tok_len = (n_chars - (n_tokens - 1)) / n_tokens
    stop_ratio = _stop_hits("en", text_col) / n_tokens
    digit_chars = F.length(
        F.regexp_replace(F.col(text_col), "[^0-9]", "")
    ).cast("long")
    punct_chars = F.length(
        F.regexp_replace(F.col(text_col), "[^.,;:!?]", "")
    ).cast("long")
    score = (
        F.least(n_tokens / 100.0, F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + (1.0 - digit_chars / n_chars) * 0.2
        + (1.0 - punct_chars / n_chars) * 0.1
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        mean_tok_len.alias("mean_tok_len"),
        stop_ratio.alias("stop_ratio"),
        digit_chars.alias("digit_chars"),
        punct_chars.alias("punct_chars"),
        score.alias("quality"),
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counts: total, distinct, type-token ratio, max length.

    Array built-ins only (``size``/``array_distinct``/``array_max``) —
    no explode, so the operator is shuffle-free and scales linearly.
    """
    toks = _tokens(text_col)
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        (n_distinct / n_tokens).alias("ttr"),
        F.array_max(F.transform(toks, lambda t: F.length(t)))
        .cast("long")
        .alias("max_tok_len"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint per document.

    Polynomial rolling hash over per-token codes
    (``code = ascii(first char) * 131 + token length``), folded
    left-to-right mod a large prime with ``aggregate`` — pure codegen,
    no Python, no shuffle. Reordering tokens changes the fingerprint
    (unlike bag-of-words hashes), so it detects exact passage reuse.
    """
    vals = F.expr(
        f"transform(split({text_col}, ' ', -1), "
        f"t -> CAST((ascii(substring(t, 1, 1)) * 131 + length(t)) % {MOD_PRIME} AS BIGINT))"
    )
    fp = F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * 131 + v) % MOD_PRIME,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))

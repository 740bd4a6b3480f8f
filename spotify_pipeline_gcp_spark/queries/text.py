"""Text-analysis queries (operators/text.py) with oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spotify_pipeline_gcp_spark.operators.text import (
    MOD_PRIME,
    PII_PATTERNS,
    STOPWORDS,
    contamination_pairs,
    fingerprint,
    lang_id,
    pii_scrub,
    quality_score,
    repetition_stats,
    token_stats,
)
from spotify_pipeline_gcp_spark.queries import register
from spotify_pipeline_gcp_spark.queries.compat import table


def _sql_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), t -> t IN ({words})))::BIGINT"
    )


_LANGS = sorted(STOPWORDS)
_HITS_COLS = ",\n           ".join(
    f"{_sql_hits(lang)} AS hits_{lang}" for lang in _LANGS
)
_BEST = "greatest(" + ", ".join(f"hits_{lang}" for lang in _LANGS) + ")"
_PRED = (
    "CASE WHEN " + _BEST + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN hits_{lang} = {_BEST} THEN '{lang}'" for lang in _LANGS
    )
    + " END"
)


@register(
    "qt1_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
           {_HITS_COLS}
      FROM documents
    )
    SELECT doc_id, {", ".join(f"hits_{lang}" for lang in _LANGS)},
           {_PRED} AS pred_lang
    FROM scored
    """,
)
def qt1_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via per-language stopword hit counts (argmax,
    alphabetical tie-break, 'und' when no hits)."""
    return lang_id(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "qt2_quality_score",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             length(text)::BIGINT AS n_chars_calc,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the','a','of','and','to','in','is','it')))::BIGINT AS stop_hits,
             length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS digit_chars,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::BIGINT AS punct_chars
      FROM documents
    )
    SELECT doc_id, n_chars_calc, n_tokens,
           (n_chars_calc - (n_tokens - 1)) / n_tokens AS mean_tok_len,
           stop_hits / n_tokens AS stop_ratio,
           digit_chars, punct_chars,
           least(n_tokens / 100.0, 1.0) * 0.4
             + (stop_hits / n_tokens) * 0.3
             + (1.0 - digit_chars / n_chars_calc) * 0.2
             + (1.0 - punct_chars / n_chars_calc) * 0.1 AS quality
    FROM f
    """,
)
def qt2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + composite score, single codegen pass."""
    return quality_score(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "qt3_token_stats",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks)::BIGINT AS n_tokens,
           len(list_distinct(toks))::BIGINT AS n_distinct,
           len(list_distinct(toks)) / len(toks) AS ttr,
           list_max(list_transform(toks, t -> length(t)))::BIGINT AS max_tok_len
    FROM t
    """,
)
def qt3_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: totals, distincts, type-token ratio — array
    built-ins only, shuffle-free."""
    return token_stats(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "qt5_token_bpeish",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))::BIGINT
             AS bpeish_tokens,
           len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS number_runs
    FROM documents
    """,
)
def qt5_token_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split vs a BPE-ish regex
    (letter runs / digit runs / single symbols — the pre-tokenizer
    shape most BPE vocabularies assume). Both are single-pass column
    expressions; the regex class set is RE2/Java-portable.

    r14: ``ws_tokens`` comes from length arithmetic (a single-space
    split yields exactly #spaces + 1 parts, empties included on both
    engines) instead of materializing the split array to take its
    size. The regex counts use ``regexp_count``, which Spark 4.1
    lowers to ``size(regexp_extract_all(...))`` (RuntimeReplaceable)
    — measured identical, kept for intent; the regex-engine walk is
    the per-task floor either way. Same oracle, hash-verified."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    n_spaces = F.length("text") - F.length(
        F.replace(F.col("text"), F.lit(" "), F.lit(""))
    )
    return docs.select(
        "doc_id",
        (n_spaces + F.lit(1)).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))
        .cast("long")
        .alias("bpeish_tokens"),
        F.regexp_count(F.col("text"), F.lit("[0-9]+"))
        .cast("long")
        .alias("number_runs"),
    )


from spotify_pipeline_gcp_spark.queries.compat import (  # noqa: E402
    sql_word_ngrams as _sql_ngrams,
)


@register(
    "qt6_repetition_filter",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, {_sql_ngrams(2)} AS g2, {_sql_ngrams(3)} AS g3 FROM t
    )
    SELECT doc_id,
           len(g2)::BIGINT AS n2_grams,
           CASE WHEN len(g2) > 0
                THEN (len(g2) - len(list_distinct(g2))) / len(g2)
                ELSE 0.0 END AS dup2_ratio,
           len(g3)::BIGINT AS n3_grams,
           CASE WHEN len(g3) > 0
                THEN (len(g3) - len(list_distinct(g3))) / len(g3)
                ELSE 0.0 END AS dup3_ratio,
           (CASE WHEN len(g3) > 0
                 THEN (len(g3) - len(list_distinct(g3))) / len(g3)
                 ELSE 0.0 END) <= 0.2 AS keep
    FROM g
    """,
)
def qt6_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition features (Gopher-style repeated
    2-/3-gram occurrence fractions) + keep flag — array built-ins
    only, shuffle-free (operators/text.py::repetition_stats)."""
    return repetition_stats(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "qt7_contamination",
    oracle=f"""
    WITH t AS (
      -- \\s -> ' ' then split + empty-token filter == \\S+ runs,
      -- matching the Spark side's whitespace-normalized tokenization
      SELECT doc_id, source,
             list_filter(string_split(regexp_replace(text, '\\s', ' ', 'g'), ' '),
                         x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             list_distinct({_sql_ngrams(4)}) AS grams
      FROM t
    ),
    bg AS (SELECT doc_id AS bench_id, unnest(grams) AS gram
           FROM g WHERE source = 'src0'),
    cg AS (SELECT doc_id, unnest(grams) AS gram
           FROM g WHERE source <> 'src0')
    SELECT cg.doc_id, bg.bench_id, count(*)::BIGINT AS n_shared
    FROM cg JOIN bg USING (gram)
    GROUP BY cg.doc_id, bg.bench_id
    """,
)
def qt7_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination gate: corpus docs sharing any word
    4-gram with a held-out benchmark set (here: the ``src0`` slice) —
    benchmark n-grams broadcast, corpus side never shuffles
    (operators/text.py::contamination_pairs)."""
    docs = table(spark, sf_dir, "documents")
    return contamination_pairs(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=4,
    )


_PII_COUNTS = ",\n           ".join(
    f"len(regexp_extract_all(text, '{pat}'))::BIGINT AS n_{name}"
    for name, pat, _ in PII_PATTERNS
)
_PII_CLEAN = "text"
for _name, _pat, _rep in PII_PATTERNS:
    _PII_CLEAN = f"regexp_replace({_PII_CLEAN}, '{_pat}', '{_rep}', 'g')"


@register(
    "qt8_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           {_PII_COUNTS},
           {_PII_CLEAN} AS clean_text
    FROM documents
    """,
)
def qt8_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction counts + scrubbed text (emails/IPs/phones,
    fixed order, RE2-and-Java-portable patterns). The synthetic
    corpus has no PII, so the driver row verifies the zero-match
    path and full-text passthrough; planted fixtures in pytest carry
    the match semantics (operators/text.py::pii_scrub)."""
    return pii_scrub(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "qt4_fingerprint",
    oracle=f"""
    WITH v AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
               t -> (ascii(substr(t, 1, 1)) * 131 + length(t)) % {MOD_PRIME}) AS vals
      FROM documents
    )
    SELECT doc_id,
           list_reduce(vals, (acc, x) -> (acc * 131 + x) % {MOD_PRIME})::BIGINT AS fingerprint
    FROM v
    """,
)
def qt4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (left fold,
    pure integer arithmetic — exact in any engine)."""
    return fingerprint(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "qt9_chunk_windows",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(regexp_replace(text, '\\s', ' ', 'g'), ' '),
                         x -> x <> '') AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             greatest(1, (len(toks) - 8 + 55) // 56)::BIGINT AS n_chunks
      FROM t
    ),
    e AS (SELECT doc_id, toks, unnest(range(n_chunks)) AS chunk_id FROM c)
    SELECT doc_id, chunk_id::BIGINT AS chunk_id,
           len(list_slice(toks, chunk_id * 56 + 1, chunk_id * 56 + 64))::BIGINT
             AS chunk_n_tokens,
           array_to_string(list_slice(toks, chunk_id * 56 + 1, chunk_id * 56 + 64), ' ')
             AS chunk_text
    FROM e
    """,
)
def qt9_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, 8-token
    overlap) — the context-window prep in front of embedding /
    RAG-indexing / example assembly. Row-local sequence-explode +
    slice, zero shuffle (operators/text.py::chunk_documents); the
    oracle replays the same integer chunk-count arithmetic and
    1-based inclusive slices."""
    from spotify_pipeline_gcp_spark.operators.text import chunk_documents

    return chunk_documents(
        table(spark, sf_dir, "documents"), "doc_id", "text",
        chunk_tokens=64, overlap=8,
    )


@register(
    "qt10_ngram_lm_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(regexp_replace(text, '\\s', ' ', 'g'), ' '),
                         x -> x <> '') AS toks
      FROM documents
    ),
    b AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
      FROM t WHERE len(toks) >= 2
    ),
    inst AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM b),
    c2 AS (SELECT w1, w2, count(*)::BIGINT AS n_bi FROM inst GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(n_bi)::BIGINT AS n_prefix FROM c2 GROUP BY 1),
    p AS (
      SELECT w1, w2, (1000000 * n_bi) // n_prefix AS q
      FROM c2 JOIN c1 USING (w1)
    ),
    s AS (
      SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(q)::BIGINT AS sum_q
      FROM inst JOIN p USING (w1, w2) GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, sum_q,
           floor((sum_q / n_bigrams / 1000000.0) * 1000000 + 0.5) / 1000000
             AS lm_score
    FROM s
    """,
)
def qt10_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM likelihood score (perplexity proxy):
    each document's mean corpus-MLE transition probability, with the
    per-bigram conditional quantized to exact BIGINT arithmetic so
    both engines agree bit-for-bit — no transcendentals, no float
    aggregation order (operators/text.py::ngram_lm_score). The count
    table is Zipf-compressed and re-aggregated from the bigram
    counts, never a second corpus pass."""
    from spotify_pipeline_gcp_spark.operators.text import ngram_lm_score

    return ngram_lm_score(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "qt11_vocab_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(regexp_replace(text, '\\s', ' ', 'g'), ' '),
                         x -> x <> '') AS toks
      FROM documents
    ),
    tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
    freq AS (
      SELECT token,
             count(*)::BIGINT AS n_occurrences,
             count(DISTINCT doc_id)::BIGINT AS doc_freq
      FROM tok GROUP BY token
    ),
    total AS (SELECT sum(n_occurrences)::BIGINT AS n_total FROM freq)
    SELECT token, n_occurrences, doc_freq,
           floor(n_occurrences / (SELECT n_total FROM total) * 1000000
                 + 0.5) / 1000000 AS corpus_share
    FROM freq
    ORDER BY n_occurrences DESC, token
    LIMIT 50
    """,
)
def qt11_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: the 50 most frequent tokens with
    occurrence counts, document frequency, and corpus share — the
    Zipf-head profile tokenizer design and stopword/boilerplate
    screens start from.

    Scale shape (r10 rewrite — the previous ``countDistinct(doc_id)``
    form OOM'd a 4 g heap at the 1000x rung): document frequency is a
    ROW-LOCAL dedup (``array_distinct`` inside the doc's token array)
    followed by a plain combinable count — the per-task map holds one
    entry per LOCALLY-distinct token (the Zipf-compressed local
    vocabulary), where the countDistinct rewrite's partial-distinct
    layer held one entry per (token, doc_id) PAIR (~15 M per task at
    5 M docs: the whole exploded stream before any compression).
    Occurrence counts aggregate the raw stream the same way; the two
    count tables join on token with NO extra exchange (both sides
    emerge hash-partitioned by token from their own aggregates), and
    the corpus total is a row-local ``sum(size(tokens))`` — never a
    second pass, never a vocab-wide re-aggregation. TakeOrdered 50
    with a deterministic token tie-break keeps the cut engine-exact;
    values are identical to the countDistinct form (exact counts
    either way), so the oracle is unchanged."""
    docs = table(spark, sf_dir, "documents")
    toks = F.array_remove(
        F.split(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " "),
        "",
    )
    base = docs.select("doc_id", toks.alias("t"))
    occ = (
        base.select(F.explode("t").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    dfq = (
        base.select(F.explode(F.array_distinct("t")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
    )
    freq = occ.join(dfq, "token")
    total = base.agg(
        F.sum(F.size("t")).cast("long").alias("n_total")
    )
    share = F.floor(
        F.col("n_occurrences") / F.col("n_total") * 1000000 + F.lit(0.5)
    ) / 1000000
    return (
        freq.crossJoin(F.broadcast(total))
        .select(
            "token", "n_occurrences", "doc_freq",
            share.alias("corpus_share"),
        )
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(50)
    )

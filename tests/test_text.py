"""Text-analysis operator units."""

from __future__ import annotations

import pytest

from spotify_pipeline_gcp_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lang_id_picks_dominant_language(spark):
    df = _docs(
        spark,
        [
            (1, "the cat is in the house and it is warm"),
            (2, "el gato en la casa y el perro en el patio"),
            (3, "qwerty zxcvb asdfgh"),
        ],
    )
    out = {r.doc_id: r.pred_lang for r in lang_id(df, "doc_id", "text").collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "und"


def test_quality_score_features(spark):
    df = _docs(spark, [(1, "the quick fox 123 runs.")])
    r = quality_score(df, "doc_id", "text").collect()[0]
    assert r.n_chars_calc == 23
    assert r.n_tokens == 5
    assert r.digit_chars == 3
    assert r.punct_chars == 1
    assert r.stop_ratio == pytest.approx(0.2)  # "the"
    assert 0.0 <= r.quality <= 1.0


def test_token_stats(spark):
    df = _docs(spark, [(1, "a b a longestword b")])
    r = token_stats(df, "doc_id", "text").collect()[0]
    assert r.n_tokens == 5
    assert r.n_distinct == 3
    assert r.ttr == pytest.approx(0.6)
    assert r.max_tok_len == 11


def test_fingerprint_order_sensitive(spark):
    df = _docs(spark, [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")])
    fps = {r.doc_id: r.fingerprint for r in fingerprint(df, "doc_id", "text").collect()}
    assert fps[1] == fps[3]  # deterministic
    assert fps[1] != fps[2]  # order matters (unlike bag-of-words)

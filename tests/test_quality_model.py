from __future__ import annotations

import math

from querysight_spark.operators.textstats import model_quality_filter


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_logistic_score_matches_hand_formula(spark):
    text = "the cat sat on the mat"  # 6 words, 2 stopwords ('the' x2), 0 punct
    out = model_quality_filter(_docs(spark, [(1, text)])).collect()[0]
    n_chars, n_words = len(text), 6
    punct = 0.0
    stop = round(2 / 6, 6)
    awl = round((n_chars - 5) / 6, 6)
    z = round(-1.0 + 2.0 * min(n_words / 100.0, 1.0) - 8.0 * punct + 3.0 * stop + awl / 10.0, 7)
    assert abs(out.logit - z) < 1e-12
    assert abs(out.model_score - round(1 / (1 + math.exp(-z)), 6)) < 1e-12
    assert out.keep == (out.model_score >= 0.5)


def test_punctuation_heavy_doc_is_dropped(spark):
    good = "the quick brown fox jumps over the lazy dog and that is it for now"
    bad = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    out = {r.doc_id: r for r in model_quality_filter(
        _docs(spark, [(1, good), (2, bad)])).collect()}
    assert out[1].keep is True
    assert out[2].keep is False
    assert out[2].model_score < out[1].model_score

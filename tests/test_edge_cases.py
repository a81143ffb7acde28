"""Degenerate-input hardening: empty frames, all-null payloads, single
rows — the shapes a driver smoke test or a filtered-to-nothing pipeline
hands the operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from querysight_spark.plans.coverage import patterns_with_models, uncovered_tables
from querysight_spark.plans.patterns import aggregate_patterns, merge_patterns
from querysight_spark.plans.recommend import recommendations
from querysight_spark.schemas import (
    DBT_MODEL_MAP_SCHEMA,
    DBT_SOURCES_SCHEMA,
    QUERY_LOG_SCHEMA,
)


@pytest.fixture()
def empty_log(spark):
    return spark.createDataFrame([], QUERY_LOG_SCHEMA)


@pytest.fixture()
def empty_map(spark):
    return spark.createDataFrame([], DBT_MODEL_MAP_SCHEMA)


def test_pattern_agg_empty(spark, empty_log):
    out = aggregate_patterns(empty_log, min_frequency=1)
    assert out.count() == 0
    assert "pattern_id" in out.columns  # schema intact for downstream joins


def test_merge_empty_prior(spark, query_log, empty_log):
    batch = aggregate_patterns(query_log, min_frequency=1, extract_from_sql=False)
    prior = aggregate_patterns(empty_log, min_frequency=1, extract_from_sql=False)
    merged = merge_patterns(prior, batch)
    assert merged.count() == batch.count()


def test_coverage_empty_model_map(spark, query_log, empty_map):
    p = aggregate_patterns(query_log, min_frequency=1, extract_from_sql=False)
    enriched = patterns_with_models(p, empty_map)
    assert all(r.dbt_models_used == [] for r in enriched.collect())
    sources = spark.createDataFrame([], DBT_SOURCES_SCHEMA)
    unc = {r.tname for r in uncovered_tables(p, empty_map, sources).collect()}
    assert "orders" in unc  # everything uncovered when the catalog is empty


def test_recommendations_empty_patterns(spark, empty_log, empty_map):
    p = aggregate_patterns(empty_log, min_frequency=1, extract_from_sql=False)
    assert recommendations(p, empty_map).count() == 0


def test_dedup_ops_empty(spark):
    from querysight_spark.operators.dedup import (
        embedding_cosine_duplicates,
        exact_duplicates,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_duplicates(docs).count() == 0
    assert minhash_lsh_candidates(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0
    vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_cosine_duplicates(vecs).count() == 0


def test_asof_empty_right(spark):
    import datetime as dt

    from querysight_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("L1", "k", dt.datetime(2024, 1, 1))], "lid string, key string, lt timestamp"
    )
    right = spark.createDataFrame([], "rid string, key string, rt timestamp, v double")
    row = asof_join(left, right, on=["key"], left_time="lt", right_time="rt",
                    right_values=["rid", "v"]).first()
    assert row.lid == "L1" and row.rid_asof is None


def test_single_word_doc_shingles(spark):
    from querysight_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame([(1, "word"), (2, "")], "doc_id long, text string")
    # docs shorter than the shingle size yield no signature rows, not errors
    assert minhash_signatures(docs, shingle_size=3).count() == 0
"""dbt model generation (plans.dbtgen): SQL/yml bodies, file writing, and
round-trip — generated files parse back through the dbt catalog loader and
cover the previously-uncovered tables."""

from __future__ import annotations

import os

from querysight_spark.plans.dbtgen import (
    generate_staging_models,
    write_model_files,
)
from querysight_spark.sources.dbt_catalog import parse_dbt_project


def _uncovered(spark):
    return spark.createDataFrame(
        [("staging.raw_events",), ("analytics.Daily-Sales",)], "tname string"
    )


def test_generated_bodies(spark):
    out = {r.tname: r for r in generate_staging_models(
        _uncovered(spark), source_name="warehouse"
    ).collect()}
    r = out["staging.raw_events"]
    assert r.model_name == "stg_staging__raw_events"
    assert "{{ config(materialized='view') }}" in r.sql
    assert "{{ source('warehouse', 'raw_events') }}" in r.sql
    # every non-identifier run ('.', '-') sanitizes to '__'
    assert out["analytics.Daily-Sales"].model_name == "stg_analytics__daily__sales"


def test_direct_relation_when_no_source(spark):
    r = generate_staging_models(_uncovered(spark)).first()
    assert "from staging.raw_events" in r.sql or "from analytics" in r.sql
    assert "source(" not in r.sql


def test_roundtrip_through_catalog_loader(spark, tmp_path):
    models = generate_staging_models(_uncovered(spark), source_name="warehouse")
    out_dir = str(tmp_path / "models")
    paths = write_model_files(models, out_dir, source_name="warehouse")
    assert len(paths) == 3  # 2 sql + schema.yml
    assert os.path.exists(os.path.join(out_dir, "schema.yml"))

    cat = parse_dbt_project(out_dir)
    names = {m["name"] for m in cat.models}
    assert names == {"stg_staging__raw_events", "stg_analytics__daily__sales"}
    # source() macros become edges; yml sources become declared sources
    assert ("stg_staging__raw_events", "warehouse.raw_events") in cat.edges
    assert any(ref == "warehouse.raw_events" for ref, _ in cat.sources)

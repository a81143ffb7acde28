from __future__ import annotations

import os

from querysight_spark.sources.dbt_catalog import catalog_frames, parse_dbt_project


def _write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def test_parse_project_from_files(tmp_path, spark):
    root = str(tmp_path / "proj")
    _write(f"{root}/dbt_project.yml", "name: demo\nmodels:\n  schema: analytics\n")
    _write(
        f"{root}/models/daily_sales.sql",
        "{{ config(materialized='table', schema='marts') }}\n"
        "SELECT * FROM {{ ref('orders_clean') }} JOIN {{ source('raw', 'events') }} USING (id)",
    )
    _write(
        f"{root}/models/orders_clean.sql",
        "SELECT * FROM {{ source('raw', 'orders') }}",
    )
    _write(
        f"{root}/models/sources.yml",
        """
sources:
  - name: raw
    schema: raw_schema
    database: rawdb
    tables:
      - name: events
      - name: orders
""",
    )
    cat = parse_dbt_project(root)
    names = {m["name"]: m for m in cat.models}
    assert set(names) == {"daily_sales", "orders_clean"}
    assert names["daily_sales"]["materialized"] == "table"
    assert names["daily_sales"]["schema"] == "marts"
    assert names["orders_clean"]["schema"] == "analytics"  # project default
    assert ("daily_sales", "orders_clean") in cat.edges
    assert ("daily_sales", "raw.events") in cat.edges
    assert ("raw.events", "rawdb.raw_schema.events") in cat.sources

    model_map, sources, edges = catalog_frames(spark, cat)
    keys = {r.table_key: r.model_name for r in model_map.collect()}
    assert keys["daily_sales"] == "daily_sales"
    assert keys["marts.daily_sales"] == "daily_sales"
    assert sources.count() == 2 and edges.count() == 3


def test_parse_project_from_manifest(tmp_path):
    root = str(tmp_path / "proj2")
    _write(
        f"{root}/target/manifest.json",
        """
{"nodes": {"model.demo.m1": {"resource_type": "model", "name": "m1",
  "schema": "s1", "config": {"materialized": "view"},
  "depends_on": {"nodes": ["model.demo.m0"]}}},
 "sources": {"source.demo.raw.ev": {"source_name": "raw", "name": "ev", "schema": "rs"}}}
""",
    )
    cat = parse_dbt_project(root)
    assert cat.models == [{"name": "m1", "schema": "s1", "materialized": "view"}]
    assert cat.edges == [("m1", "m0")]
    assert cat.sources == [("raw.ev", "rs.ev")]

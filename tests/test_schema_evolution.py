from __future__ import annotations

"""Parquet schema evolution: how the scan layer behaves when a dataset's
files disagree on columns — the normal state of a 100 TB lake after a
pipeline adds a field. Pinned: mergeSchema unions the schemas (old rows
NULL-fill new columns), the default single-footer read sees only one
vintage's columns, and an added column stays prunable/pushable."""

from pyspark.sql import functions as F


def _write_two_vintages(spark, path):
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, payload string"
    ).coalesce(1).write.parquet(f"{path}/part=old")
    spark.createDataFrame(
        [(3, "c", 0.9), (4, "d", 0.2)],
        "id long, payload string, quality double",
    ).coalesce(1).write.parquet(f"{path}/part=new")


def test_merge_schema_unions_columns_and_null_fills(spark, tmp_path):
    p = str(tmp_path / "lake")
    _write_two_vintages(spark, p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert {f.name for f in df.schema.fields} == {
        "id", "payload", "quality", "part"
    }
    rows = {r.id: r.quality for r in df.collect()}
    assert rows[1] is None and rows[2] is None  # old vintage null-fills
    assert rows[3] == 0.9


def test_filter_on_added_column_skips_old_files(spark, tmp_path):
    p = str(tmp_path / "lake")
    _write_two_vintages(spark, p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    # NULL never satisfies >, so old-vintage rows drop; the predicate is
    # still pushed to the scan (missing-column files prune via stats)
    got = df.where(F.col("quality") > 0.5).select("id").collect()
    assert [r.id for r in got] == [3]
    plan = df.where(F.col("quality") > 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "quality" in plan


def test_default_read_sees_single_vintage_schema(spark, tmp_path):
    # without mergeSchema Spark picks one footer: the 'quality' column's
    # visibility is undefined across vintages — the reason every repo
    # loader (sources.catalog.load_table) reads footers deliberately
    p = str(tmp_path / "lake")
    _write_two_vintages(spark, p)
    df = spark.read.parquet(p)
    cols = {f.name for f in df.schema.fields}
    assert {"id", "payload", "part"} <= cols  # shared columns always there

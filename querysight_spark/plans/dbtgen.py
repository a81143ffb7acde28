"""dbt model generation — the ``generate-model`` command the reference CLI
advertises but never registered (/root/reference/querysight.py:277,
fidelity F12), implemented for real.

Turns coverage gaps into dbt artifacts: for each uncovered table (C4
output) emit a staging-model SQL file body (``{{ source() }}`` or direct
relation select, with a config block) and a ``schema.yml`` entry. File
BODIES are built as column expressions — distributed and testable like
any plan; only ``write_model_files`` touches the driver, bounded by the
number of generated models (a catalog-sized list, never fact-scale).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _model_name(tname):
    return F.concat(
        F.lit("stg_"),
        F.regexp_replace(F.lower(tname), r"[^a-z0-9_]+", "__"),
    )


def generate_staging_models(
    uncovered: DataFrame,
    tname_col: str = "tname",
    materialized: str = "view",
    source_name: str | None = None,
) -> DataFrame:
    """One row per uncovered table: (tname, model_name, sql, yml).

    ``source_name`` set → reference tables via ``{{ source('<name>',
    '<table>') }}`` (and the yml declares the source); unset → select the
    relation directly (lift to a source later). schema.table refs use the
    bare table as the source table name, mirroring how the reference's
    mapper keys sources (utils/dbt_mapper.py:94-118)."""
    t = F.col(tname_col)
    bare = F.element_at(F.split(t, r"\."), -1)
    model = _model_name(t)
    relation = (
        F.concat(F.lit(f"{{{{ source('{source_name}', '"), bare, F.lit("') }}"))
        if source_name
        else t
    )
    sql = F.concat(
        F.lit(f"{{{{ config(materialized='{materialized}') }}}}\n\n"),
        F.lit("select *\nfrom "),
        relation,
        F.lit("\n"),
    )
    yml = F.concat(
        F.lit("  - name: "), model,
        F.lit("\n    description: 'Auto-generated staging model for "),
        t, F.lit("'\n"),
    )
    return uncovered.select(
        t.alias("tname"),
        model.alias("model_name"),
        sql.alias("sql"),
        yml.alias("yml"),
    )


def schema_yml(models: DataFrame, source_name: str | None = None,
               source_tables: list[str] | None = None) -> str:
    """Assemble one schema.yml from generated model rows (driver-side,
    bounded by model count)."""
    rows = models.orderBy("model_name").collect()
    out = ["version: 2", "", "models:"]
    out += [r.yml.rstrip("\n") for r in rows]
    if source_name and source_tables:
        out += ["", "sources:", f"  - name: {source_name}", "    tables:"]
        out += [f"      - name: {t}" for t in sorted(source_tables)]
    return "\n".join(out) + "\n"


def write_model_files(models: DataFrame, out_dir: str,
                      source_name: str | None = None) -> list[str]:
    """Write <model_name>.sql files + schema.yml under ``out_dir``; returns
    the written paths. Driver-side by design (models are catalog-scale)."""
    os.makedirs(out_dir, exist_ok=True)
    rows = models.orderBy("model_name").collect()
    paths = []
    for r in rows:
        p = os.path.join(out_dir, f"{r.model_name}.sql")
        with open(p, "w") as f:
            f.write(r.sql)
        paths.append(p)
    bares = [r.tname.split(".")[-1] for r in rows]
    yml_path = os.path.join(out_dir, "schema.yml")
    with open(yml_path, "w") as f:
        f.write(schema_yml(models, source_name, bares if source_name else None))
    paths.append(yml_path)
    return paths

"""CLI mirroring the reference's ``querysight.py analyze`` / ``export``
commands (/root/reference/querysight.py:281-303,815-848) over the Spark
engine: ``python -m querysight_spark analyze --logs <parquet> ...``.

Option names follow the reference CLI where the reference's actually work
(--days/--focus/--min-frequency/--select-tables/--cache-dir/--level);
documented divergences: --sample-fraction really samples (fidelity F5),
--no-cache applies at every level (F4), export writes working JSON (F6),
and generate-model exists (F12).
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys

from pyspark.sql import functions as F


def _parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="querysight_spark")
    sub = p.add_subparsers(dest="command", required=True)

    an = sub.add_parser("analyze", help="run the analysis pipeline")
    an.add_argument("--logs", required=True, help="query-log parquet path/dir")
    an.add_argument("--dbt-project", help="dbt project dir (level >= dbt_integration)")
    an.add_argument("--level", default="pattern_analysis",
                    choices=["data_collection", "pattern_analysis",
                             "dbt_integration", "optimization"])
    an.add_argument("--days", type=int, default=7)
    an.add_argument("--end-date", help="ISO date; window = [end-days, end)")
    an.add_argument("--focus", default="all", choices=["slow", "frequent", "all"])
    an.add_argument("--include-users", default="")
    an.add_argument("--exclude-users", default="")
    an.add_argument("--query-kinds", default="")
    an.add_argument("--select-tables", default="")
    an.add_argument("--min-frequency", type=int, default=2)
    an.add_argument("--sample-fraction", type=float, default=None)
    an.add_argument("--cache-dir", default=None)
    an.add_argument("--no-cache", action="store_true")
    an.add_argument("--page-size", type=int, default=20)
    an.add_argument("--sort-by", default="frequency",
                    choices=["frequency", "duration", "memory", "impact"])
    an.add_argument("--export-dir", default=None, help="also export JSON here")

    ex = sub.add_parser("export", help="export a finished analysis to JSON")
    ex.add_argument("--logs", required=True)
    ex.add_argument("--dbt-project", required=True)
    ex.add_argument("--output", required=True)
    ex.add_argument("--min-frequency", type=int, default=2)

    gm = sub.add_parser("generate-model",
                        help="emit dbt staging models for uncovered tables")
    gm.add_argument("--logs", required=True)
    gm.add_argument("--dbt-project", required=True)
    gm.add_argument("--output", required=True)
    gm.add_argument("--source-name", default=None)
    gm.add_argument("--min-frequency", type=int, default=1)
    return p.parse_args(argv)


def _split(s: str) -> tuple[str, ...]:
    return tuple(x.strip() for x in s.split(",") if x.strip())


def _load(spark, args, need_dbt: bool):
    logs = spark.read.parquet(args.logs)
    dims = (None, None, None)
    if need_dbt:
        if not args.dbt_project:
            sys.exit("--dbt-project is required for this level/command")
        from querysight_spark.sources.dbt_catalog import catalog_frames, parse_dbt_project

        dims = catalog_frames(spark, parse_dbt_project(args.dbt_project))
    return logs, dims


def main(argv: list[str] | None = None) -> int:
    args = _parse_args(sys.argv[1:] if argv is None else argv)
    from querysight_spark.analyze import run_analysis
    from querysight_spark.session import get_spark
    from querysight_spark.sources.snapshot_cache import SnapshotCache

    spark = get_spark(app_name="querysight-cli")

    if args.command in ("export", "generate-model"):
        logs, (model_map, sources, edges) = _load(spark, args, need_dbt=True)
        result = run_analysis(
            spark, logs, model_map, sources, edges,
            level="dbt_integration", min_frequency=args.min_frequency,
        )
        if args.command == "export":
            result.export(args.output, single_file=True)
            print(f"exported patterns/coverage/uncovered to {args.output}")
        else:
            from querysight_spark.plans.dbtgen import (
                generate_staging_models,
                write_model_files,
            )

            models = generate_staging_models(
                result.uncovered_tables, source_name=args.source_name
            )
            paths = write_model_files(models, args.output, args.source_name)
            print(f"wrote {len(paths)} files to {args.output}")
        return 0

    need_dbt = args.level in ("dbt_integration", "optimization")
    logs, (model_map, sources, edges) = _load(spark, args, need_dbt)
    end = (
        dt.datetime.fromisoformat(args.end_date)
        if args.end_date
        else dt.datetime.now()
    )
    start = end - dt.timedelta(days=args.days)
    cache = SnapshotCache(args.cache_dir) if args.cache_dir else None
    result = run_analysis(
        spark, logs, model_map, sources, edges,
        level=args.level,
        start_time=start, end_time=end,
        focus=args.focus,
        include_users=_split(args.include_users),
        exclude_users=_split(args.exclude_users),
        query_kinds=_split(args.query_kinds),
        select_tables=_split(args.select_tables),
        sample_fraction=args.sample_fraction,
        min_frequency=args.min_frequency,
        cache=cache, use_cache=not args.no_cache,
    )

    from querysight_spark.plans.console import display_dataframe, render_panel

    srow = result.summary.first()
    print(
        render_panel(
            "\n".join(f"{k}: {v}" for k, v in srow.asDict().items()),
            title="Analysis Summary",
        )
    )
    if result.patterns is not None:
        from querysight_spark.plans.report import sort_patterns

        display_dataframe(
            sort_patterns(result.patterns, by=args.sort_by).select(
                "normalized_query", "frequency",
                F.round("avg_duration_ms", 2).alias("avg_ms"),
                F.round("total_duration_ms", 2).alias("total_ms"),
            ),
            page_size=args.page_size,
            title="Query Patterns",
        )
    if result.coverage is not None:
        display_dataframe(result.coverage, title="dbt Coverage")
        display_dataframe(
            result.uncovered_tables, page_size=args.page_size,
            title="Uncovered Tables",
        )
    if result.recommendations is not None:
        display_dataframe(
            result.recommendations.select(
                "normalized_query", "rec_type", "impact", "description"
            ),
            page_size=args.page_size,
            title="Recommendations",
        )
    if args.export_dir:
        result.export(args.export_dir, single_file=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

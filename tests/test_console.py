"""Console renderer (A11 parity): box tables, panels, bounded pagination."""

from __future__ import annotations

import io

from querysight_spark.plans.console import (
    display_dataframe,
    render_panel,
    render_table,
)


def test_render_table_alignment_and_ellipsis():
    rows = [
        {"name": "a" * 60, "n": 5, "ratio": 0.5},
        {"name": "b", "n": 12345, "ratio": None},
    ]
    out = render_table(rows, ["name", "n", "ratio"], title="T", max_col_width=10)
    lines = out.split("\n")
    assert lines[0] == "T"
    assert lines[1].startswith("┌") and lines[-1].startswith("└")
    body = [ln for ln in lines if ln.startswith("│")]
    # header + 2 rows, equal width
    assert len(body) == 3 and len({len(ln) for ln in body}) == 1
    assert "aaaaaaaaa…" in out  # capped + ellipsized
    assert " 12,345.00" not in out and "12345" in out  # ints not float-formatted
    assert "N/A" in out  # None rendering


def test_render_panel_wraps_title():
    p = render_panel("line one\nlonger line two", title="Summary")
    lines = p.split("\n")
    assert lines[0].startswith("╭─ Summary ")
    assert lines[-1].startswith("╰─")
    assert len({len(ln) for ln in lines}) == 1


def test_display_dataframe_pages_and_truncates(spark):
    df = spark.range(45).select("id")
    buf = io.StringIO()
    shown = display_dataframe(
        df, page_size=20, title="Ids", interactive=False, limit=40, out=buf
    )
    text = buf.getvalue()
    assert shown == 40
    assert "Ids (Page 1/2)" in text and "Ids (Page 2/2)" in text
    assert "only the first 40 rows shown" in text


def test_display_dataframe_empty(spark):
    df = spark.range(1).where("id < 0")
    buf = io.StringIO()
    assert display_dataframe(df, title="none", interactive=False, out=buf) == 0
    assert "no rows" in buf.getvalue()

"""A11 console report: box-drawn tables, panels, and pagination.

Parity target is the reference's rich-based presentation layer
(/root/reference/querysight.py:63-268 — Table/Panel, page loop, summary
stats table). This environment has no ``rich``, so the renderer is a small
dependency-free implementation of the same surfaces: unicode box tables
with per-column alignment and width caps, titled panels, and a pager that
prompts between pages on a TTY and streams without blocking otherwise.

Driver-memory discipline: ``display_dataframe`` collects at most
``limit`` rows (default 500) no matter the input size — a console report
is a bounded artifact, never a corpus scan; the "+N more" footer tells
the user truncation happened.
"""

from __future__ import annotations

import sys
from collections.abc import Sequence
from typing import Any


def _cell(v: Any, max_width: int) -> str:
    if v is None:
        s = "N/A"
    elif isinstance(v, float):
        s = f"{v:,.2f}"
    elif isinstance(v, (list, tuple)):
        s = ",".join(str(x) for x in v)
    else:
        s = str(v)
    s = s.replace("\n", " ")
    if len(s) > max_width:
        s = s[: max_width - 1] + "…"
    return s


def render_table(
    rows: Sequence[dict[str, Any]],
    columns: Sequence[str],
    title: str | None = None,
    max_col_width: int = 48,
) -> str:
    """One unicode box table. Numeric columns right-align; widths fit the
    data up to ``max_col_width`` (long cells ellipsized)."""
    cells = [[_cell(r.get(c), max_col_width) for c in columns] for r in rows]
    widths = [
        min(max_col_width, max([len(c)] + [len(row[i]) for row in cells]))
        for i, c in enumerate(columns)
    ]
    right = [
        all(isinstance(r.get(c), (int, float)) for r in rows if r.get(c) is not None)
        and any(r.get(c) is not None for r in rows)
        for c in columns
    ]

    def fmt(vals: Sequence[str]) -> str:
        out = []
        for i, v in enumerate(vals):
            out.append(v.rjust(widths[i]) if right[i] else v.ljust(widths[i]))
        return "│ " + " │ ".join(out) + " │"

    def rule(l: str, m: str, r: str) -> str:
        return l + m.join("─" * (w + 2) for w in widths) + r

    lines = []
    if title:
        lines.append(title)
    lines.append(rule("┌", "┬", "┐"))
    lines.append(fmt(list(columns)))
    lines.append(rule("├", "┼", "┤"))
    lines.extend(fmt(row) for row in cells)
    lines.append(rule("└", "┴", "┘"))
    return "\n".join(lines)


def render_panel(text: str, title: str | None = None, width: int | None = None) -> str:
    """A titled box around free text (the reference's Panel analog)."""
    body = text.split("\n")
    w = width or max([len(x) for x in body] + [len(title or "") + 2])
    top = "╭─" + (f" {title} " if title else "").ljust(w, "─") + "─╮"
    bot = "╰─" + "─" * w + "─╯"
    mid = [f"│ {line.ljust(w)} │" for line in body]
    return "\n".join([top, *mid, bot])


def display_dataframe(
    df,
    columns: Sequence[str] | None = None,
    page_size: int = 20,
    title: str | None = None,
    interactive: bool | None = None,
    limit: int = 500,
    out=None,
) -> int:
    """Paged table view of a DataFrame: collects min(limit, n) rows once,
    then renders ``page_size``-row tables titled ``title (Page i/N)``. On a
    TTY (or ``interactive=True``) it waits for Enter between pages and
    stops on ``q``. Returns the number of rows shown."""
    out = out or sys.stdout
    if interactive is None:
        interactive = sys.stdin.isatty() and sys.stdout.isatty()
    cols = list(columns) if columns else list(df.columns)
    rows = [r.asDict() for r in df.select(cols).limit(limit + 1).collect()]
    truncated = len(rows) > limit
    rows = rows[:limit]
    if not rows:
        print(f"{title or 'result'}: no rows", file=out)
        return 0
    pages = [rows[i : i + page_size] for i in range(0, len(rows), page_size)]
    for i, page in enumerate(pages, 1):
        t = f"{title} (Page {i}/{len(pages)})" if title else f"Page {i}/{len(pages)}"
        print(render_table(page, cols, title=t), file=out)
        if i < len(pages) and interactive:
            try:
                if input("Enter for next page, q to quit: ").strip().lower() == "q":
                    break
            except EOFError:
                break
    if truncated:
        print(f"… only the first {limit} rows shown", file=out)
    return len(rows)

"""ASCII table rendering (reference: deepwmh/utilities/table_view.py:1-87)."""

from __future__ import annotations


def render_table(headers, rows, max_col_width: int = 40) -> str:
    headers = [str(h) for h in headers]
    rows = [[str(c) for c in row] for row in rows]
    widths = [len(h) for h in headers]
    for row in rows:
        for i, c in enumerate(row):
            widths[i] = min(max(widths[i], len(c)), max_col_width)

    def clip(s, w):
        return s if len(s) <= w else s[: w - 1] + "…"

    def line(cells):
        return "| " + " | ".join(clip(c, w).ljust(w) for c, w in zip(cells, widths)) + " |"

    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, line(headers), sep]
    for row in rows:
        out.append(line(row))
    out.append(sep)
    return "\n".join(out)


def print_table(headers, rows, **kw):
    print(render_table(headers, rows, **kw))

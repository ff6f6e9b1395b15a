"""Result presentation: DataFrame → markdown table, the final step of
the interactive-SQL lifecycle (SURVEY §3.3 step 4: the chatbot's
rows → pandas → markdown pipeline with a 20-row truncation,
reference ``services/fraud-chatbot/src/core/tools.py:44-61``).

Scale note: ``limit(max_rows + 1)`` is pushed into the query plan
(CollectLimit), so presenting a result never materializes more than
max_rows+1 rows driver-side regardless of the query's cardinality —
the +1 is only to detect that truncation happened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def df_to_markdown(df: DataFrame, max_rows: int = 20) -> str:
    """Render up to ``max_rows`` rows as a GitHub-style markdown table,
    appending the reference's truncation notice when rows remain."""
    rows = df.limit(max_rows + 1).collect()
    truncated = len(rows) > max_rows
    rows = rows[:max_rows]
    cols = df.columns
    fmt = lambda v: "" if v is None else str(v)  # noqa: E731
    lines = [
        "| " + " | ".join(cols) + " |",
        "| " + " | ".join("---" for _ in cols) + " |",
    ]
    for r in rows:
        lines.append("| " + " | ".join(fmt(r[c]) for c in cols) + " |")
    if truncated:
        lines.append("")
        lines.append(f"_Showing first {max_rows} rows._")
    return "\n".join(lines)

"""Physical-plan inspection helpers.

The engine's performance contract is checked, not assumed: tests
assert that parquet scans carry PushedFilters / pruned ReadSchema and
that the frontier⋈pages join goes broadcast (SURVEY §4). These helpers
parse ``explain("formatted")`` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def pushed_filters(df: DataFrame) -> list[str]:
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each parquet ReadSchema in the plan — for
    asserting column pruning (a scan reading all columns for a
    2-column projection is a bug)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out

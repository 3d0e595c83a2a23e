"""Physical-plan inspection helpers — assertions for the plans we demand.

Used by tests (tests/test_plans.py) to pin the plan shape: filters reaching
the parquet scan (PushedFilters), projections pruned (ReadSchema), small
dims broadcast (BroadcastHashJoin), codegen spans present, AQE active.
A correct-but-wrong-plan operator fails CI here even though results match.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert pushed and any(fragment in line for line in pushed), (
        f"filter {fragment!r} not pushed to scan:\n" + "\n".join(pushed or [plan])
    )


def assert_read_schema_only(df: DataFrame, cols: set[str]) -> None:
    plan = physical_plan(df)
    lines = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert lines, plan
    for line in lines:
        schema_part = line.split("ReadSchema:", 1)[1]
        read_cols = {
            c.split(":")[0].strip()
            for c in schema_part.split("<", 1)[1].rsplit(">", 1)[0].split(",")
            if c.strip()
        }
        assert read_cols <= cols, f"scan reads {read_cols - cols} beyond {cols}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df, "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df, "simple")
    assert "CartesianProduct" not in plan, plan


def count_shuffles(df: DataFrame) -> int:
    plan = physical_plan(df, "simple")
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def has_codegen(df: DataFrame) -> bool:
    return "WholeStageCodegen" in physical_plan(df, "simple")

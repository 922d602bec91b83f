"""Plan inspection helpers — our replacement for Hibernate's hidden SQM
(SURVEY §3.1): every query's logical→physical pipeline is inspectable, and
tests assert the physical properties that matter at 100 TB (pushdown,
broadcast, codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)  # type: ignore[attr-defined]


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters mentions `fragment`."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def reads_columns(df: DataFrame) -> list[str]:
    """Columns in the scan ReadSchema (column-pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in inner.split(",") if ":" in f)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle-Exchange count in the physical plan (lower = better).
    Broadcast exchanges are excluded — shipping a dim to every executor is
    the cheap alternative to shuffling the fact table. Counts the
    formatted plan's detail headers ('(N) Exchange') so each node is
    counted once."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True if the *executed* plan ran through whole-stage codegen (under
    AQE the pre-execution formatted plan hides codegen stages). Executes
    THIS plan (collect, not count — count builds a different plan whose
    execution would leave this one unfinalized)."""
    import re

    df.collect()
    plan = physical_plan(df)
    # codegen stages render as "*(N) Operator" in the plan string
    return "WholeStageCodegen" in plan or re.search(r"\*\(\d+\)", plan) is not None

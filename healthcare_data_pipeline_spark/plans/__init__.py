"""Physical-plan introspection helpers — the ".explain and iterate" loop as code.

The build charter requires checking, per operator: did the filter push down,
did the dim join go broadcast, is the hot path inside whole-stage codegen,
how many shuffles does the plan have.  These helpers turn those checks into
assertions so the perf-regression suite (tests/test_ml_multimodal_plans.py,
tests/test_skew_bucketing.py) keeps plans honest as queries evolve.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may collapse some
    at runtime; this is the static upper bound)."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning", simple_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in simple_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries — verifies column pruning reached the scan."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen stages in the FINAL (post-AQE) plan.

    AQE's pre-execution plan (isFinalPlan=false) carries no WholeStageCodegen
    wrappers, so this runs a cheap action to finalize the plan first.  Codegen
    stages show as ``*(n)`` prefixes in the executed-plan string.
    """
    # Finalize the AdaptiveSparkPlan: an action on THIS DataFrame's own
    # queryExecution (df.count() would spawn a fresh execution and leave this
    # plan un-finalized).
    df._jdf.queryExecution().executedPlan().executeCollect()  # noqa: SLF001
    plan = simple_plan(df)
    stages = set(re.findall(r"\*\((\d+)\)", plan))
    stages |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(stages)

"""Curated-zone report operators — the reference's two star-join reports.

Exact semantic parity with ``src/helpers/transform_data.py``:

- ``drug_report`` (:77-111): groupBy(presc_id, drug_brand_name) -> sums ->
  LEFT join drug dim **on drug_brand_name** (a non-key join: brand names are
  deliberately non-unique in the dim, so fan-out is part of the semantics —
  SURVEY.md §1.4) -> projection with the degenerate self-coalesce preserved.
- ``prescriber_report`` (:113-141): groupBy(presc_id) -> sums -> LEFT join
  prescriber -> LEFT join state on presc_state_code = state_code ->
  projection renaming state_name -> presc_state.

Also the local runner's simpler report pair (runnerfile.py:366-442).

Scale: the aggregation runs FIRST (reduces the fact to one row per group)
and the dims are broadcast — at 100 TB the only shuffle is the fact groupBy;
`sum(int)` widens to long exactly as the reference's curated parquet shows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drug_report(prescriber_drug: DataFrame, drug: DataFrame) -> DataFrame:
    """transform_data.py:77-111 parity."""
    agg = prescriber_drug.groupBy("presc_id", "drug_brand_name").agg(
        F.sum("total_claims").alias("total_claims"),
        F.sum("total_drug_cost").alias("total_drug_cost"),
    )
    joined = agg.join(F.broadcast(drug), on="drug_brand_name", how="left")
    return joined.select(
        "presc_id",
        # degenerate self-coalesce preserved from transform_data.py:100
        F.coalesce("drug_brand_name", "drug_brand_name").alias("drug_brand_name"),
        "total_claims",
        "total_drug_cost",
        "drug_type",
    )


def prescriber_report(
    prescriber_drug: DataFrame, prescriber: DataFrame, state: DataFrame
) -> DataFrame:
    """transform_data.py:113-141 parity."""
    agg = prescriber_drug.groupBy("presc_id").agg(
        F.sum("total_claims").alias("total_claims"),
        F.sum("total_drug_cost").alias("drug_cost"),
    )
    joined = agg.join(F.broadcast(prescriber), on="presc_id", how="left")
    joined = joined.join(
        F.broadcast(state), joined["presc_state_code"] == state["state_code"], how="left"
    )
    return joined.select(
        "presc_id",
        F.coalesce("presc_fullname", "presc_fullname").alias("presc_fullname"),
        "presc_specialty",
        F.col("state_name").alias("presc_state"),
        "total_claims",
        "drug_cost",
    )


def runner_drug_report(prescriber_drug: DataFrame, drug_col: str, measure_col: str) -> DataFrame:
    """runnerfile.py:383 parity: groupBy(discovered drug column) ->
    sum(discovered measure) AS prescriptions -> order desc."""
    return (
        prescriber_drug.groupBy(drug_col)
        .agg(F.sum(measure_col).alias("prescriptions"))
        .orderBy(F.desc("prescriptions"))
    )


def runner_prescriber_report(
    prescriber_drug: DataFrame,
    prescriber: DataFrame,
    pid_col: str,
    name_col: str,
) -> DataFrame:
    """runnerfile.py:418-427 parity: groupBy(prescriber id) -> count(*) AS
    num_prescriptions -> order desc -> left join names back."""
    report = (
        prescriber_drug.groupBy(pid_col)
        .agg(F.count("*").alias("num_prescriptions"))
        .orderBy(F.desc("num_prescriptions"))
    )
    names = prescriber.select(pid_col, name_col).dropDuplicates([pid_col])
    return report.join(F.broadcast(names), on=pid_col, how="left")

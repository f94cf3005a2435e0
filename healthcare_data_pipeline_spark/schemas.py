"""Canonical healthcare-domain schemas (SURVEY.md §1.4, FIXTURES.md §A).

The reference infers CSV schemas at read time (runnerfile.py:459); the engine
keeps explicit DDL schemas as the correctness path and offers inference as an
ingestion option (sources.csv).
"""

from __future__ import annotations

from pyspark.sql import types as T

PRESCRIBER = T.StructType(
    [
        T.StructField("presc_id", T.IntegerType()),
        T.StructField("presc_fullname", T.StringType()),
        T.StructField("presc_specialty", T.StringType()),
        T.StructField("presc_state_code", T.StringType()),
    ]
)

DRUG = T.StructType(
    [
        T.StructField("drug_id", T.IntegerType()),
        T.StructField("drug_brand_name", T.StringType()),
        T.StructField("drug", T.StringType()),
        T.StructField("drug_type", T.StringType()),
    ]
)

PRESCRIBER_DRUG = T.StructType(
    [
        T.StructField("presc_id", T.IntegerType()),
        T.StructField("drug_brand_name", T.StringType()),
        T.StructField("total_claims", T.IntegerType()),
        T.StructField("total_drug_cost", T.DoubleType()),
    ]
)

STATE = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("state_name", T.StringType()),
        T.StructField("state_code", T.StringType()),
    ]
)

DOMAIN_SCHEMAS: dict[str, T.StructType] = {
    "prescriber": PRESCRIBER,
    "drug": DRUG,
    "prescriber_drug": PRESCRIBER_DRUG,
    "state": STATE,
}

# Ingestion-date partition columns appended to every zone-written table
# (reference ingest_data.py:91-96; preprocessing_data.py:85).
PARTITION_COLS = ("year", "month", "day")

"""Training-shard export contracts: deterministic membership, balance,
manifest reconciliation, partition-pruned subset reads."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.sources.shards import (
    SHARD_COL,
    read_training_shards,
    write_training_shards,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def written(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shards") / "corpus")
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text", "source")
    manifest = write_training_shards(docs, path, n_shards=8)
    return docs, path, manifest


def test_manifest_reconciles_with_corpus(written, spark):
    docs, path, manifest = written
    assert manifest["n_shards"] == 8 and len(manifest["shards"]) == 8
    assert manifest["rows"] == docs.count()
    expect_tokens = docs.select(
        F.sum(F.size(F.split("text", "[ \\t\\n\\r\\f\\x0B]+")))
    ).first()[0]
    assert manifest["tokens"] == expect_tokens
    assert manifest["bytes"] > 0
    on_disk = json.load(open(os.path.join(path, "manifest.json")))
    assert on_disk == manifest


def test_shards_are_balanced(written):
    _, _, manifest = written
    rows = [s["rows"] for s in manifest["shards"]]
    mean = sum(rows) / len(rows)
    assert min(rows) > 0.7 * mean and max(rows) < 1.3 * mean


def test_membership_is_deterministic_across_runs(written, spark, tmp_path):
    """Hash membership: rewriting the SAME corpus (different input layout —
    extra repartition) lands every doc in the SAME shard.  This is the
    property repartitionByRange cannot give (sampled boundaries)."""
    docs, path, _ = written
    path2 = str(tmp_path / "again")
    write_training_shards(docs.repartition(7), path2, n_shards=8)
    a = {
        (r.doc_id, r[SHARD_COL])
        for r in read_training_shards(spark, path).select("doc_id", SHARD_COL).collect()
    }
    b = {
        (r.doc_id, r[SHARD_COL])
        for r in read_training_shards(spark, path2).select("doc_id", SHARD_COL).collect()
    }
    assert a == b


def test_subset_read_prunes_partitions(written, spark):
    docs, path, manifest = written
    sub = read_training_shards(spark, path, shards=[3])
    assert sub.count() == manifest["shards"][3]["rows"]
    assert {r[SHARD_COL] for r in sub.select(SHARD_COL).distinct().collect()} == {3}
    plan = sub._jdf.queryExecution().executedPlan().toString()
    # directory-partition pruning reached the scan: only the one shard dir
    assert "__shard=3" in plan or "PartitionFilters" in plan


def test_within_shard_order_is_shuffled_not_input_order(written, spark):
    """Rows inside a shard follow the deterministic shuffle key, not doc_id
    order — consecutive ids should be scattered."""
    docs, path, _ = written
    first = (
        read_training_shards(spark, path, shards=[0])
        .limit(50)
        .select("doc_id")
        .collect()
    )
    ids = [r.doc_id for r in first]
    assert ids != sorted(ids)


def test_input_validation(written, spark):
    docs, _, _ = written
    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(docs, "/tmp/x", n_shards=0)
    with pytest.raises(ValueError, match="__shard"):
        write_training_shards(docs.withColumn(SHARD_COL, F.lit(1)), "/tmp/x")

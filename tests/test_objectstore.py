"""S7 object-store listing: Hadoop-FS route e2e over file:// URIs, boto3
paginator route against a stubbed client (no network)."""

from __future__ import annotations

import os

import pytest

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.sources import objectstore as obj

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def zone(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("objzone")
    for name in ("nation", "region"):
        table(spark, SF_DIR, name).write.parquet(str(base / name))
    (base / "notes.txt").write_text("not parquet")
    return str(base)


def test_exists_and_list_over_file_uri(spark, zone):
    uri = f"file://{zone}"
    assert obj.exists(spark, uri)
    assert not obj.exists(spark, uri + "/never_written")
    files = obj.list_objects(spark, uri, suffix=".parquet")
    assert files and all(f.startswith("file:") and f.endswith(".parquet") for f in files)
    # recursive: parquet part-files live one level down
    assert any("/nation/" in f for f in files) and any("/region/" in f for f in files)
    # suffix filter excludes the txt; no filter includes it
    assert not any(f.endswith("notes.txt") for f in files)
    assert any(f.endswith("notes.txt") for f in obj.list_objects(spark, uri))


def test_list_missing_prefix_is_empty_not_error(spark, zone):
    assert obj.list_objects(spark, f"file://{zone}/no/such/prefix") == []


def test_list_subdirs_discovers_tables(spark, zone):
    subs = obj.list_subdirs(spark, f"file://{zone}")
    names = {s.rsplit("/", 1)[1] for s in subs}
    assert names == {"nation", "region"}


def test_count_objects_bare_path_and_prefix(spark, zone):
    total = obj.count_objects(spark, zone)
    assert total == len(obj.list_objects(spark, f"file://{zone}"))
    only_nation = obj.count_objects(spark, zone, prefix="nation")
    assert 0 < only_nation < total


def _stubbed_s3(pages):
    """A real botocore S3 client with stubbed list_objects_v2 responses —
    exercises the actual paginator, zero network."""
    import boto3
    from botocore.stub import Stubber

    client = boto3.client("s3", region_name="us-east-1")
    stubber = Stubber(client)
    for i, keys in enumerate(pages):
        resp = {
            "IsTruncated": i < len(pages) - 1,
            "Contents": [{"Key": k} for k in keys],
            "Name": "bkt",
            "Prefix": "p/",
            "MaxKeys": 1000,
            "KeyCount": len(keys),
        }
        if i < len(pages) - 1:
            resp["NextContinuationToken"] = f"tok{i}"
        stubber.add_response(
            "list_objects_v2",
            resp,
            {"Bucket": "bkt", "Prefix": "p/"}
            if i == 0
            else {"Bucket": "bkt", "Prefix": "p/", "ContinuationToken": f"tok{i - 1}"},
        )
    stubber.activate()
    return client


def test_list_s3_keys_paginates(spark):
    client = _stubbed_s3([["p/a.parquet", "p/b.parquet"], ["p/c.parquet"]])
    keys = obj.list_s3_keys("bkt", "p/", client=client)
    assert keys == ["p/a.parquet", "p/b.parquet", "p/c.parquet"]


def test_list_s3_keys_failure_returns_none():
    class Boom:
        def get_paginator(self, _):
            raise RuntimeError("no credentials")

    assert obj.list_s3_keys("bkt", "p/", client=Boom()) is None


def test_count_objects_s3_dispatch(spark, monkeypatch):
    seen = {}

    def fake_keys(bucket, prefix):
        seen["args"] = (bucket, prefix)
        return ["p/a", "p/b", "p/c"]

    monkeypatch.setattr(obj, "list_s3_keys", fake_keys)
    assert obj.count_objects(spark, "s3://bkt/base", prefix="sub/") == 3
    assert seen["args"] == ("bkt", "base/sub/")


def test_count_objects_s3_fallback_reports_zero_without_connector(spark, monkeypatch):
    """boto3 route unavailable AND no s3a connector jars: the probe reports 0
    (reference check_objects_number semantics) instead of raising."""
    monkeypatch.setattr(obj, "list_s3_keys", lambda *a, **kw: None)
    assert obj.count_objects(spark, "s3://bkt/base") == 0


def test_pipeline_ingest_over_file_uri(spark, tmp_path):
    """The pipeline raw zone works as a URI, not just a local path: CSV and
    parquet tables discovered through the Hadoop FS listing — the shape that
    makes an s3a:// raw zone work unchanged once connector jars exist."""
    from healthcare_data_pipeline_spark.pipeline import PipelineConfig, ingest
    from tests.fixtures import make_domain_tables, write_csv_dir

    base = str(tmp_path / "uri_zone")
    write_csv_dir(make_domain_tables(), os.path.join(base, "raw"))
    table(spark, SF_DIR, "nation").write.parquet(os.path.join(base, "raw", "nation"))

    cfg = PipelineConfig(base_dir=f"file://{base}")
    dfs = ingest(spark, cfg)
    assert "nation" in dfs and dfs["nation"].count() == 25
    local = ingest(spark, PipelineConfig(base_dir=base))
    assert set(dfs) == set(local)
    for name in local:
        assert dfs[name].count() == local[name].count(), name

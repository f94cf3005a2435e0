"""Object-store listing / existence (S7; reference ``src/common/s3.py:100-192``).

The reference probes its bucket three ways — local ``os.walk``, the Hadoop
FileSystem API through the Spark JVM, and a boto3 ``list_objects_v2``
paginator — and dispatches on the path scheme.  Here the same capabilities
are one small surface:

* ``list_objects`` / ``exists`` go through Hadoop's FileSystem, which
  resolves ANY scheme Spark itself can read (``file://``, ``s3a://``,
  ``gs://``, ``abfs://`` ... given the cluster's connector jars) — so the
  listing layer needs no cloud SDK and is e2e-testable against ``file://``
  URIs in this image.
* ``list_s3_keys`` is the boto3 paginator route for when an AWS-specific
  listing is wanted without a Spark session (reference parity); the client
  is injectable so tests drive it with ``botocore.stub.Stubber`` — no
  network.
* ``count_objects`` is the scheme dispatcher (reference
  ``check_objects_number``): s3 URIs try boto3 first then fall back to the
  Hadoop route; everything else goes straight to Hadoop.

At 100 TB the listing itself can be the bottleneck: ``list_objects`` uses
the FileSystem's RECURSIVE iterator (``listFiles``), which object-store
connectors implement as bulk LIST pages rather than per-directory round
trips.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _hadoop_fs(spark: SparkSession, uri: str):
    jvm = spark._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(uri)
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    return jpath.getFileSystem(conf), jpath, jvm


def exists(spark: SparkSession, uri: str) -> bool:
    """Does the path/prefix exist (any Hadoop-resolvable scheme)?"""
    fs, jpath, _ = _hadoop_fs(spark, uri)
    return bool(fs.exists(jpath))


def list_objects(
    spark: SparkSession, uri: str, suffix: str | None = None, recursive: bool = True
) -> list[str]:
    """Full URIs of the FILES under ``uri``, sorted; optionally filtered by
    suffix.  Empty when the path does not exist (probing a prefix that may
    not have been written yet is the common S7 call)."""
    fs, jpath, _ = _hadoop_fs(spark, uri)
    if not fs.exists(jpath):
        return []
    out: list[str] = []
    it = fs.listFiles(jpath, recursive)
    while it.hasNext():
        status = it.next()
        p = status.getPath().toString()
        if suffix is None or p.endswith(suffix):
            out.append(p)
    return sorted(out)


def list_subdirs(spark: SparkSession, uri: str) -> list[str]:
    """Immediate child DIRECTORIES of ``uri`` (table discovery: each child of
    a raw zone is one table)."""
    fs, jpath, _ = _hadoop_fs(spark, uri)
    if not fs.exists(jpath):
        return []
    return sorted(
        s.getPath().toString() for s in fs.listStatus(jpath) if s.isDirectory()
    )


def list_s3_keys(bucket: str, prefix: str = "", client=None) -> list[str] | None:
    """Object keys under ``bucket/prefix`` via the boto3 ``list_objects_v2``
    paginator (handles >1000 keys); ``None`` when boto3 is unavailable or the
    call fails (callers fall back to the Hadoop route).  ``client`` is
    injectable for stubbed tests and custom endpoints."""
    try:
        if client is None:
            import boto3

            client = boto3.client("s3")
        keys: list[str] = []
        for page in client.get_paginator("list_objects_v2").paginate(
            Bucket=bucket, Prefix=prefix
        ):
            keys.extend(obj["Key"] for obj in page.get("Contents", []))
        return keys
    except Exception:
        return None


def count_objects(spark: SparkSession, uri: str, prefix: str = "") -> int:
    """Scheme-dispatched object count (reference ``check_objects_number``):
    ``s3://``/``s3a://`` URIs try the boto3 paginator first and fall back to
    Hadoop; every other scheme (and bare local paths) goes straight to the
    Hadoop listing."""
    scheme = uri.split("://", 1)[0] if "://" in uri else ""
    if scheme in ("s3", "s3a", "s3n"):
        rest = uri.split("://", 1)[1]
        bucket, _, base = rest.partition("/")
        full_prefix = "/".join(p for p in (base.rstrip("/"), prefix.lstrip("/")) if p)
        keys = list_s3_keys(bucket, full_prefix)
        if keys is not None:
            return len(keys)
        uri = f"s3a://{bucket}/{full_prefix}" if full_prefix else f"s3a://{bucket}"
        try:
            return len(list_objects(spark, uri))
        except Exception:
            # no s3a connector on the classpath and no boto3: reference
            # semantics (check_objects_number) report 0 rather than raise —
            # this is a probe, not a read
            return 0
    target = f"{uri.rstrip('/')}/{prefix.lstrip('/')}" if prefix else uri
    return len(list_objects(spark, target))

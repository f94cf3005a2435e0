"""Data-layout operators: schema evolution and sort-for-skipping statistics."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.sources.layout import read_merged, write_sorted
from tests.conftest import SF_DIR


def test_schema_evolution_merged_read(spark, tmp_path):
    d = str(tmp_path / "evolved")
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    # epoch 1: two columns
    o.limit(100).write.mode("append").parquet(d)
    # epoch 2: a column added later
    o.limit(50).withColumn("o_channel", F.lit("web")).write.mode("append").parquet(d)

    merged = read_merged(spark, d)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "o_channel"}
    assert merged.count() == 150
    # old rows surface the new column as NULL; new rows keep their value
    assert merged.filter(F.col("o_channel").isNull()).count() == 100
    assert merged.filter(F.col("o_channel") == "web").count() == 50


def test_sorted_layout_tightens_rowgroup_stats(spark, tmp_path):
    """After write_sorted on o_orderdate, each FILE covers a narrow disjoint
    date band (row-group min/max stats prune), unlike the unsorted layout
    where every file spans ~the full date range."""
    import pyarrow.parquet as pq

    o = table(spark, SF_DIR, "orders")
    lo, hi = o.agg(F.min("o_orderdate"), F.max("o_orderdate")).collect()[0]
    full_span = (hi - lo).total_seconds()

    unsorted_dir = str(tmp_path / "unsorted")
    o.repartition(8).write.parquet(unsorted_dir)
    sorted_dir = str(tmp_path / "sorted")
    write_sorted(o, sorted_dir, ["o_orderdate"], n_files=8)

    def file_spans(d):
        spans = []
        for f in glob.glob(os.path.join(d, "*.parquet")):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "o_orderdate" and col.statistics:
                        mins.append(col.statistics.min)
                        maxs.append(col.statistics.max)
            if mins:
                spans.append((max(maxs) - min(mins)).total_seconds())
        return spans

    uns = file_spans(unsorted_dir)
    srt = file_spans(sorted_dir)
    assert uns and srt
    # unsorted files each cover (nearly) the whole range; sorted files cover
    # disjoint slivers — on average at least 4x tighter
    assert sum(srt) / len(srt) < (sum(uns) / len(uns)) / 4, (srt, uns)
    # and the rewritten data is intact
    assert spark.read.parquet(sorted_dir).count() == o.count()


def test_compaction_merges_small_files(spark, tmp_path):
    from healthcare_data_pipeline_spark.sources.layout import compact

    frag = str(tmp_path / "fragmented")
    o = table(spark, SF_DIR, "orders")
    o.repartition(40).write.parquet(frag)  # 40 tiny files
    n_in = len(glob.glob(os.path.join(frag, "*.parquet")))
    assert n_in >= 40

    out = str(tmp_path / "compacted")
    n_planned = compact(spark, frag, out, target_file_bytes=64 << 20)
    n_out = len(glob.glob(os.path.join(out, "*.parquet")))
    assert n_planned == n_out
    assert n_out < n_in / 4  # tiny total volume -> a handful of files
    # content preserved exactly
    a = spark.read.parquet(frag)
    b = spark.read.parquet(out)
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_zorder_layout_skips_on_every_dimension(spark, tmp_path):
    """Z-order vs single-column sort on 2 independent uniform dims:

    * x-sorted files: tight x bands, but each file's y span covers ~the whole
      domain — y predicates skip NOTHING.
    * Z-ordered files: BOTH dims' per-file spans shrink (sqrt-ish tradeoff),
      so min/max pruning works for predicates on either column.
    """
    import pyarrow.parquet as pq

    from healthcare_data_pipeline_spark.sources.layout import write_zordered

    n = 100_000
    df = spark.range(n).select(
        F.col("id"),
        # independent pseudo-uniform dims from different hash streams
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(100_000))).alias("x"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(100_000))).alias("y"),
    )

    def mean_span(d, col):
        spans = []
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    sorted_dir, z_dir = str(tmp_path / "xsorted"), str(tmp_path / "zorder")
    write_sorted(df, sorted_dir, ["x"], n_files=16)
    bounds = write_zordered(df, z_dir, ["x", "y"], n_files=16)
    assert set(bounds) == {"x", "y"}

    domain = 100_000
    # x-sorted: x tight (~domain/16), y useless (~domain)
    assert mean_span(sorted_dir, "x") < 0.15 * domain
    assert mean_span(sorted_dir, "y") > 0.8 * domain
    # z-ordered: BOTH dims clustered — 16 files on a 2-D curve gives ~1/4
    # linear span per dim (sqrt tradeoff); assert well under half-domain.
    assert mean_span(z_dir, "x") < 0.45 * domain
    assert mean_span(z_dir, "y") < 0.45 * domain
    # nothing lost: same rows, key column not persisted
    back = spark.read.parquet(z_dir)
    assert back.columns == ["id", "x", "y"]
    assert back.count() == n


def test_zorder_key_bounds_and_validation(spark):
    from healthcare_data_pipeline_spark.sources.layout import zorder_key

    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    key, bounds = zorder_key(df, ["id", "v"], bits=8)
    assert bounds == {"id": (0.0, 99.0), "v": (0.0, 198.0)}
    got = df.select(key.alias("k")).agg(F.min("k"), F.max("k")).collect()[0]
    assert got[0] >= 0 and got[1] < (1 << 16)  # 2 cols x 8 bits

    import pytest as _pytest

    with _pytest.raises(ValueError, match="64-bit"):
        zorder_key(df, ["id", "v"], bits=32)
    with _pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])


def test_zorder_append_uses_frozen_bounds(spark, tmp_path):
    """Appends key against the persisted quantizer (never re-derive from the
    batch — that would shift every cell), keep per-file stats tight, and
    leave existing files untouched."""
    import pyarrow.parquet as pq

    from healthcare_data_pipeline_spark.sources.layout import (
        append_zordered,
        write_zordered,
    )

    d = str(tmp_path / "z")
    base = spark.range(10_000).select(
        F.col("id"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1000))).alias("x"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1000))).alias("y"),
    )
    write_zordered(base, d, ["x", "y"], n_files=4)
    files_before = set(glob.glob(os.path.join(d, "*.parquet")))
    mtimes_before = {f: os.path.getmtime(f) for f in files_before}

    # batch with values OUTSIDE the frozen bounds (must clamp, not crash)
    batch = spark.range(10_000, 12_000).select(
        F.col("id"), (F.col("id") % 3000).alias("x"), (F.col("id") % 2500).alias("y")
    )
    append_zordered(batch, d, n_files=2)

    files_after = set(glob.glob(os.path.join(d, "*.parquet")))
    assert files_before < files_after  # strictly additive
    assert all(os.path.getmtime(f) == mtimes_before[f] for f in files_before)
    assert spark.read.parquet(d).count() == 12_000

    # the new files are internally clustered: each new file's x-span is well
    # under the batch's full x-domain (0..2999)
    for f in sorted(files_after - files_before):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("x")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        assert hi - lo < 2500


def test_zorder_sidecar_write_is_atomic_and_tmp_tolerant(spark, tmp_path):
    """The sidecar goes through tmp-write + rename (r7 ADVICE): a stray
    half-written .tmp from a crashed writer must never be read, a rewrite
    must replace the sidecar in one step, and the final state carries no
    .tmp residue."""
    import json

    from healthcare_data_pipeline_spark.sources.layout import (
        _read_zorder_meta,
        write_zordered,
    )

    d = str(tmp_path / "z")
    base = spark.range(1_000).select(
        F.col("id"), (F.col("id") % 100).alias("x"), (F.col("id") % 77).alias("y")
    )
    write_zordered(base, d, ["x", "y"], n_files=2)
    meta_path = os.path.join(d, "_zorder.json")
    assert os.path.exists(meta_path)
    assert not os.path.exists(meta_path + ".tmp")
    with open(meta_path) as fh:
        json.load(fh)  # committed sidecar is complete JSON

    # simulate a crashed writer: a garbage .tmp next to a good sidecar —
    # readers must keep reading the committed file
    with open(meta_path + ".tmp", "w") as fh:
        fh.write('{"cols": ["x"')  # truncated mid-write
    meta = _read_zorder_meta(spark, d)
    assert meta["cols"] == ["x", "y"]

    # a full rewrite replaces the sidecar atomically and clears the residue
    write_zordered(base.withColumn("x", F.col("x") * 2), d, ["x", "y"], n_files=2)
    meta2 = _read_zorder_meta(spark, d)
    assert meta2["bounds"]["x"] != meta["bounds"]["x"]
    assert not os.path.exists(meta_path + ".tmp")

    # reader racing a rewrite's delete-then-rename window (r8 ADVICE): with
    # the sidecar momentarily absent but a committed .tmp present, the reader
    # waits out the window instead of failing — a sibling thread completes
    # the rename mid-wait, and the read returns the new meta.
    import shutil
    import threading

    committed = meta_path + ".tmp"
    shutil.move(meta_path, committed)  # mid-commit state: .tmp only
    t = threading.Timer(0.05, shutil.move, args=(committed, meta_path))
    t.start()
    try:
        meta3 = _read_zorder_meta(spark, d)
    finally:
        t.join()
    assert meta3 == meta2

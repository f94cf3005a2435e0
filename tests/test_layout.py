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

"""End-to-end medallion pipeline (reference ``src/runnerfile.py`` main flow +
the modular ``src/helpers`` sequence, SURVEY.md §3).

raw (CSV/parquet) -> cleansed (dedup + casts + date-partitioned parquet) ->
curated (drug_report + prescriber_report parquet) -> artifacts (data
dictionary CSV, validation report JSON, readable CSVs, optional SQLite) —
with optional PII anonymization between ingest and profiling.

Every stage is a pure DataFrame function from ``operators/``; this module is
only orchestration + IO, so each stage stays independently hash-checkable.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from healthcare_data_pipeline_spark.operators import anonymize as anon
from healthcare_data_pipeline_spark.operators import cleanse, eda, profiling, reports, resolve
from healthcare_data_pipeline_spark.schemas import DOMAIN_SCHEMAS, PARTITION_COLS
from healthcare_data_pipeline_spark.sources import files, sqlite


@dataclass
class PipelineConfig:
    base_dir: str
    raw_dir: str = ""
    cleansed_dir: str = ""
    curated_dir: str = ""
    artifacts_dir: str = ""
    anonymize_pii: bool = True
    mapping_passphrase: str = "healthcare-pipeline"
    ingestion_date: dt.date | None = None
    use_canonical_schemas: bool = True
    export_sqlite: bool = False
    pii_markers: tuple[str, ...] = anon.DEFAULT_PII_MARKERS
    readable_report_limit: int = 10_000
    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.raw_dir = self.raw_dir or os.path.join(self.base_dir, "raw")
        self.cleansed_dir = self.cleansed_dir or os.path.join(self.base_dir, "cleansed")
        self.curated_dir = self.curated_dir or os.path.join(self.base_dir, "curated")
        self.artifacts_dir = self.artifacts_dir or os.path.join(self.base_dir, "artifacts")


def ingest(spark: SparkSession, cfg: PipelineConfig) -> dict[str, DataFrame]:
    """Discover and read raw tables (CSV with canonical schema when known,
    else inference; parquet dirs pass through).

    Discovery goes through the S7 object-store layer (Hadoop FileSystem), so
    ``raw_dir`` may be a bare local path OR any URI Spark's connectors
    resolve (``file://``, ``s3a://``, ...) — the reference's S3-bucket raw
    zone maps 1:1 (src/common/s3.py:100-192)."""
    from healthcare_data_pipeline_spark.sources import objectstore

    dfs: dict[str, DataFrame] = {}
    if "://" not in cfg.raw_dir:
        # local path: CSV discovery walks the filesystem directly
        for name, path in files.discover_csv_tables(cfg.raw_dir).items():
            schema = DOMAIN_SCHEMAS.get(name) if cfg.use_canonical_schemas else None
            dfs[name] = files.read_csv(spark, path, schema=schema)
    else:
        for path in objectstore.list_objects(spark, cfg.raw_dir, suffix=".csv"):
            parent, fname = path.rsplit("/", 2)[-2:]
            name = parent if parent != cfg.raw_dir.rstrip("/").rsplit("/", 1)[-1] else fname[:-4]
            if name not in dfs:
                schema = DOMAIN_SCHEMAS.get(name) if cfg.use_canonical_schemas else None
                dfs[name] = files.read_csv(spark, path, schema=schema)
    # parquet tables: an entry is either a single `<name>.parquet` file or a
    # directory of part-files
    seen_dirs = objectstore.list_subdirs(spark, cfg.raw_dir)
    seen_files = objectstore.list_objects(
        spark, cfg.raw_dir, suffix=".parquet", recursive=False
    )
    for p in sorted(seen_dirs + seen_files):
        entry = p.rstrip("/").rsplit("/", 1)[-1]
        name = entry[: -len(".parquet")] if entry.endswith(".parquet") else entry
        if name in dfs:
            continue
        if entry.endswith(".parquet") or objectstore.list_objects(
            spark, p, suffix=".parquet", recursive=False
        ):
            dfs[name] = spark.read.parquet(p)
    return dfs


def run(spark: SparkSession, cfg: PipelineConfig) -> dict[str, object]:
    """Full pipeline; returns a manifest of outputs and timings.

    Stage progress is appended to ``<artifacts>/pipeline.log`` (the reference
    runner's live log file — run_dashboard.py tails it; dashboard.yml uploads
    it as the CI artifact)."""
    t0 = time.perf_counter()
    manifest: dict[str, object] = {"stages": {}}
    os.makedirs(cfg.artifacts_dir, exist_ok=True)
    log_path = os.path.join(cfg.artifacts_dir, "pipeline.log")

    def log(msg: str) -> None:
        with open(log_path, "a") as fh:
            fh.write(f"{dt.datetime.now().isoformat(timespec='seconds')} [{time.perf_counter() - t0:7.2f}s] {msg}\n")

    log(f"pipeline start base_dir={cfg.base_dir} anonymize={cfg.anonymize_pii}")
    dfs = ingest(spark, cfg)
    manifest["tables"] = sorted(dfs)
    log(f"ingest: {len(dfs)} tables ({', '.join(sorted(dfs))})")

    # Anonymize (before anything is persisted or profiled, as the runner does).
    mapping: dict[str, dict[str, str]] = {}
    if cfg.anonymize_pii:
        for name in sorted(dfs):
            pii_cols = anon.detect_pii_columns(dfs[name], cfg.pii_markers)
            if not pii_cols:
                continue
            mapping.update(
                {f"{name}.{c}": m for c, m in anon.build_mapping(dfs[name], pii_cols).items()}
            )
            dfs[name] = anon.anonymize(dfs[name], pii_cols)
        os.makedirs(cfg.artifacts_dir, exist_ok=True)
        blob = anon.encrypt_mapping(mapping, cfg.mapping_passphrase)
        with open(os.path.join(cfg.artifacts_dir, "pii_mapping.enc"), "wb") as fh:
            fh.write(blob)
    mapped_cols = sorted(k for k in mapping if anon.TRUNCATION_KEY not in k)
    truncated = {
        f"{k.rsplit('.', 1)[0]}.{c}": t["n_dropped"]
        for k, per_col in mapping.items()
        if anon.TRUNCATION_KEY in k
        for c, t in per_col.items()  # type: ignore[union-attr]
        if isinstance(t, dict) and t.get("n_dropped")
    }
    manifest["stages"]["anonymize"] = {
        "mapped_columns": mapped_cols,
        "truncated_columns": truncated,  # never silent (cf. build_mapping cap)
    }
    log(f"anonymize: {len(mapped_cols)} mapped columns, truncated={truncated or 'none'}")

    # Cleanse -> partitioned parquet.  Row metrics ride the write action via
    # the Observation API — zero extra scans (a separate count() would re-read
    # every table; at 100 TB that doubles the stage).
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    cleansed: dict[str, DataFrame] = {}
    cleanse_rows: dict[str, int] = {}
    for name in sorted(dfs):
        cdf = cleanse.cleanse_table(dfs[name], name, cfg.ingestion_date)
        obs = Observation(f"cleanse_{name}")
        cdf = cdf.observe(obs, F.count(F.lit(1)).alias("rows"))
        cleanse.write_zone(cdf, os.path.join(cfg.cleansed_dir, name))
        cleanse_rows[name] = obs.get["rows"]
        cleansed[name] = spark.read.parquet(os.path.join(cfg.cleansed_dir, name))
    manifest["stages"]["cleanse"] = {"dir": cfg.cleansed_dir, "rows": cleanse_rows}
    log(
        f"cleanse: {len(cleansed)} tables -> {cfg.cleansed_dir} "
        f"({sum(cleanse_rows.values())} rows)"
    )

    # Profile (single-pass per table) + EDA report (full-table aggregates,
    # inline-SVG HTML — runnerfile.py:508 / eda.py:205-322 parity).
    profiling.write_artifacts(cleansed, cfg.artifacts_dir)
    eda.generate_eda_report(cleansed, cfg.artifacts_dir)
    manifest["stages"]["profile"] = {"dir": cfg.artifacts_dir}
    log("profile + eda: artifacts written")

    # Transform -> curated reports (canonical path when schemas match, else
    # the heuristic runner path).
    curated: dict[str, DataFrame] = {}
    pd_df = resolve.resolve_table(cleansed, "prescriber_drug")
    drug_df = resolve.resolve_table({k: v for k, v in cleansed.items() if k != "prescriber_drug"}, "drug")
    presc_df = resolve.resolve_table(
        {k: v for k, v in cleansed.items() if k != "prescriber_drug"}, "prescriber"
    )
    state_df = resolve.resolve_table(cleansed, "state")
    if pd_df is not None and drug_df is not None and "drug_brand_name" in pd_df.columns:
        curated["drug_report"] = reports.drug_report(
            pd_df.drop(*PARTITION_COLS), drug_df.drop(*PARTITION_COLS)
        )
    if pd_df is not None and presc_df is not None and state_df is not None and "presc_id" in pd_df.columns:
        curated["prescriber_report"] = reports.prescriber_report(
            pd_df.drop(*PARTITION_COLS),
            presc_df.drop(*PARTITION_COLS),
            state_df.drop(*PARTITION_COLS),
        )
    if not curated and pd_df is not None:
        # Heuristic fallback exactly like runnerfile.py:366-442.
        fact, measure = resolve.with_fallback_measure(pd_df)
        drug_col = resolve.resolve_drug_column(fact)
        if drug_col:
            curated["drug_report"] = reports.runner_drug_report(fact, drug_col, measure)
    for name, df in curated.items():
        files.write_parquet(df, os.path.join(cfg.curated_dir, name))
    manifest["stages"]["transform"] = {"reports": sorted(curated)}
    log(f"transform: reports {', '.join(sorted(curated)) or '(none)'}")

    # Publish readable reports (de-anonymized) + optional SQLite export.
    readable_dir = os.path.join(cfg.artifacts_dir, "readable_reports")
    for name, df in curated.items():
        readable = df
        if cfg.anonymize_pii and mapping:
            col_mapping = {
                col.split(".", 1)[1]: m
                for col, m in mapping.items()
                if col.split(".", 1)[1] in df.columns
            }
            readable = anon.deanonymize(spark, df, col_mapping)
        files.write_csv_report(
            readable, os.path.join(readable_dir, f"{name}.csv"), cfg.readable_report_limit
        )
    if cfg.export_sqlite:
        sqlite.export_to_sqlite(curated, os.path.join(cfg.artifacts_dir, "reports.sqlite"))
    manifest["stages"]["publish"] = {"readable_dir": readable_dir}

    manifest["runtime_sec"] = round(time.perf_counter() - t0, 3)
    os.makedirs(cfg.artifacts_dir, exist_ok=True)
    with open(os.path.join(cfg.artifacts_dir, "pipeline_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True, default=str)
    log(f"pipeline done in {manifest['runtime_sec']}s")
    return manifest


def main(argv: list[str] | None = None) -> int:
    """CLI parity with the reference runner (``python -m src.runnerfile
    --force-fresh --skip-anonymize``; runnerfile.py:602-608 + dashboard.yml)."""
    import argparse
    import shutil

    from healthcare_data_pipeline_spark.session import get_spark

    ap = argparse.ArgumentParser(description="Run the medallion pipeline end-to-end.")
    ap.add_argument("--base-dir", default="local_data", help="root of raw/cleansed/curated/artifacts")
    ap.add_argument("--force-fresh", action="store_true", help="drop cleansed/curated/artifacts first")
    ap.add_argument("--skip-anonymize", action="store_true", help="disable PII anonymization")
    ap.add_argument("--export-sqlite", action="store_true", help="also export reports.sqlite")
    args = ap.parse_args(argv)

    cfg = PipelineConfig(
        base_dir=args.base_dir,
        anonymize_pii=not args.skip_anonymize,
        export_sqlite=args.export_sqlite,
    )
    if args.force_fresh:
        for d in (cfg.cleansed_dir, cfg.curated_dir, cfg.artifacts_dir):
            shutil.rmtree(d, ignore_errors=True)
    spark = get_spark(app_name="hdp-spark-pipeline")
    try:
        manifest = run(spark, cfg)
    finally:
        spark.stop()
    print(json.dumps({"tables": manifest["tables"], "runtime_sec": manifest["runtime_sec"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

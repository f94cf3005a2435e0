"""Reference-parity tests for the healthcare medallion pipeline (FIXTURES.md
golden queries 1-6) against a DuckDB oracle over the same fixture data."""

from __future__ import annotations

import glob
import json
import os

import duckdb
import pytest

from healthcare_data_pipeline_spark.operators import anonymize as anon
from healthcare_data_pipeline_spark.pipeline import PipelineConfig, run
from tests.conftest import compare_with_oracle
from tests.fixtures import make_domain_tables, write_csv_dir


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("medallion"))
    tables = make_domain_tables()
    write_csv_dir(tables, os.path.join(base, "raw"))
    cfg = PipelineConfig(base_dir=base, anonymize_pii=True, export_sqlite=True)
    manifest = run(spark, cfg)
    con = duckdb.connect()
    for name in tables:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_csv_auto('{base}/raw/{name}.csv')"
        )
    return base, cfg, manifest, con


def test_zones_written(spark, pipeline_out):
    base, cfg, manifest, _ = pipeline_out
    # cleansed zone is year=/month=/day= partitioned (S6)
    parts = glob.glob(os.path.join(cfg.cleansed_dir, "prescriber", "year=*", "month=*", "day=*"))
    assert parts, "cleansed zone missing ingestion-date partitions"
    assert sorted(manifest["stages"]["transform"]["reports"]) == [
        "drug_report",
        "prescriber_report",
    ]
    # cleanse row metrics ride the write action (Observation API — no second
    # scan) and must equal what actually landed in the zone
    rows = manifest["stages"]["cleanse"]["rows"]
    assert set(rows) == set(manifest["tables"])
    for name, n in rows.items():
        landed = spark.read.parquet(os.path.join(cfg.cleansed_dir, name)).count()
        assert n == landed, (name, n, landed)


def test_drug_report_matches_oracle(spark, pipeline_out):
    base, cfg, _, con = pipeline_out
    df = spark.read.parquet(os.path.join(cfg.curated_dir, "drug_report"))
    # Reference pipeline anonymizes nothing in this report (no PII columns);
    # oracle replicates groupBy sums + left join on the non-key brand name.
    compare_with_oracle(
        df,
        con,
        """
        SELECT a.presc_id, a.drug_brand_name, a.total_claims, a.total_drug_cost, d.drug_type
        FROM (
          SELECT presc_id, drug_brand_name,
                 SUM(total_claims) AS total_claims,
                 CAST(SUM(CAST(total_drug_cost AS DECIMAL(25,8))) AS DOUBLE) AS total_drug_cost
          FROM (SELECT DISTINCT * FROM prescriber_drug)
          GROUP BY presc_id, drug_brand_name
        ) a
        LEFT JOIN drug d ON a.drug_brand_name = d.drug_brand_name
        """,
        name="drug_report",
        # the domain report keeps reference double-sum semantics (F.sum on
        # double), which is order-dependent — compare at 4 decimals
        float_ndigits=4,
    )


def test_prescriber_report_rows_and_state_join(spark, pipeline_out):
    base, cfg, _, con = pipeline_out
    df = spark.read.parquet(os.path.join(cfg.curated_dir, "prescriber_report"))
    got = df.count()
    want = con.execute(
        "SELECT COUNT(DISTINCT presc_id) FROM (SELECT DISTINCT * FROM prescriber_drug)"
    ).fetchone()[0]
    assert got == want
    # state join resolved a non-null presc_state for every prescriber
    assert df.filter(df.presc_state.isNull()).count() == 0
    # names are anonymized in the curated zone (sha256 hex = 64 chars)
    sample = df.select("presc_fullname").first().presc_fullname
    assert len(sample) == 64 and all(ch in "0123456789abcdef" for ch in sample)


def test_sum_widens_to_long(spark, pipeline_out):
    """Reference curated parquet shows total_claims widened int->long (§1.2)."""
    base, cfg, _, _ = pipeline_out
    df = spark.read.parquet(os.path.join(cfg.curated_dir, "drug_report"))
    assert dict(df.dtypes)["total_claims"] == "bigint"


def test_readable_report_restores_names(spark, pipeline_out):
    base, cfg, _, con = pipeline_out
    path = os.path.join(cfg.artifacts_dir, "readable_reports", "prescriber_report.csv")
    assert os.path.exists(path)
    restored = con.execute(
        f"SELECT COUNT(*) FROM read_csv_auto('{path}') r JOIN prescriber p "
        "ON r.presc_fullname = p.presc_fullname AND r.presc_id = p.presc_id"
    ).fetchone()[0]
    total = con.execute(f"SELECT COUNT(*) FROM read_csv_auto('{path}')").fetchone()[0]
    assert restored == total, "de-anonymization failed to restore original names"


def test_validation_report_artifact(pipeline_out):
    base, cfg, _, con = pipeline_out
    with open(os.path.join(cfg.artifacts_dir, "validation_report.json")) as fh:
        report = json.load(fh)
    want = con.execute("SELECT COUNT(*) FROM (SELECT DISTINCT * FROM prescriber_drug)").fetchone()[0]
    assert report["prescriber_drug"]["rows"] == want
    assert set(report) == {"prescriber", "drug", "prescriber_drug", "state"}
    assert report["drug"]["null_counts"]["drug_brand_name"] == 0


def test_data_dictionary_artifact(pipeline_out):
    base, cfg, _, con = pipeline_out
    path = os.path.join(cfg.artifacts_dir, "data_dictionary.csv")
    n_brands = con.execute(
        f"SELECT unique_count FROM read_csv_auto('{path}') "
        "WHERE \"table\"='drug' AND \"column\"='drug_brand_name'"
    ).fetchone()[0]
    assert n_brands == 10  # deliberately non-unique brand dim (FIXTURES.md)


def test_sqlite_export(pipeline_out):
    import sqlite3

    base, cfg, _, _ = pipeline_out
    db = os.path.join(cfg.artifacts_dir, "reports.sqlite")
    assert os.path.exists(db)
    con = sqlite3.connect(db)
    tables = {r[0] for r in con.execute("SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"drug_report", "prescriber_report"} <= tables
    idx = {r[0] for r in con.execute("SELECT name FROM sqlite_master WHERE type='index'")}
    assert any("presc_id" in i for i in idx)
    con.close()


def test_anonymize_digest_parity(spark):
    """F1 (F.sha2) and F4 (hashlib.sha256) must produce identical digests —
    the property the readable-report join-back depends on (runnerfile.py:267,271)."""
    df = spark.createDataFrame([("Dr Meera Rao",), ("Dr Arjun Das",)], "presc_fullname string")
    hashed = anon.anonymize(df, ["presc_fullname"]).collect()
    assert hashed[0].presc_fullname == anon.sha256_hex("Dr Meera Rao")
    assert hashed[1].presc_fullname == anon.sha256_hex("Dr Arjun Das")


def test_mapping_encryption_roundtrip():
    mapping = {"prescriber.presc_fullname": {anon.sha256_hex("x"): "x"}}
    blob = anon.encrypt_mapping(mapping, "secret")
    assert anon.decrypt_mapping(blob, "secret") == mapping
    with pytest.raises(ValueError):
        anon.decrypt_mapping(blob, "wrong-passphrase")
    with pytest.raises(ValueError):
        anon.decrypt_mapping(blob[:-1] + bytes([blob[-1] ^ 1]), "secret")


def test_mapping_encryption_fresh_keystream_per_call():
    """Two encryptions of the SAME mapping under the SAME passphrase must share
    no keystream (distinct nonces -> distinct ciphertexts), otherwise XOR of
    two ciphertexts would leak plaintext structure (two-time pad)."""
    mapping = {"prescriber.presc_fullname": {anon.sha256_hex("x"): "x"}}
    b1 = anon.encrypt_mapping(mapping, "secret")
    b2 = anon.encrypt_mapping(mapping, "secret")
    n1, c1 = b1[:16], b1[48:]
    n2, c2 = b2[:16], b2[48:]
    assert n1 != n2 and c1 != c2
    # Keystreams diverge from the first byte: XOR of the two ciphertexts of
    # identical plaintext equals XOR of the keystreams — must be nonzero
    # everywhere a shared keystream would make it zero.
    xored = bytes(a ^ b for a, b in zip(c1, c2))
    assert any(xored)  # not the identical keystream
    ks1 = anon._keystream(anon._derive_keys("secret", n1)[0], 64)
    ks2 = anon._keystream(anon._derive_keys("secret", n2)[0], 64)
    assert ks1[:16] != ks2[:16]  # no shared keystream prefix
    # MAC key independent of the encryption key.
    enc_key, mac_key = anon._derive_keys("secret", n1)
    assert enc_key != mac_key
    # Both blobs still decrypt.
    assert anon.decrypt_mapping(b1, "secret") == mapping
    assert anon.decrypt_mapping(b2, "secret") == mapping
    # Nonce swap between files must fail the tag (tag binds the nonce).
    forged = b2[:16] + b1[16:]
    with pytest.raises(ValueError):
        anon.decrypt_mapping(forged, "secret")


def test_build_mapping_cap_is_never_silent(spark):
    """A >cap-cardinality PII column must surface its truncation in the
    mapping artifact (the __truncation__ entry) AND warn — the r9 verdict's
    silent-cap finding.  Columns under the cap record zero drops and no
    warning fires."""
    import warnings

    import pytest as _pytest

    df = spark.range(200).selectExpr(
        "concat('person_', CAST(id AS STRING)) AS presc_fullname"
    )
    with _pytest.warns(RuntimeWarning, match="cap"):
        m = anon.build_mapping(df, ["presc_fullname"], cap=50)
    t = m[anon.TRUNCATION_KEY]["presc_fullname"]
    assert t == {"n_distinct": 200, "n_mapped": 50, "n_dropped": 150}
    assert len(m["presc_fullname"]) == 50
    # artifact round-trips with the metadata intact
    blob = anon.encrypt_mapping(m, "secret")
    assert anon.decrypt_mapping(blob, "secret") == m
    # deanonymize skips the metadata entry (it is not a column)
    out = anon.deanonymize(spark, anon.anonymize(df, ["presc_fullname"]), m)
    n_restored = out.filter("presc_fullname LIKE 'person_%'").count()
    assert n_restored == 50  # compat mode: incomplete past the cap, by contract

    # under the cap: exact counts, no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        m2 = anon.build_mapping(df.limit(10), ["presc_fullname"], cap=50)
    assert m2[anon.TRUNCATION_KEY]["presc_fullname"]["n_dropped"] == 0


def test_distributed_mapping_roundtrip_past_the_cap(spark, tmp_path):
    """The 100 TB mapping path: build_mapping_table keeps the mapping a
    DataFrame (no driver materialization, no cap), persists as parquet, and
    deanonymize_with_table restores a >cap-cardinality column LOSSLESSLY —
    the remedy the compat-mode truncation warning points at."""
    df = spark.range(200).selectExpr(
        "concat('person_', CAST(id AS STRING)) AS presc_fullname",
        "concat('+1-555-', CAST(id % 7 AS STRING)) AS phone",
        "CAST(id AS STRING) AS payload",
    )
    mt = anon.build_mapping_table(df, ["presc_fullname", "phone"])
    path = str(tmp_path / "pii_mapping_parquet")
    mt.write.parquet(path)
    hashed = anon.anonymize(df, ["presc_fullname", "phone"])
    restored = anon.deanonymize_with_table(
        hashed, spark.read.parquet(path), broadcast_small=True
    )
    orig = {(r.presc_fullname, r.phone, r.payload) for r in df.collect()}
    back = {(r.presc_fullname, r.phone, r.payload) for r in restored.collect()}
    assert back == orig  # lossless at any cardinality
    # unmapped hashes fall back to themselves (m.get(x, x) semantics)
    partial = anon.deanonymize_with_table(
        hashed, spark.read.parquet(path).filter("column = 'phone'")
    )
    rows = partial.collect()
    assert all(len(r.presc_fullname) == 64 for r in rows)  # still hashed
    assert all(r.phone.startswith("+1-555-") for r in rows)  # restored

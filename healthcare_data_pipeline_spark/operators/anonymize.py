"""PII anonymization subsystem (reference ``runnerfile.py:248-313,523-554``).

Reference semantics preserved:
- PII columns detected per table by substring-config match (:256-258);
- a bounded distinct-value mapping original -> sha256 hexdigest (:261-268),
  where the driver-side ``hashlib.sha256`` digest must equal Spark's
  ``F.sha2(col, 256)`` so readable reports can join back (F1 <-> F4 parity,
  tested);
- column overwrite with ``F.sha2(cast(value AS string), 256)`` (:271);
- the mapping file encrypted with a SHA-256-derived keystream (:286-309) —
  stdlib XOR-CTR keystream + HMAC-SHA256 integrity tag here (the reference's
  AES-GCM path needs a crypto package this image doesn't ship; the XOR
  fallback is the reference's own second mode);
- de-anonymization of readable reports by hash -> original mapping (:523-554),
  implemented as a broadcast join instead of a driver-side dict apply.

Scale: hashing is distributed and stateless; only the bounded mapping
(``distinct().limit(cap)``) ever reaches the driver — at 100 TB the mapping
becomes a table join, which is exactly what ``deanonymize`` already does.
"""

from __future__ import annotations

import hashlib
import hmac
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.localrel import local_relation

# Person-PII markers; deliberately NOT the bare "name" substring — that would
# catch non-PII business columns like drug_brand_name/state_name and break the
# brand-name dim join downstream (the reference's config lists person columns).
DEFAULT_PII_MARKERS = ("fullname", "first_name", "last_name", "address", "phone", "email", "ssn", "dob")
DEFAULT_MAPPING_CAP = 100_000  # runnerfile.py:261


def detect_pii_columns(df: DataFrame, markers: tuple[str, ...] = DEFAULT_PII_MARKERS) -> list[str]:
    """Substring-config PII detection (runnerfile.py:256-258)."""
    return [c for c in df.columns if any(m in c.lower() for m in markers)]


def sha256_hex(value: str) -> str:
    """Driver-side digest — must equal ``F.sha2(value, 256)`` (F4<->F1)."""
    return hashlib.sha256(value.encode("utf-8")).hexdigest()


# Reserved metadata key inside the mapping artifact.  It is not a column
# name, so every mapping consumer (deanonymize's ``c not in df.columns``
# guard, encrypt/decrypt's JSON round-trip) passes it through untouched.
TRUNCATION_KEY = "__truncation__"


def build_mapping(
    df: DataFrame, columns: list[str], cap: int = DEFAULT_MAPPING_CAP
) -> dict[str, dict[str, str]]:
    """Bounded distinct-value mapping per column: {column: {hash: original}}.

    The cap replicates reference compat semantics (runnerfile.py:261), but is
    never SILENT: the artifact carries a ``__truncation__`` entry recording,
    per column, how many distinct values existed vs how many were mapped
    (one extra bounded aggregation), and a RuntimeWarning fires when
    anything was dropped — a >cap-cardinality PII column would otherwise
    de-anonymize incompletely with no signal.  For lossless round-trips past
    the cap, use the distributed form (``build_mapping_table`` +
    ``deanonymize_with_table``) — the mapping stays a table and never
    reaches the driver.
    """
    mapping: dict[str, dict[str, str]] = {}
    truncation: dict[str, dict[str, int]] = {}
    for c in columns:
        col_vals = (
            df.select(F.col(c).cast("string").alias("v"))
            .where(F.col("v").isNotNull())
            .distinct()
        )
        values = col_vals.limit(cap).collect()
        n_mapped = len(values)
        # only pay the exact-count aggregation when the cap was actually hit
        n_distinct = col_vals.count() if n_mapped == cap else n_mapped
        mapping[c] = {sha256_hex(r.v): r.v for r in values}
        truncation[c] = {
            "n_distinct": n_distinct,
            "n_mapped": n_mapped,
            "n_dropped": n_distinct - n_mapped,
        }
    dropped = {c: t["n_dropped"] for c, t in truncation.items() if t["n_dropped"]}
    if dropped:
        import warnings

        warnings.warn(
            f"build_mapping hit the {cap}-value cap and dropped distinct PII values "
            f"{dropped}; de-anonymization through this mapping will be INCOMPLETE for "
            "those columns. Use build_mapping_table/deanonymize_with_table for a "
            "lossless distributed mapping.",
            RuntimeWarning,
            stacklevel=2,
        )
    mapping[TRUNCATION_KEY] = truncation  # type: ignore[assignment]
    return mapping


def build_mapping_table(df: DataFrame, columns: list[str]) -> DataFrame:
    """UNBOUNDED distributed mapping table (column, hash, original) — the
    100 TB form of ``build_mapping``: one distinct per PII column, unioned;
    nothing ever reaches the driver, so cardinality is irrelevant.  Persist
    it as parquet next to the anonymized output and de-anonymize by join
    (``deanonymize_with_table``)."""
    parts = [
        df.select(
            F.lit(c).alias("column"),
            F.sha2(F.col(c).cast("string"), 256).alias("hash"),
            F.col(c).cast("string").alias("original"),
        )
        .where(F.col("original").isNotNull())
        .distinct()
        for c in columns
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def deanonymize_with_table(
    df: DataFrame, mapping: DataFrame, broadcast_small: bool = False
) -> DataFrame:
    """Readable-report restoration via JOINS against a distributed mapping
    table (``build_mapping_table`` output or its persisted parquet) — the
    lossless path for >cap cardinalities.  Per mapped column: left join on
    the hash, fall back to the hash when unmapped (the same ``m.get(x, x)``
    semantics as ``deanonymize``).  ``broadcast_small=True`` hints the
    mapping side when the caller knows it fits (otherwise Spark/AQE picks
    the strategy — at 1B+ mapped values a sort-merge join is the right
    plan, which is exactly why this path exists)."""
    cols = [r.column for r in mapping.select("column").distinct().collect()]
    out = df
    for c in cols:
        if c not in out.columns:
            continue
        m = mapping.filter(F.col("column") == c).select(
            F.col("hash").alias(f"__hash_{c}"), F.col("original").alias(f"__orig_{c}")
        )
        if broadcast_small:
            m = F.broadcast(m)
        out = (
            out.join(m, out[c] == m[f"__hash_{c}"], "left")
            .withColumn(c, F.coalesce(F.col(f"__orig_{c}"), F.col(c)))
            .drop(f"__hash_{c}", f"__orig_{c}")
        )
    return out


def anonymize(df: DataFrame, columns: list[str]) -> DataFrame:
    """Overwrite PII columns with sha2-256 of their string form (runnerfile.py:271)."""
    out = df
    for c in columns:
        out = out.withColumn(c, F.sha2(F.col(c).cast("string"), 256))
    return out


def deanonymize(
    spark: SparkSession, df: DataFrame, mapping: dict[str, dict[str, str]]
) -> DataFrame:
    """Readable-report restoration via broadcast joins (J6; runnerfile.py:523-554).

    For each mapped column, join hash -> original and fall back to the hash
    when no mapping entry exists (reference ``m.get(str(x), x)`` semantics).
    """
    out = df
    for c, m in mapping.items():
        if c not in out.columns or not m:
            continue
        mdf = local_relation(
            spark, [(h, o) for h, o in m.items()], f"__hash_{c} string, __orig_{c} string"
        )
        out = (
            out.join(F.broadcast(mdf), out[c] == mdf[f"__hash_{c}"], "left")
            .withColumn(c, F.coalesce(F.col(f"__orig_{c}"), F.col(c)))
            .drop(f"__hash_{c}", f"__orig_{c}")
        )
    return out


# ---------------------------------------------------------------------------
# Mapping-file encryption: SHA-256-derived XOR keystream (CTR-style) + HMAC tag.
# ---------------------------------------------------------------------------


def _keystream(key: bytes, n: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < n:
        out.extend(hashlib.sha256(key + counter.to_bytes(8, "big")).digest())
        counter += 1
    return bytes(out[:n])


def _derive_keys(passphrase: str, nonce: bytes) -> tuple[bytes, bytes]:
    """Per-encryption keystream key (nonce-mixed) + independent MAC key.

    Mixing a fresh random nonce into the keystream derivation means two
    encryptions under the same passphrase never share a keystream (no
    two-time pad); deriving the MAC key separately keeps the
    encrypt-then-MAC composition out of related-key territory.
    """
    base = hashlib.sha256(passphrase.encode("utf-8")).digest()
    enc_key = hashlib.sha256(base + nonce).digest()
    mac_key = hashlib.sha256(base + b"mac").digest()
    return enc_key, mac_key


def encrypt_mapping(mapping: dict[str, dict[str, str]], passphrase: str) -> bytes:
    """Serialize + XOR-keystream-encrypt + HMAC-tag the mapping.

    Layout: ``nonce(16) || tag(32) || ciphertext``; the tag authenticates
    ``nonce || ciphertext`` so neither can be swapped between files.
    """
    import os as _os

    nonce = _os.urandom(16)
    enc_key, mac_key = _derive_keys(passphrase, nonce)
    plain = json.dumps(mapping, sort_keys=True).encode("utf-8")
    cipher = bytes(a ^ b for a, b in zip(plain, _keystream(enc_key, len(plain))))
    tag = hmac.new(mac_key, nonce + cipher, hashlib.sha256).digest()
    return nonce + tag + cipher


def decrypt_mapping(blob: bytes, passphrase: str) -> dict[str, dict[str, str]]:
    nonce, tag, cipher = blob[:16], blob[16:48], blob[48:]
    enc_key, mac_key = _derive_keys(passphrase, nonce)
    if not hmac.compare_digest(tag, hmac.new(mac_key, nonce + cipher, hashlib.sha256).digest()):
        raise ValueError("mapping integrity check failed (wrong passphrase or corrupt file)")
    plain = bytes(a ^ b for a, b in zip(cipher, _keystream(enc_key, len(cipher))))
    return json.loads(plain.decode("utf-8"))

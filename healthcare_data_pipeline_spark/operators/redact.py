"""[EXT] PII redaction — regex scrubbing of emails / phone numbers / SSN-shaped ids.

A training-data pipeline scrubs contact-info-shaped spans before anything
else sees the text.  ``redact_pii`` replaces matches of a small, auditable
pattern set with typed placeholder tags and reports per-pattern match
counts (the audit signal: how much was scrubbed, per document / per shard).

Pure ``regexp_replace`` / ``regexp_count`` column expressions — JVM-side,
codegen'd, one narrow projection, no UDF.  Every pattern is RE2-safe
(no lookaround, no backreferences) so Spark's Java regex and other engines
(RE2-based: DuckDB, Go) match identical spans — which is what makes the
catalog entry t10 value-hash-verifiable cross-engine, and what keeps a
redaction pass reproducible across engine migrations at 100 TB.

Reference has no PII surface beyond hashing (SURVEY.md §2.11 anonymize);
this extends it to free-text scrubbing [EXT].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe patterns (shared verbatim with the SQL oracle in queries/text.py).
EMAIL_PAT = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_PAT = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
SSN_PAT = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"

PATTERNS = (
    ("email", EMAIL_PAT, "[EMAIL]"),
    ("ssn", SSN_PAT, "[ID]"),  # before phone: xxx-xx-xxxx must not half-match as phone
    ("phone", PHONE_PAT, "[PHONE]"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace ``text_col`` with its redacted form and append per-pattern
    match counts (``n_email``, ``n_ssn``, ``n_phone``).

    Counts are computed on the original text; replacement is applied in
    PATTERNS order (SSN before phone, so an SSN-shaped span is tagged [ID]
    rather than partially consumed by the phone pattern).
    """
    out = df
    for name, pat, _ in PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)).cast("long"))
    red = F.col(text_col)
    for _, pat, tag in PATTERNS:
        red = F.regexp_replace(red, pat, tag)
    return out.withColumn(text_col, red)

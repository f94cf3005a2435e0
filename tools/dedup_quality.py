"""Dedup EFFECTIVENESS harness: precision/recall against planted near-dups.

SCALE.md measures how fast the dedup family grows; the catalog oracles prove
the plans compute what they claim.  Neither measures whether the operators
actually CATCH realistic near-duplicates — the property a curation pipeline
exists for.  This harness plants ground-truth near-dup families at known
rates into an operator-cleaned corpus, re-runs the operator, and reports
per-family recall plus operator-level precision, at 1x/16x/64x corpus
replication — so recall regressions become visible the way bench
regressions are (the numbers land in SCALE.md's quality section).

Methodology (per operator):

1. **Clean**: run the operator once on the base corpus and keep its output.
   For ``dedup_corpus`` and ``semdedup`` the survivor set is a FIXPOINT
   (survivors share no LSH band / no within-cell above-threshold pair, so a
   re-run removes nothing) — any removal on the planted corpus is therefore
   either a planted catch (TP) or a false positive (FP), never leftover
   natural duplication.  ``remove_duplicate_spans`` is NOT a fixpoint
   (deletion seams form new k-windows), so it is measured DIFFERENTIALLY:
   operator(clean + plants) vs operator(clean) — non-planted docs that
   differ between the two runs are the FPs.
2. **Plant**: deterministic variant families at known rates (doc_id ranges,
   hash-derived perturbations — reruns plant identically):
   - ``ws_rewrap``  whitespace-only rewrap (doubled spaces + padding);
     exact-dup after normalization — the exact stage's ground truth.
   - ``suffix_2tok`` two appended unique tokens (~96% shingle Jaccard).
   - ``edit_5pct`` / ``edit_10pct`` every 20th/10th token replaced with a
     hash token (~0.8 / ~0.65 shingle Jaccard) — the MinHash-LSH band
     structure's published recall trade, measured.
   - ``emb_tiny`` / ``emb_noise`` one-component nudge (cos ~1) and
     per-component jitter (cos ~0.97) on embeddings; ground truth is
     restricted to pairs whose TRUE cosine clears the semdedup threshold
     (the operator's own contract), computed exactly per pair.
   - ``boilerplate_12tok`` a shared 12-token span appended to 2% of docs —
     span dedup's ground truth (k=8: five full planted windows per doc).
3. **Measure**: recall = caught planted variants / planted (a variant is
   caught when the re-run removes it — originals always survive because the
   canonical-keeper rule is min-id and variants get larger ids).  Each
   family also reports its mean TRUE similarity (3-shingle Jaccard /
   cosine), so recall is read against how hard the family actually is.
   Precision = TP / (TP + FP) with FP = clean items the re-run removed
   (incl. clean docs dragged into a component through a planted variant —
   a real false-merge mode).

Scale replication reuses tools/scale_stress.build_corpora for documents
(per-replica token rewrite: duplicate structure preserved within a replica,
no cross-replica collisions).  Embeddings are replicated with a per-replica
cyclic component SHIFT (norms exactly preserved, replicas decorrelated —
the parquet replicas copy vectors verbatim, which would collapse under
semdedup's cosine-1 exact twins and measure nothing).  SemDeDup cells use a
sign-bit partition sized to ~50 vectors/cell (the paper's bounded-cell
regime; a pure function of the vector, so the clean/planted runs share the
assignment and the fixpoint argument holds) — standing in for the k-means
coarse quantizer, with the same boundary-miss failure mode the recall
column exists to expose.

Usage:  python tools/dedup_quality.py [--scales 1,16,64] [--base .../sf0.1]
Writes: the DEDUP-QUALITY section of SCALE.md (marker-delimited; the scale
harness preserves it) + one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_data_pipeline_spark.session import get_spark  # noqa: E402

QUALITY_BEGIN = "<!-- DEDUP-QUALITY BEGIN -->"
QUALITY_END = "<!-- DEDUP-QUALITY END -->"

# Variant ids: orig + family offset.  Base doc/vec ids stay < 64 replicas *
# 10M = 6.4e8, so 1e9 steps never collide with corpus ids or each other.
FAM_OFFSET = 1_000_000_000

SEM_THRESHOLD = 0.95
SPAN_K = 8
BP_TOKENS = " ".join(f"zbp{i}" for i in range(12))


# ---------------------------------------------------------------- planting
def _doc_variants(clean: DataFrame) -> DataFrame:
    """Planted text-variant table (doc_id, text, source, family, orig_id):
    one variant per clean doc in each family's 2% id slice."""
    tok_edit = (
        "array_join(transform(split(text, ' '), (t, i) -> "
        "CASE WHEN i % {step} = {phase} THEN substring(md5(concat(t, '_e{fam}')), 1, 8) "
        "ELSE t END), ' ')"
    )
    fams = [
        ("ws_rewrap", 0, "concat('  ', replace(text, ' ', '  '), ' ')"),
        ("suffix_2tok", 1, "concat(text, ' zsfx', CAST(doc_id AS STRING), ' zsfy', CAST(doc_id AS STRING))"),
        ("edit_5pct", 2, tok_edit.format(step=20, phase=10, fam=5)),
        ("edit_10pct", 3, tok_edit.format(step=10, phase=5, fam=10)),
    ]
    out = None
    for name, fi, expr in fams:
        v = clean.filter((F.col("doc_id") % 100) >= 2 * fi).filter(
            (F.col("doc_id") % 100) < 2 * fi + 2
        ).select(
            (F.col("doc_id") + FAM_OFFSET * (fi + 1)).alias("doc_id"),
            F.expr(expr).alias("text"),
            "source",
            F.lit(name).alias("family"),
            F.col("doc_id").alias("orig_id"),
        )
        out = v if out is None else out.unionByName(v)
    return out


def _shingle_jaccard(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """TRUE 3-shingle Jaccard per (orig_id, doc_id) planted pair — what the
    MinHash signatures estimate, computed exactly so recall can be read
    against family hardness.  ``pairs``: (orig_id, doc_id); ``docs`` carries
    both sides' text."""
    sh = docs.selectExpr(
        "doc_id AS sid", "split(lower(text), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+') AS toks"
    ).selectExpr(
        "sid",
        "explode(array_distinct(CASE WHEN size(toks) >= 3 THEN transform("
        "sequence(1, size(toks) - 2), i -> concat(element_at(toks, i), ' ', "
        "element_at(toks, i + 1), ' ', element_at(toks, i + 2))) ELSE array() END)) AS g",
    )
    sizes = sh.groupBy("sid").agg(F.count("*").alias("n"))
    a = sh.join(F.broadcast(pairs), sh.sid == pairs.orig_id).select("orig_id", "doc_id", "g")
    b = sh.select(F.col("sid").alias("doc_id"), "g")
    inter = a.join(b, ["doc_id", "g"]).groupBy("orig_id", "doc_id").agg(F.count("*").alias("i"))
    return (
        pairs.join(inter, ["orig_id", "doc_id"], "left")
        .join(sizes.withColumnRenamed("sid", "orig_id").withColumnRenamed("n", "na"), "orig_id")
        .join(sizes.withColumnRenamed("sid", "doc_id").withColumnRenamed("n", "nb"), "doc_id")
        .select(
            "orig_id",
            "doc_id",
            (
                F.coalesce("i", F.lit(0)).cast("double")
                / (F.col("na") + F.col("nb") - F.coalesce("i", F.lit(0)))
            ).alias("jaccard"),
        )
    )


def measure_doc_dedup(spark, docs: DataFrame) -> list[dict]:
    """dedup_corpus (exact + MinHash-LSH front door) vs planted families."""
    from healthcare_data_pipeline_spark.operators.dedup_corpus import dedup_corpus

    clean = dedup_corpus(docs, hasher="fast").select("doc_id", "text", "source")
    clean.cache()
    n_clean = clean.count()
    variants = _doc_variants(clean)
    planted = clean.unionByName(variants.select("doc_id", "text", "source"))
    survivors = dedup_corpus(planted, hasher="fast").select("doc_id")
    truth = variants.select("family", "orig_id", "doc_id")
    jac = _shingle_jaccard(
        truth.select("orig_id", "doc_id"),
        planted.select("doc_id", "text"),
    )
    verdicts = (
        truth.join(survivors.withColumn("__alive", F.lit(1)), "doc_id", "left")
        .join(jac, ["orig_id", "doc_id"])
        .groupBy("family")
        .agg(
            F.count("*").alias("planted"),
            F.sum(F.when(F.col("__alive").isNull(), 1).otherwise(0)).alias("caught"),
            F.avg("jaccard").alias("similarity"),
        )
        .collect()
    )
    # FP: clean (fixpoint) docs the planted run removed — incl. false merges
    # through a variant bridge
    fp = clean.select("doc_id").join(survivors, "doc_id", "left_anti").count()
    clean.unpersist()
    rows = [
        {
            "operator": "dedup_corpus",
            "family": r.family,
            "planted": r.planted,
            "caught": int(r.caught),
            "recall": round(r.caught / r.planted, 3) if r.planted else None,
            "similarity": round(r.similarity, 3),
        }
        for r in verdicts
    ]
    tp = sum(r["caught"] for r in rows)
    rows.append(
        {
            "operator": "dedup_corpus",
            "family": "(precision)",
            "planted": n_clean,
            "caught": tp,
            "fp": fp,
            "precision": round(tp / (tp + fp), 4) if tp + fp else None,
        }
    )
    return rows


# ------------------------------------------------------------- embeddings
def _scaled_embeddings(spark, base: str, k: int) -> DataFrame:
    """Base quantized embeddings replicated k-fold with a per-replica cyclic
    component shift: norms exactly preserved, replicas decorrelated (verbatim
    copies would be cosine-1 twins and semdedup would collapse them before
    any planted variant could be measured)."""
    e = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    iv = F.transform(F.col("embedding"), lambda x: F.round(x.cast("double") * 1000000.0))
    en = e.select("vec_id", "label", iv.alias("iv"))
    reps = spark.range(k).select(F.col("id").alias("rep"))
    shifted = en.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        "label",
        F.expr(
            "CASE WHEN rep % 64 = 0 THEN iv ELSE concat("
            "slice(iv, CAST(rep % 64 AS INT) + 1, 64 - CAST(rep % 64 AS INT)), "
            "slice(iv, 1, CAST(rep % 64 AS INT))) END"
        ).alias("iv"),
    )
    nrm2 = F.aggregate(
        F.zip_with(F.col("iv"), F.col("iv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return shifted.withColumn("nrm2", nrm2)


def _sign_cells(en: DataFrame, n_planes: int) -> DataFrame:
    """(vec_id, iv, nrm2, label, cell) via the sign-bit partition — a pure
    function of the vector (clean and planted runs agree), sized by the
    caller to ~50 vectors/cell."""
    from healthcare_data_pipeline_spark.operators.similarity import lsh_bucket

    return lsh_bucket(en, n_planes=n_planes).withColumnRenamed("bucket", "cell")


def _emb_variants(clean: DataFrame) -> DataFrame:
    """Planted embedding variants (vec_id, label, iv, family, orig_id):
    emb_tiny nudges one component (+1000 of the 1e6 scale, cos ~1);
    emb_noise jitters every component uniformly +-54000 (cos ~0.97 against
    a ~1e6-norm vector) — hash-derived, reruns plant identically."""
    tiny = clean.filter(F.col("vec_id") % 100 < 3).select(
        (F.col("vec_id") + FAM_OFFSET).alias("vec_id"),
        "label",
        F.expr(
            "transform(iv, (x, i) -> CASE WHEN i = 0 THEN x + 1000.0 ELSE x END)"
        ).alias("iv"),
        F.lit("emb_tiny").alias("family"),
        F.col("vec_id").alias("orig_id"),
    )
    noise = clean.filter((F.col("vec_id") % 100 >= 3) & (F.col("vec_id") % 100 < 6)).select(
        (F.col("vec_id") + 2 * FAM_OFFSET).alias("vec_id"),
        "label",
        F.expr(
            "transform(iv, (x, i) -> x + CAST(pmod(xxhash64(concat(CAST(vec_id AS STRING), "
            "'_', CAST(i AS STRING))), 108001) - 54000 AS DOUBLE))"
        ).alias("iv"),
        F.lit("emb_noise").alias("family"),
        F.col("vec_id").alias("orig_id"),
    )
    nrm2 = F.aggregate(
        F.zip_with(F.col("iv"), F.col("iv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return tiny.unionByName(noise).withColumn("nrm2", nrm2)


def measure_semdedup(spark, en: DataFrame) -> list[dict]:
    """semdedup (cell-scoped pairwise cosine) vs planted embedding variants.
    Ground truth restricted to pairs whose TRUE cosine clears the threshold
    — below-threshold jitter realizations are not dups by the operator's
    own contract and are excluded from both recall and FP accounting."""
    from healthcare_data_pipeline_spark.operators.similarity import semdedup

    n = en.count()
    n_planes = max(4, math.ceil(math.log2(max(2, n / 50))))
    clean = (
        semdedup(en, threshold=SEM_THRESHOLD, assigned=_sign_cells(en, n_planes))
        .select("vec_id", "label", "iv", "nrm2")
    )
    clean.cache()
    n_clean = clean.count()
    variants = _emb_variants(clean)
    # exact planted-pair cosine (integer-valued doubles -> exact dots)
    vdot = F.aggregate(
        F.zip_with(F.col("iv"), F.col("o_iv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    truth = (
        variants.join(
            clean.select(
                F.col("vec_id").alias("orig_id"),
                F.col("iv").alias("o_iv"),
                F.col("nrm2").alias("o_nrm2"),
            ),
            "orig_id",
        )
        .select(
            "family",
            "orig_id",
            "vec_id",
            (vdot / (F.sqrt(F.col("nrm2")) * F.sqrt(F.col("o_nrm2")))).alias("cosine"),
        )
        .filter(F.col("cosine") >= SEM_THRESHOLD)
    )
    planted = clean.unionByName(variants.select("vec_id", "label", "iv", "nrm2"))
    survivors = semdedup(
        planted, threshold=SEM_THRESHOLD, assigned=_sign_cells(planted, n_planes)
    ).select("vec_id")
    verdicts = (
        truth.join(survivors.withColumn("__alive", F.lit(1)), "vec_id", "left")
        .groupBy("family")
        .agg(
            F.count("*").alias("planted"),
            F.sum(F.when(F.col("__alive").isNull(), 1).otherwise(0)).alias("caught"),
            F.avg("cosine").alias("similarity"),
        )
        .collect()
    )
    fp = clean.select("vec_id").join(survivors, "vec_id", "left_anti").count()
    clean.unpersist()
    rows = [
        {
            "operator": "semdedup",
            "family": r.family,
            "planted": r.planted,
            "caught": int(r.caught),
            "recall": round(r.caught / r.planted, 3) if r.planted else None,
            "similarity": round(r.similarity, 4),
        }
        for r in verdicts
    ]
    tp = sum(r["caught"] for r in rows)
    rows.append(
        {
            "operator": "semdedup",
            "family": "(precision)",
            "planted": n_clean,
            "caught": tp,
            "fp": fp,
            "precision": round(tp / (tp + fp), 4) if tp + fp else None,
        }
    )
    return rows


# ------------------------------------------------------------- span dedup
def measure_span_dedup(spark, docs: DataFrame) -> list[dict]:
    """remove_duplicate_spans vs a planted cross-document boilerplate span.
    Differential FP accounting: the operator is not a fixpoint (deletion
    seams form new k-windows), so non-planted docs are compared between
    operator(clean) and operator(clean + plants) — only differences CAUSED
    by planting count as FPs."""
    from healthcare_data_pipeline_spark.operators.dedup_corpus import (
        remove_duplicate_spans,
    )

    clean = remove_duplicate_spans(docs, k=SPAN_K, hash_spans=True).select(
        "doc_id", "text", "source"
    )
    clean.cache()
    n_clean = clean.count()
    is_plant = (F.col("doc_id") % 100 >= 8) & (F.col("doc_id") % 100 < 10)
    planted = clean.withColumn(
        "text",
        F.when(is_plant, F.concat(F.col("text"), F.lit(" " + BP_TOKENS))).otherwise(
            F.col("text")
        ),
    )
    ref = remove_duplicate_spans(clean, k=SPAN_K, hash_spans=True).select(
        "doc_id", F.col("text").alias("ref_text")
    )
    out = remove_duplicate_spans(planted, k=SPAN_K, hash_spans=True).select(
        "doc_id", "text", is_plant.alias("is_plant")
    )
    joined = out.join(ref, "doc_id")
    agg = joined.agg(
        F.sum(F.when(F.col("is_plant"), 1).otherwise(0)).alias("planted"),
        F.sum(
            F.when(F.col("is_plant") & ~F.col("text").contains("zbp"), 1).otherwise(0)
        ).alias("caught"),
        F.sum(
            F.when(F.col("is_plant") & (F.col("text") == F.col("ref_text")), 1).otherwise(0)
        ).alias("exact_repair"),
        F.sum(
            F.when(~F.col("is_plant") & (F.col("text") != F.col("ref_text")), 1).otherwise(0)
        ).alias("fp"),
    ).collect()[0]
    clean.unpersist()
    tp, fp = int(agg.caught), int(agg.fp)
    return [
        {
            "operator": "span_dedup",
            "family": "boilerplate_12tok",
            "planted": int(agg.planted),
            "caught": tp,
            "recall": round(tp / agg.planted, 3) if agg.planted else None,
            "similarity": round(int(agg.exact_repair) / agg.planted, 3)
            if agg.planted
            else None,  # exact-repair rate: span excised, nothing else touched
        },
        {
            "operator": "span_dedup",
            "family": "(precision)",
            "planted": n_clean,
            "caught": tp,
            "fp": fp,
            "precision": round(tp / (tp + fp), 4) if tp + fp else None,
        },
    ]


# ------------------------------------------------------ exact substring
# Planted EXACT SUBSTRINGS at varying lengths around the dd24 threshold
# (Lee et al. ExactSubstr semantics: occurrence-counted, >= min_len).
ES_LEN = 12
ES_SUB = " ".join(f"zesu{i}" for i in range(6))        # below threshold
ES_EXACT = " ".join(f"zese{i}" for i in range(ES_LEN))  # exactly at it
ES_LONG = " ".join(f"zesl{i}" for i in range(2 * ES_LEN))  # well past it
# within-doc family: per-doc-unique tokens (suffix = doc_id), repeated TWICE
# inside the one document — only occurrence counting can see it
ES_WITHIN_SQL = (
    f"array_join(transform(sequence(0, {ES_LEN - 1}), "
    "i -> concat('zesw', i, '_', doc_id)), ' ')"
)


def measure_exact_substring(spark, docs: DataFrame) -> list[dict]:
    """exact_substring_dedup (dd24) vs planted substrings at lengths below /
    at / past the threshold plus a within-doc repeat.  Reports recall per
    length, the EXACT-repair rate (plant excised, nothing else touched) and
    its complement the SEAM-ARTIFACT rate — the adjacent-natural-token
    excision the dd19 SCALE note concedes on corpora with shared trailing
    runs: a window straddling the plant boundary that recurs verbatim IS a
    duplicated >= min_len substring, so the published method removes it too;
    this measures how often instead of pretending it away.  The
    sub-threshold family's recall MUST be 0.000 by design (6 < min_len is
    not duplication), and the within-doc family separates dd24's occurrence
    semantics from dd19's distinct-docs curation default (measured side by
    side)."""
    from healthcare_data_pipeline_spark.operators.dedup_corpus import (
        exact_substring_dedup,
        remove_duplicate_spans,
    )

    def op(d: DataFrame) -> DataFrame:
        return exact_substring_dedup(d, min_len=ES_LEN, hash_spans=True)

    clean = op(docs).select("doc_id", "text", "source")
    clean.cache()
    n_clean = clean.count()
    m = F.col("doc_id") % 100
    fams = {
        "es_sub_6tok": ((m >= 10) & (m < 12), F.lit(" " + ES_SUB)),
        "es_exact_12tok": ((m >= 12) & (m < 14), F.lit(" " + ES_EXACT)),
        "es_long_24tok": ((m >= 14) & (m < 16), F.lit(" " + ES_LONG)),
        "es_within_doc": (
            (m >= 16) & (m < 18),
            F.concat(
                F.lit(" "), F.expr(ES_WITHIN_SQL), F.lit(" zfil "), F.expr(ES_WITHIN_SQL)
            ),
        ),
    }
    planted = clean
    for fam, (pred, suffix) in fams.items():
        planted = planted.withColumn(
            "text",
            F.when(pred, F.concat(F.col("text"), suffix)).otherwise(F.col("text")),
        )
    ref = op(clean).select("doc_id", F.col("text").alias("ref_text"))
    out = op(planted).select("doc_id", "text")
    # dd19's curation default on the same plants: the within-doc row must
    # show the semantic gap (distinct-docs counting keeps the repeat)
    out19 = remove_duplicate_spans(
        planted, k=ES_LEN, hash_spans=True, count_mode="docs"
    ).select("doc_id", F.col("text").alias("text19"))
    joined = out.join(ref, "doc_id").join(out19, "doc_id")
    marker = {
        "es_sub_6tok": "zesu",
        "es_exact_12tok": "zese",
        "es_long_24tok": "zesl",
        "es_within_doc": "zesw",
    }
    rows: list[dict] = []
    any_plant = None
    for fam, (pred, _) in fams.items():
        any_plant = pred if any_plant is None else (any_plant | pred)
        # exact repair = the plant (and only the plant) excised; for the
        # within-doc family the ' zfil' spacer between the two copies is NOT
        # duplicated and legitimately survives, so it belongs in the
        # expected repaired text
        expected = (
            F.concat(F.col("ref_text"), F.lit(" zfil"))
            if fam == "es_within_doc"
            else F.col("ref_text")
        )
        agg = joined.filter(pred).agg(
            F.count("*").alias("planted"),
            F.sum((~F.col("text").contains(marker[fam])).cast("int")).alias("caught"),
            F.sum((F.col("text") == expected).cast("int")).alias("exact"),
            F.sum((~F.col("text19").contains(marker[fam])).cast("int")).alias(
                "caught19"
            ),
        ).collect()[0]
        n, tp = int(agg.planted), int(agg.caught)
        rows.append(
            {
                "operator": "exact_substring",
                "family": fam,
                "planted": n,
                "caught": tp,
                "recall": round(tp / n, 3) if n else None,
                # exact-repair rate; its complement among caught docs is the
                # measured seam-artifact rate
                "similarity": round(int(agg.exact) / n, 3) if n else None,
                "seam_rate": round((tp - int(agg.exact)) / n, 3) if n else None,
                "dd19_recall": round(int(agg.caught19) / n, 3) if n else None,
            }
        )
    fp = joined.filter(~any_plant).filter(F.col("text") != F.col("ref_text")).count()
    tp_all = sum(r["caught"] for r in rows if r["family"] != "es_sub_6tok")
    rows.append(
        {
            "operator": "exact_substring",
            "family": "(precision)",
            "planted": n_clean,
            "caught": tp_all,
            "fp": int(fp),
            "precision": round(tp_all / (tp_all + fp), 4) if tp_all + fp else None,
        }
    )
    clean.unpersist()
    return rows


# ------------------------------------------------------------- line dedup
# Planted boilerplate LINES (family marker tokens are globally unique, so a
# per-doc "caught" test is a marker-containment check, never a position diff).
LINE_BANNER = "zlna cookie consent accept all cookies to continue zlna"
LINE_PAIR = "zlnb shared footer navigation links block"
LINE_FUZZ = "zlnc subscribe newsletter banner item {tok} unsubscribe anytime zlnc"
LINE_INDENT = "zlnd copyright footer all rights reserved zlnd"

RELINE_SQL = (
    "array_join(transform(sequence(1, CAST(ceil(size(split(text, ' ')) / 8.0) AS INT)), "
    "i -> array_join(slice(split(text, ' '), (i - 1) * 8 + 1, 8), ' ')), '\\n')"
)


def _line_jaccard(a: str, b: str) -> float:
    """Token Jaccard between two planted lines — the family's TRUE hardness
    (computed from the actual constructed strings, not asserted)."""
    sa, sb = set(a.split()), set(b.split())
    return len(sa & sb) / len(sa | sb)


def measure_line_dedup(spark, docs: DataFrame) -> list[dict]:
    """remove_boilerplate_lines vs planted cross-document boilerplate lines.

    The corpus has no newlines, so docs are re-lined first (a break every 8
    tokens — the dd22 catalog transform), then cleaned once.  The clean set
    is a FIXPOINT (every surviving trimmed line lives in <min_docs distinct
    docs; planted lines all carry zln* markers so they never collide with a
    natural line), so any natural-line removal in the planted run is a false
    positive.  Families probe the operator's exact-match contract from both
    sides: high-df banner and threshold-exact df=2 pair (must catch),
    indentation-only variants (trim matching must catch), and a line with
    ONE doc-specific token (df=1 each — exact line matching CANNOT catch it
    by design; the documented miss that marks where the span stage takes
    over)."""
    from healthcare_data_pipeline_spark.operators.dedup_corpus import (
        remove_boilerplate_lines,
    )

    relined = docs.withColumn("text", F.expr(RELINE_SQL))
    clean = remove_boilerplate_lines(relined).select("doc_id", "text", "source")
    clean.cache()
    n_clean = clean.count()

    m = F.col("doc_id") % 100
    fuzz_line = F.concat_ws(
        "",
        F.lit(LINE_FUZZ.split("{tok}")[0]),
        F.expr("substring(md5(CAST(doc_id AS STRING)), 1, 6)"),
        F.lit(LINE_FUZZ.split("{tok}")[1]),
    )
    pair_line = F.concat_ws(
        " ", F.lit(LINE_PAIR), F.expr("CAST(doc_id DIV 100 AS STRING)"), F.lit("zlnb")
    )
    indent_line = F.when(F.col("doc_id") % 2 == 0, F.lit("  " + LINE_INDENT)).otherwise(
        F.lit("\t" + LINE_INDENT)
    )
    # df=2 pairs: %100 == 6 paired with %100 == 7 of the same hundred — plant
    # only COMPLETE pairs, so every planted pair-line has distinct-doc count
    # exactly min_docs (the threshold boundary).
    hundred = (F.col("doc_id") - m).alias("h")
    h6 = clean.filter(m == 6).select(hundred)
    h7 = clean.filter(m == 7).select(hundred)
    full_pairs = h6.join(h7, "h")
    planted_line = (
        F.when(m < 5, F.lit(LINE_BANNER))
        .when((m == 6) | (m == 7), pair_line)
        .when((m >= 8) & (m < 10), fuzz_line)
        .when((m >= 10) & (m < 12), indent_line)
    )
    fam = (
        F.when(m < 5, F.lit("banner_5pct"))
        .when((m == 6) | (m == 7), F.lit("banner_df2"))
        .when((m >= 8) & (m < 10), F.lit("banner_fuzz"))
        .when((m >= 10) & (m < 12), F.lit("banner_indent"))
    )
    base = clean.join(F.broadcast(full_pairs), (F.col("doc_id") - m) == F.col("h"), "left")
    planted = base.select(
        "doc_id",
        F.when(
            planted_line.isNotNull() & (((m != 6) & (m != 7)) | F.col("h").isNotNull()),
            F.concat(F.col("text"), F.lit("\n"), planted_line),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "source",
        F.when(((m != 6) & (m != 7)) | F.col("h").isNotNull(), fam).alias("family"),
    )
    out = remove_boilerplate_lines(planted).select("doc_id", "text", "family")
    marker = (
        F.when(F.col("family") == "banner_5pct", F.lit("zlna"))
        .when(F.col("family") == "banner_df2", F.lit("zlnb"))
        .when(F.col("family") == "banner_fuzz", F.lit("zlnc"))
        .when(F.col("family") == "banner_indent", F.lit("zlnd"))
    )
    nat_cnt = "size(filter(split(text, '\\n'), l -> NOT l LIKE '%zln%'))"
    verdicts = (
        out.filter(F.col("family").isNotNull())
        .groupBy("family")
        .agg(
            F.count("*").alias("planted"),
            F.sum(F.when(~F.col("text").contains(marker), 1).otherwise(0)).alias("caught"),
        )
        .collect()
    )
    # FP: natural-line deficit vs the fixpoint clean set (the operator never
    # adds lines, so a per-doc count drop == a removed natural line)
    fp = (
        out.selectExpr("doc_id", f"{nat_cnt} AS nc")
        .join(clean.selectExpr("doc_id", f"{nat_cnt} AS cc"), "doc_id")
        .agg(F.sum(F.expr("greatest(cc - nc, 0)")).alias("fp"))
        .collect()[0][0]
    )
    clean.unpersist()
    sims = {
        "banner_5pct": 1.0,
        "banner_df2": 1.0,
        "banner_indent": 1.0,
        "banner_fuzz": _line_jaccard(
            LINE_FUZZ.replace("{tok}", "aaaaaa"), LINE_FUZZ.replace("{tok}", "bbbbbb")
        ),
    }
    rows = [
        {
            "operator": "line_dedup",
            "family": r.family,
            "planted": r.planted,
            "caught": int(r.caught),
            "recall": round(r.caught / r.planted, 3) if r.planted else None,
            "similarity": round(sims[r.family], 3),
        }
        for r in verdicts
    ]
    tp = sum(r["caught"] for r in rows)
    rows.append(
        {
            "operator": "line_dedup",
            "family": "(precision)",
            "planted": n_clean,
            "caught": tp,
            "fp": int(fp or 0),
            "precision": round(tp / (tp + fp), 4) if tp + fp else None,
        }
    )
    return rows


# -------------------------------------------------------- decontamination
def measure_decontamination(spark, docs: DataFrame) -> list[dict]:
    """decontaminate (ngram + bloom) vs planted eval-set leaks.

    Split: eval = doc_id%100 < 5, train = rest; clean = ngram-decontaminated
    train (a FIXPOINT — no surviving train doc shares a 13-gram with eval,
    so ngram-mode FPs on the planted run must be zero, and every bloom-mode
    removal of a clean doc is a measured Bloom hash collision).  Families:

    - ``verbatim_leak``  eval docs copied into train verbatim (restricted to
      eval docs with >= n tokens — shorter docs have ZERO n-grams and are
      contract-negative for any n-gram rule).  Must be 1.0 in both modes.
    - ``quote_13tok``    a clean train doc + the first 13 tokens of its
      paired eval doc appended — exactly one shared gram.  Must be 1.0:
      the any-shared-gram contract at its minimum.
    - ``paraphrase``     eval text with every 8th token rewritten: the
      longest clean run is 7 < n=13, so ZERO shared grams survive — the
      documented n-gram-decontamination miss (catching it needs fuzzy /
      embedding machinery, not a bigger bitmap).
    - ``edited_leak``    eval text with every 12th token rewritten: still
      ZERO shared 13-grams (run length 11 < 13 — ngram/bloom recall is a
      0.000 contract), but 3-gram shingle Jaccard ~0.6 — the class
      ``decon_fuzzy`` (dd25, MinHash train x eval) exists for; its measured
      recall sits on the published 1-(1-J^4)^4 band curve, NOT at 1.0.

    The ``decon_fuzzy`` rows run against a fuzzy-decontaminated baseline
    (clean_f — the fixpoint for ITS collision definition, so its FP count
    is a hard zero contract like the others) and measure the
    complementarity claim from both sides: ``verbatim_leak`` 1.0 (identical
    docs share all bands), ``quote_13tok`` ~0.0 BY DESIGN (a 13-token quote
    inside a long doc leaves doc-level Jaccard near zero — the quote class
    belongs to the n-gram rule), ``edited_leak``/``paraphrase`` partial at
    the banding curve (the classes the n-gram rule cannot see at all).

    The bloom bitmap is sized by the module's own ``bloom_m_bits`` helper at
    target_fpp=1e-4 from the measured eval gram count (the fixed 2^20
    default SATURATES at 64x — ~2M set-bit demands on 1M bits would flag
    nearly everything; sizing-by-count is the documented practice this
    harness exercises).  ``similarity`` is the measured fraction of the
    planted doc's grams present in the eval gram set (hardness: ~1.0
    verbatim, ~1/doc_grams quote, 0.0 paraphrase)."""
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        DEFAULT_NGRAM,
        _exploded_ngrams,
        bloom_m_bits,
        decontaminate,
    )

    m = F.col("doc_id") % 100
    eval_df = docs.filter(m < 5).select("doc_id", "text", "source")
    train0 = docs.filter(m >= 5).select("doc_id", "text", "source")
    clean = decontaminate(train0, eval_df, mode="ngram")
    clean.cache()
    n_clean = clean.count()
    eval_grams = _exploded_ngrams(eval_df, DEFAULT_NGRAM, "doc_id", "text").select("g").distinct()
    eval_grams.cache()
    n_eval_grams = eval_grams.count()
    m_bits = bloom_m_bits(n_eval_grams, target_fpp=1e-4)

    n_toks = F.size(F.split(F.col("text"), " "))
    verbatim = eval_df.filter(n_toks >= DEFAULT_NGRAM).select(
        (F.col("doc_id") + 5 * FAM_OFFSET).alias("doc_id"),
        "text",
        "source",
        F.lit("verbatim_leak").alias("family"),
    )
    quote_src = eval_df.filter((F.col("doc_id") % 100 == 0) & (n_toks >= DEFAULT_NGRAM)).select(
        F.col("doc_id").alias("__h"),
        F.expr(f"array_join(slice(split(text, ' '), 1, {DEFAULT_NGRAM}), ' ')").alias("__q"),
    )
    quote = (
        clean.filter((m >= 5) & (m < 7))
        .join(F.broadcast(quote_src), (F.col("doc_id") - m) == F.col("__h"))
        .select(
            (F.col("doc_id") + 6 * FAM_OFFSET).alias("doc_id"),
            F.concat_ws(" ", "text", "__q").alias("text"),
            "source",
            F.lit("quote_13tok").alias("family"),
        )
    )
    paraphrase = eval_df.select(
        (F.col("doc_id") + 7 * FAM_OFFSET).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, ' '), (t, i) -> CASE WHEN i % 8 = 3 "
            "THEN substring(md5(concat(t, '_pp')), 1, 8) ELSE t END), ' ')"
        ).alias("text"),
        "source",
        F.lit("paraphrase").alias("family"),
    )
    edited = eval_df.filter(n_toks >= 24).select(
        (F.col("doc_id") + 8 * FAM_OFFSET).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, ' '), (t, i) -> CASE WHEN i % 12 = 5 "
            "THEN substring(md5(concat(t, '_el')), 1, 8) ELSE t END), ' ')"
        ).alias("text"),
        "source",
        F.lit("edited_leak").alias("family"),
    )
    plants = verbatim.unionByName(quote).unionByName(paraphrase).unionByName(edited)
    plants.cache()
    planted = clean.unionByName(plants.drop("family"))

    # measured hardness: fraction of each planted doc's grams in the eval set
    pg = _exploded_ngrams(plants, DEFAULT_NGRAM, "doc_id", "text")
    hit = pg.join(eval_grams.withColumn("__in", F.lit(1)), "g", "left")
    frac = (
        hit.groupBy("doc_id")
        .agg((F.sum(F.coalesce("__in", F.lit(0))) / F.count("*")).alias("frac"))
        .join(plants.select("doc_id", "family"), "doc_id", "right")
        .groupBy("family")
        .agg(F.avg(F.coalesce("frac", F.lit(0.0))).alias("similarity"))
    )
    sims = {r.family: r.similarity for r in frac.collect()}

    rows: list[dict] = []
    for mode, op in (("ngram", "decon_ngram"), ("bloom", "decon_bloom")):
        out = decontaminate(planted, eval_df, mode=mode, m_bits=m_bits).select("doc_id")
        verdicts = (
            plants.join(out.withColumn("__alive", F.lit(1)), "doc_id", "left")
            .groupBy("family")
            .agg(
                F.count("*").alias("planted"),
                F.sum(F.when(F.col("__alive").isNull(), 1).otherwise(0)).alias("caught"),
            )
            .collect()
        )
        fp = clean.select("doc_id").join(out, "doc_id", "left_anti").count()
        part = [
            {
                "operator": op,
                "family": r.family,
                "planted": r.planted,
                "caught": int(r.caught),
                "recall": round(r.caught / r.planted, 3) if r.planted else None,
                "similarity": round(sims.get(r.family, 0.0), 4),
            }
            for r in verdicts
        ]
        tp = sum(r["caught"] for r in part)
        part.append(
            {
                "operator": op,
                "family": "(precision)",
                "planted": n_clean,
                "caught": tp,
                "fp": fp,
                "precision": round(tp / (tp + fp), 4) if tp + fp else None,
                "m_bits": m_bits if mode == "bloom" else None,
                "eval_grams": n_eval_grams if mode == "bloom" else None,
            }
        )
        rows.extend(part)

    # --- decon_fuzzy (dd25): doc-level MinHash near-dup against eval ------
    # Its own fixpoint baseline, so FP on clean_f is a zero contract for
    # THIS collision definition too.
    clean_f = decontaminate(clean, eval_df, mode="fuzzy").select(
        "doc_id", "text", "source"
    )
    clean_f.cache()
    n_clean_f = clean_f.count()
    planted_f = clean_f.unionByName(plants.drop("family"))
    out_f = decontaminate(planted_f, eval_df, mode="fuzzy").select("doc_id")
    verdicts_f = (
        plants.join(out_f.withColumn("__alive", F.lit(1)), "doc_id", "left")
        .groupBy("family")
        .agg(
            F.count("*").alias("planted"),
            F.sum(F.when(F.col("__alive").isNull(), 1).otherwise(0)).alias("caught"),
        )
        .collect()
    )
    fp_f = clean_f.select("doc_id").join(out_f, "doc_id", "left_anti").count()
    part_f = [
        {
            "operator": "decon_fuzzy",
            "family": r.family,
            "planted": r.planted,
            "caught": int(r.caught),
            "recall": round(r.caught / r.planted, 3) if r.planted else None,
            "similarity": round(sims.get(r.family, 0.0), 4),
        }
        for r in verdicts_f
    ]
    tp_f = sum(r["caught"] for r in part_f)
    part_f.append(
        {
            "operator": "decon_fuzzy",
            "family": "(precision)",
            "planted": n_clean_f,
            "caught": tp_f,
            "fp": fp_f,
            "precision": round(tp_f / (tp_f + fp_f), 4) if tp_f + fp_f else None,
        }
    )
    rows.extend(part_f)
    clean_f.unpersist()
    plants.unpersist()
    eval_grams.unpersist()
    clean.unpersist()
    return rows


# ----------------------------------------------------------- quality gates
LOOP_PHRASE = "the data and the pipeline runs"  # >=2 distinct Gopher stopwords
FRAG_TEXT = "data point seven"
RARE_GATE_RATIO = 0.5


def measure_quality_gates(spark, docs: DataFrame) -> list[dict]:
    """The quality-gate family vs planted junk — which GATE catches which
    failure mode.  Clean = docs passing ALL four gates (basic C4-style
    filter, Gopher A1.1, Gopher A1.2 repetition, corpus-adaptive
    rare-bigram at ratio > 0.5; the basic gate runs WITHOUT its stopword
    floor and the Gopher gate without its required-stopword rule — the
    scale corpora's per-replica token rewrite appends the replica id to
    every token, destroying natural stopwords: a corpus artifact, not an
    operator deviation); each planted family is crafted to slip
    every gate except its intended catcher, so the table reads as a
    coverage MATRIX and a family caught by nothing is a measured gap (that
    is how the ``token_loop`` gap that motivated ``repetition_flags`` was
    found: same words pass A1.1, within-doc loops pass the corpus-adaptive
    gate because their transitions recur corpus-wide).

    - ``word_salad``   tokens truly permuted (position-salted hash sort)
      with every 2nd non-stopword replaced by a hash token — distributional
      junk drawing its transitions from the long tail (t23's design case);
      only the rare-bigram gate can see it.  (A pure permutation of THIS
      corpus is invisible to every gate: the synthetic vocab is ~31
      template words, so every possible bigram is corpus-common — the
      injected hash tokens supply the long tail a real crawl has.);
    - ``token_loop``   a 6-token stopword-bearing phrase repeated — only
      the repetition battery can see it;
    - ``short_frag``   a 3-token fragment — word-count bands (basic +
      Gopher) catch it;
    - ``symbol_spam``  every 6th token replaced by '#####' — Gopher's
      hash-ratio rule catches it (lengths/stopwords otherwise sane).

    Precision counts clean docs a gate drops AFTER planting: per-doc gates
    can't flip (stateless), and the rare-bigram gate can only get SAFER
    (plants add occurrences, so natural bigram frequencies only rise) —
    zero is a hard contract for all four."""
    from healthcare_data_pipeline_spark.operators.quality import (
        filter_corpus,
        gopher_quality_flags,
        rare_bigram_scores,
        repetition_filter,
    )

    def gopher_nostop(df: DataFrame) -> DataFrame:
        # The synthetic corpus contains NO Gopher stopwords (template tokens),
        # so A1.1's required-stopword rule is vacuously false on every
        # natural doc and the full AND-gate would empty the baseline; the
        # harness gates on the other seven rules (production keeps all
        # eight — this is a corpus artifact, stated in the narrative).
        fl = gopher_quality_flags(df)
        keep = fl.filter(
            " AND ".join(
                c for c in fl.columns if c.startswith("flag_") and c != "flag_stopwords"
            )
        ).select("doc_id")
        return df.join(keep, "doc_id", "left_semi")

    def rare_gate(df: DataFrame) -> DataFrame:
        bad = (
            rare_bigram_scores(df)
            .filter(F.col("rare_ratio") > RARE_GATE_RATIO)
            .select("doc_id")
        )
        return df.join(bad, "doc_id", "left_anti")

    gates = {
        # no stopword floor: the scale corpora's per-replica token rewrite
        # appends the replica id to EVERY token (the dedup-honesty
        # construction), which destroys natural stopwords at every scale —
        # the word-count band and word-length cap remain (same adaptation
        # class as gopher_nostop below; production keeps the floor)
        "gate_basic": lambda df: filter_corpus(df, min_stopword_ratio=None),
        "gate_gopher": gopher_nostop,
        "gate_repetition": repetition_filter,
        "gate_rare_bigram": rare_gate,
    }
    clean = docs.select("doc_id", "text", "source")
    for g in gates.values():
        clean = g(clean)
    clean = clean.select("doc_id", "text", "source")
    clean.cache()
    n_clean = clean.count()

    m = F.col("doc_id") % 100
    salad = clean.filter(m < 2).select(
        (F.col("doc_id") + FAM_OFFSET).alias("doc_id"),
        F.expr(
            "array_join(transform(array_sort(transform(split(text, ' '), (t, i) -> "
            "struct(xxhash64(concat(t, '_', CAST(i AS STRING), '_', CAST(doc_id AS STRING))) AS h, "
            "CASE WHEN i % 2 = 1 AND NOT t IN ('the', 'a', 'of', 'and', 'in', 'to') "
            "THEN substring(md5(concat(t, CAST(i AS STRING), CAST(doc_id AS STRING))), 1, 7) "
            "ELSE t END AS t))), s -> s.t), ' ')"
        ).alias("text"),
        "source",
        F.lit("word_salad").alias("family"),
    )
    loop = clean.filter((m >= 2) & (m < 4)).select(
        (F.col("doc_id") + 2 * FAM_OFFSET).alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, 35), i -> '"
            + LOOP_PHRASE
            + "'), ' ')"
        ).alias("text"),
        "source",
        F.lit("token_loop").alias("family"),
    )
    frag = clean.filter((m >= 4) & (m < 6)).select(
        (F.col("doc_id") + 3 * FAM_OFFSET).alias("doc_id"),
        F.lit(FRAG_TEXT).alias("text"),
        "source",
        F.lit("short_frag").alias("family"),
    )
    spam = clean.filter((m >= 6) & (m < 8)).select(
        (F.col("doc_id") + 4 * FAM_OFFSET).alias("doc_id"),
        F.expr(
            # stopwords are protected so the basic gate's stopword floor
            # stays satisfied — the family must isolate the hash-ratio rule
            "array_join(transform(split(text, ' '), (t, i) -> "
            "CASE WHEN i % 6 = 2 AND NOT t IN ('the', 'a', 'of', 'and', 'in', 'to') "
            "THEN '#####' ELSE t END), ' ')"
        ).alias("text"),
        "source",
        F.lit("symbol_spam").alias("family"),
    )
    plants = salad.unionByName(loop).unionByName(frag).unionByName(spam)
    plants.cache()
    planted = clean.unionByName(plants.drop("family"))
    # token-multiset overlap with the source doc, by construction
    sims = {"word_salad": 0.5, "token_loop": 0.0, "short_frag": 0.0, "symbol_spam": 0.833}

    rows: list[dict] = []
    for gname, g in gates.items():
        out = g(planted).select("doc_id")
        verdicts = (
            plants.join(out.withColumn("__alive", F.lit(1)), "doc_id", "left")
            .groupBy("family")
            .agg(
                F.count("*").alias("planted"),
                F.sum(F.when(F.col("__alive").isNull(), 1).otherwise(0)).alias("caught"),
            )
            .collect()
        )
        fp = clean.select("doc_id").join(out, "doc_id", "left_anti").count()
        part = [
            {
                "operator": gname,
                "family": r.family,
                "planted": r.planted,
                "caught": int(r.caught),
                "recall": round(r.caught / r.planted, 3) if r.planted else None,
                "similarity": sims[r.family],
            }
            for r in verdicts
        ]
        tp = sum(r["caught"] for r in part)
        part.append(
            {
                "operator": gname,
                "family": "(precision)",
                "planted": n_clean,
                "caught": tp,
                "fp": fp,
                "precision": round(tp / (tp + fp), 4) if tp + fp else None,
            }
        )
        rows.extend(part)
    plants.unpersist()
    clean.unpersist()
    return rows


# Weave two distinct Gopher stopwords into every 11-token stride so the
# FULL A1.1 AND-gate (stopword rule live) has a non-empty baseline on the
# synthetic corpus — the corpus artifact the 7-rule harness variant
# documents, repaired by construction instead of worked around.
GOPHER_WEAVE_SQL = (
    "array_join(transform(split(text, ' '), (t, i) -> "
    "CASE WHEN i % 11 = 5 THEN concat('the ', t) "
    "WHEN i % 11 = 9 THEN concat('and ', t) ELSE t END), ' ')"
)


def measure_gopher_full_gate(spark, docs: DataFrame) -> list[dict]:
    """The COMPLETE eight-rule Gopher A1.1 gate — required-stopword rule
    live — measured on a stopword-woven corpus (the synthetic vocabulary
    contains no natural stopwords, so the seven-rule variant below is what
    runs against the raw corpus; this family closes that measurement gap).

    Families: ``stopword_free`` strips every stopword token from an
    otherwise-healthy doc — ONLY the required-stopword rule can see it
    (lengths, ratios, line shapes all stay sane), and the seven-rule gate's
    recall on it is measured side by side as the gap the full gate closes;
    ``symbol_spam``/``short_frag`` re-run under the full gate to pin that
    weaving stopwords in does not perturb their catchers.  Precision stays
    a hard 0-FP contract: the gate is per-doc stateless."""
    from healthcare_data_pipeline_spark.operators.quality import (
        gopher_filter,
        gopher_quality_flags,
    )
    from healthcare_data_pipeline_spark.operators.quality import GOPHER_STOPWORDS

    woven = docs.select(
        "doc_id", F.expr(GOPHER_WEAVE_SQL).alias("text"), "source"
    )
    clean = gopher_filter(woven).select("doc_id", "text", "source")
    clean.cache()
    n_clean = clean.count()
    m = F.col("doc_id") % 100
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    stopfree = clean.filter(m < 2).select(
        (F.col("doc_id") + 11 * FAM_OFFSET).alias("doc_id"),
        F.expr(
            f"array_join(filter(split(text, ' '), t -> NOT t IN ({stop_list})), ' ')"
        ).alias("text"),
        "source",
        F.lit("stopword_free").alias("family"),
    )
    spam = clean.filter((m >= 2) & (m < 4)).select(
        (F.col("doc_id") + 12 * FAM_OFFSET).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, ' '), (t, i) -> "
            f"CASE WHEN i % 6 = 2 AND NOT t IN ({stop_list}) "
            "THEN '#####' ELSE t END), ' ')"
        ).alias("text"),
        "source",
        F.lit("symbol_spam").alias("family"),
    )
    frag = clean.filter((m >= 4) & (m < 6)).select(
        (F.col("doc_id") + 13 * FAM_OFFSET).alias("doc_id"),
        F.lit(FRAG_TEXT).alias("text"),
        "source",
        F.lit("short_frag").alias("family"),
    )
    plants = stopfree.unionByName(spam).unionByName(frag)
    plants.cache()
    planted = clean.unionByName(plants.drop("family"))

    out_full = gopher_filter(planted).select("doc_id")
    # the seven-rule variant (stopword rule off) on the same plants: the
    # stopword_free row must expose the gap the full gate closes
    fl = gopher_quality_flags(planted)
    out7 = (
        fl.filter(
            " AND ".join(
                c for c in fl.columns if c.startswith("flag_") and c != "flag_stopwords"
            )
        ).select("doc_id")
    )
    sims = {"stopword_free": 0.82, "symbol_spam": 0.833, "short_frag": 0.0}
    rows: list[dict] = []
    verdicts = (
        plants.join(out_full.withColumn("__a", F.lit(1)), "doc_id", "left")
        .join(out7.withColumn("__a7", F.lit(1)), "doc_id", "left")
        .groupBy("family")
        .agg(
            F.count("*").alias("planted"),
            F.sum(F.when(F.col("__a").isNull(), 1).otherwise(0)).alias("caught"),
            F.sum(F.when(F.col("__a7").isNull(), 1).otherwise(0)).alias("caught7"),
        )
        .collect()
    )
    for r in verdicts:
        rows.append(
            {
                "operator": "gate_gopher_full",
                "family": r.family,
                "planted": r.planted,
                "caught": int(r.caught),
                "recall": round(r.caught / r.planted, 3) if r.planted else None,
                "similarity": sims[r.family],
                "nostop_recall": round(int(r.caught7) / r.planted, 3)
                if r.planted
                else None,
            }
        )
    fp = clean.select("doc_id").join(out_full, "doc_id", "left_anti").count()
    tp = sum(r["caught"] for r in rows)
    rows.append(
        {
            "operator": "gate_gopher_full",
            "family": "(precision)",
            "planted": n_clean,
            "caught": tp,
            "fp": int(fp),
            "precision": round(tp / (tp + fp), 4) if tp + fp else None,
        }
    )
    plants.unpersist()
    clean.unpersist()
    return rows


# Re-line the synthetic single-line corpus into C4-shaped sentences (8
# words + a terminal period per line) so the C4 battery has a live,
# passing baseline — the same corpus-artifact repair class as
# GOPHER_WEAVE_SQL (real crawls have line structure; the scale corpus
# does not).
C4_LINE_WEAVE_SQL = (
    "array_join(transform(split(text, ' '), (t, i) -> "
    "CASE WHEN i % 8 = 7 THEN concat(t, ' .\\n') ELSE t END), ' ')"
)


def measure_c4_gate(spark, docs: DataFrame) -> list[dict]:
    """The C4 battery (t34, Raffel 2020 §2.2) as a gate-matrix operator —
    the LINE-GRAIN junk families the shape batteries cannot see.  The
    corpus is re-lined (C4_LINE_WEAVE_SQL) so the baseline passes, then:

    - ``no_terminal``: every terminal period token stripped — no line
      survives the terminal-punctuation rule, the page dies on the
      kept-line count.  Word counts, lengths, stopwords all unchanged, so
      the basic gate's recall (measured side by side) is 0.0 by design.
    - ``curly_code``: one ``{`` injected — the page-level code rule.
    - ``lorem_banner``: a "lorem ipsum" template line appended — the
      page-level placeholder rule.
    - ``nav_boilerplate``: short terminal-free nav lines appended — the
      page must SURVIVE (recall 0.0 is the contract: this is the CLEANING
      side, not the drop side)…
    - ``nav_lines_removed``: …and the companion row measures that the
      surviving pages' junk lines were actually removed (recall 1.0).

    Precision is the per-doc-stateless 0-FP hard contract."""
    from healthcare_data_pipeline_spark.operators.quality import (
        c4_clean,
        c4_filter,
        filter_corpus,
    )

    woven = docs.select("doc_id", F.expr(C4_LINE_WEAVE_SQL).alias("text"), "source")
    clean = c4_filter(woven).select("doc_id", "text", "source")
    clean.cache()
    n_clean = clean.count()
    m = F.col("doc_id") % 100
    NAV_LINE = "home | about | contact"
    noterm = clean.filter(m < 2).select(
        (F.col("doc_id") + 21 * FAM_OFFSET).alias("doc_id"),
        F.expr(
            "array_join(filter(split(text, ' '), t -> t != '.' AND t != '.\\n'), ' ')"
        ).alias("text"),
        "source",
        F.lit("no_terminal").alias("family"),
    )
    curly = clean.filter((m >= 2) & (m < 4)).select(
        (F.col("doc_id") + 22 * FAM_OFFSET).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, ' '), (t, i) -> "
            "CASE WHEN i = 3 THEN concat(t, '{') ELSE t END), ' ')"
        ).alias("text"),
        "source",
        F.lit("curly_code").alias("family"),
    )
    lorem = clean.filter((m >= 4) & (m < 6)).select(
        (F.col("doc_id") + 23 * FAM_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit("\nlorem ipsum dolor sit amet consectetur .")).alias(
            "text"
        ),
        "source",
        F.lit("lorem_banner").alias("family"),
    )
    nav = clean.filter((m >= 6) & (m < 8)).select(
        (F.col("doc_id") + 24 * FAM_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(f"\n{NAV_LINE}\n{NAV_LINE}")).alias("text"),
        "source",
        F.lit("nav_boilerplate").alias("family"),
    )
    plants = noterm.unionByName(curly).unionByName(lorem).unionByName(nav)
    plants.cache()
    planted = clean.unionByName(plants.drop("family"))
    out_c4 = c4_filter(planted).select("doc_id")
    out_basic = filter_corpus(planted, min_stopword_ratio=None).select("doc_id")
    sims = {
        "no_terminal": 0.89,
        "curly_code": 1.0,
        "lorem_banner": 1.0,
        "nav_boilerplate": 1.0,
    }
    rows: list[dict] = []
    verdicts = (
        plants.join(out_c4.withColumn("__a", F.lit(1)), "doc_id", "left")
        .join(out_basic.withColumn("__ab", F.lit(1)), "doc_id", "left")
        .groupBy("family")
        .agg(
            F.count("*").alias("planted"),
            F.sum(F.when(F.col("__a").isNull(), 1).otherwise(0)).alias("caught"),
            F.sum(F.when(F.col("__ab").isNull(), 1).otherwise(0)).alias("caught_b"),
        )
        .collect()
    )
    for r in verdicts:
        rows.append(
            {
                "operator": "gate_c4",
                "family": r.family,
                "planted": r.planted,
                "caught": int(r.caught),
                "recall": round(r.caught / r.planted, 3) if r.planted else None,
                "similarity": sims[r.family],
                "basic_recall": round(int(r.caught_b) / r.planted, 3)
                if r.planted
                else None,
            }
        )
    # cleaning companion row: surviving nav_boilerplate pages must have the
    # junk lines stripped from their rebuilt text
    nav_plants = plants.filter(F.col("family") == "nav_boilerplate")
    n_nav = nav_plants.count()
    n_removed = (
        c4_clean(nav_plants)
        .filter(F.col("c4_keep") & ~F.col("text").contains(NAV_LINE))
        .count()
    )
    rows.append(
        {
            "operator": "gate_c4",
            "family": "nav_lines_removed",
            "planted": n_nav,
            "caught": n_removed,
            "recall": round(n_removed / n_nav, 3) if n_nav else None,
            "similarity": 1.0,
        }
    )
    fp = clean.select("doc_id").join(out_c4, "doc_id", "left_anti").count()
    tp = sum(r["caught"] for r in rows if r["family"] != "nav_lines_removed")
    rows.append(
        {
            "operator": "gate_c4",
            "family": "(precision)",
            "planted": n_clean,
            "caught": tp,
            "fp": int(fp),
            "precision": round(tp / (tp + fp), 4) if tp + fp else None,
        }
    )
    plants.unpersist()
    clean.unpersist()
    return rows


def measure_lm_bucketing(spark, docs: DataFrame) -> list[dict]:
    """CCNet LM-perplexity bucketing (t32/t33) as a RANKING gate: train the
    bigram stupid-backoff LM on the basic-gated corpus itself (the trusted
    slice role), score the planted corpus, split into exact tertiles, and
    measure what fraction of each junk family lands in the TAIL bucket —
    read against ``clean_base_rate`` (a third of ANY corpus is tail BY
    DESIGN; the signal is the lift, ~3x means the family concentrates
    entirely in the discard bucket, not a precision number — CCNet drops or
    downsamples the tail as a matter of recipe, there is no point gate to
    be precise about).

    Families: ``word_salad`` (hash-token injected + permuted — transitions
    never seen by the LM, heavy OOV mass) and ``symbol_spam`` (every 6th
    token replaced by '#####' — OOV backoff every 6 tokens).  Both are
    LM-visible for the published reason: their token transitions are
    unlikely under a reference model even where per-doc shape stats pass."""
    from healthcare_data_pipeline_spark.operators.lm import (
        lm_score,
        perplexity_buckets,
    )
    from healthcare_data_pipeline_spark.operators.quality import filter_corpus

    clean = filter_corpus(docs, min_stopword_ratio=None).select(
        "doc_id", "text", "source"
    )
    clean.cache()
    n_clean = clean.count()
    m = F.col("doc_id") % 100
    salad = clean.filter(m < 2).select(
        (F.col("doc_id") + 14 * FAM_OFFSET).alias("doc_id"),
        F.expr(
            "array_join(transform(array_sort(transform(split(text, ' '), (t, i) -> "
            "struct(xxhash64(concat(t, '_', CAST(i AS STRING), '_', CAST(doc_id AS STRING))) AS h, "
            "CASE WHEN i % 2 = 1 "
            "THEN substring(md5(concat(t, CAST(i AS STRING), CAST(doc_id AS STRING))), 1, 7) "
            "ELSE t END AS t))), s -> s.t), ' ')"
        ).alias("text"),
        "source",
        F.lit("word_salad").alias("family"),
    )
    spam = clean.filter((m >= 6) & (m < 8)).select(
        (F.col("doc_id") + 15 * FAM_OFFSET).alias("doc_id"),
        F.expr(
            "array_join(transform(split(text, ' '), (t, i) -> "
            "CASE WHEN i % 6 = 2 THEN '#####' ELSE t END), ' ')"
        ).alias("text"),
        "source",
        F.lit("spam_oov").alias("family"),
    )
    plants = salad.unionByName(spam)
    plants.cache()
    planted = clean.unionByName(plants.drop("family"))
    scores = lm_score(planted, clean)
    tail = (
        perplexity_buckets(scores, method="exact")
        .filter(F.col("ppl_bucket") == "tail")
        .select("doc_id")
    )
    rows: list[dict] = []
    verdicts = (
        plants.join(tail.withColumn("__t", F.lit(1)), "doc_id", "left")
        .groupBy("family")
        .agg(
            F.count("*").alias("planted"),
            F.sum(F.when(F.col("__t").isNotNull(), 1).otherwise(0)).alias("caught"),
        )
        .collect()
    )
    sims = {"word_salad": 0.5, "spam_oov": 0.833}
    for r in verdicts:
        rows.append(
            {
                "operator": "lm_tail_bucket",
                "family": r.family,
                "planted": r.planted,
                "caught": int(r.caught),
                "recall": round(r.caught / r.planted, 3) if r.planted else None,
                "similarity": sims[r.family],
            }
        )
    clean_tail = clean.select("doc_id").join(tail, "doc_id", "left_semi").count()
    rows.append(
        {
            "operator": "lm_tail_bucket",
            "family": "clean_base_rate",
            "planted": n_clean,
            "caught": clean_tail,
            "recall": round(clean_tail / n_clean, 3) if n_clean else None,
            "similarity": "(design)",
        }
    )
    plants.unpersist()
    clean.unpersist()
    return rows


def measure_web_curation(spark, docs: DataFrame) -> list[dict]:
    """w-family effectiveness (r13 verdict task 8): planted URL twins for
    url_dedup, a planted template-spam domain for domain_cap's exact/approx
    twins, and blocklist-evasion variants for domain_blocklist_filter.

    Clean baseline: every doc gets a UNIQUE synthesized URL (one page per
    doc), so url_dedup/domain-cap/blocklist are trivially fixpoints on it —
    any removal on the planted corpus is a planted catch or a false
    positive, never natural collision.

    url_dedup families (each a 2% id slice; similarity column = 1.0 for
    true same-page twins, 0.0 for the by-design negative):
    - ``mirror_scheme_case``: scheme/host case + WWW. + explicit :80 —
      the classic mirror refetch.
    - ``tracking_twin``: utm_source + fbclid appended — the ad-click twin.
    - ``fragment_twin``: #fragment appended.
    - ``userinfo_port_twin``: userinfo + FQDN trailing dot + :443 (the r14
      normalization rules, measured end to end).
    - ``distinct_page``: a REAL query param (?page=2) — must NOT merge
      (recall 0.000 BY DESIGN; a catch here is over-canonicalization and
      counts as a false positive).

    domain_cap: a spam-farm domain holding 10% of the corpus is planted
    into the 65-domain organic base; cap = 2x the max organic occupancy, so
    every organic domain is under-cap (any organic removal is an FP) and
    the spam domain must lose exactly (exact) / approximately (approx) its
    excess.  The similarity column carries kept/cap — the cap hit-rate.

    domain_blocklist: evasion variants of one blocked domain (explicit
    port, FQDN dot, path-less ?query, userinfo, subdomain) must ALL drop,
    batch and streaming predicate agreeing doc-for-doc
    (``stream_batch_parity`` row)."""
    from healthcare_data_pipeline_spark.operators.web import (
        domain_blocklist_filter,
        domain_blocklist_predicate,
        domain_cap,
        url_dedup,
    )

    clean = docs.select("doc_id", "text", "source").withColumn(
        "url",
        F.format_string(
            "https://sub.%s-%d.net/p/%d",
            F.col("source"),
            F.col("doc_id") % 13,
            F.col("doc_id"),
        ),
    )
    clean.cache()
    n_clean = clean.count()
    rows: list[dict] = []

    # ---------------------------------------------------------- url_dedup
    mirror = F.format_string(
        "HTTP://WWW.SUB.%s-%d.NET:80/p/%d",
        F.col("source"),
        F.col("doc_id") % 13,
        F.col("doc_id"),
    )
    uinfo = F.format_string(
        "https://u@sub.%s-%d.net.:443/p/%d",
        F.col("source"),
        F.col("doc_id") % 13,
        F.col("doc_id"),
    )
    ufams = [
        ("mirror_scheme_case", 1, mirror, 1.0),
        ("tracking_twin", 2, F.concat("url", F.lit("?utm_source=zq&fbclid=zz")), 1.0),
        ("fragment_twin", 3, F.concat("url", F.lit("#zfrag")), 1.0),
        ("userinfo_port_twin", 4, uinfo, 1.0),
        ("distinct_page", 5, F.concat("url", F.lit("?page=2")), 0.0),
    ]
    variants = None
    sim_by_fam = {}
    for name, fi, expr, sim in ufams:
        sim_by_fam[name] = sim
        v = (
            clean.filter(
                (F.col("doc_id") % 100 >= 2 * fi) & (F.col("doc_id") % 100 < 2 * fi + 2)
            )
            .select(
                (F.col("doc_id") + FAM_OFFSET * fi).alias("doc_id"),
                "text",
                "source",
                expr.alias("url"),
                F.lit(name).alias("family"),
            )
        )
        variants = v if variants is None else variants.unionByName(v)
    planted = clean.unionByName(variants.drop("family"))
    survivors = url_dedup(planted).select("doc_id")
    verdicts = (
        variants.select("family", "doc_id")
        .join(survivors.withColumn("__alive", F.lit(1)), "doc_id", "left")
        .groupBy("family")
        .agg(
            F.count("*").alias("planted"),
            F.sum(F.when(F.col("__alive").isNull(), 1).otherwise(0)).alias("caught"),
        )
        .collect()
    )
    clean_removed = clean.select("doc_id").join(survivors, "doc_id", "left_anti").count()
    tp, neg_fp = 0, 0
    for r in verdicts:
        rows.append(
            {
                "operator": "url_dedup",
                "family": r.family,
                "planted": r.planted,
                "caught": int(r.caught),
                "recall": round(r.caught / r.planted, 3) if r.planted else None,
                "similarity": sim_by_fam[r.family],
            }
        )
        if r.family == "distinct_page":
            neg_fp += int(r.caught)  # merging a distinct page IS an FP
        else:
            tp += int(r.caught)
    fp = clean_removed + neg_fp
    rows.append(
        {
            "operator": "url_dedup",
            "family": "(precision)",
            "planted": n_clean,
            "caught": tp,
            "fp": fp,
            "precision": round(tp / (tp + fp), 4) if tp + fp else None,
        }
    )

    # --------------------------------------------------------- domain_cap
    max_occ = (
        clean.groupBy(F.col("source"), F.col("doc_id") % 13)
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    cap = 2 * int(max_occ)
    spam = clean.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + FAM_OFFSET * 6).alias("doc_id"),
        "text",
        "source",
        F.format_string("https://spam-farm.net/p/%d", F.col("doc_id")).alias("url"),
    )
    n_spam = spam.count()
    planted_c = clean.unionByName(spam)
    excess = max(n_spam - cap, 0)
    for method in ("exact", "approx"):
        out_c = domain_cap(planted_c, max_docs=cap, method=method)
        spam_kept = out_c.filter(F.col("doc_id") >= FAM_OFFSET * 6).count()
        organic_removed = n_clean - out_c.filter(F.col("doc_id") < FAM_OFFSET * 6).count()
        caught = n_spam - spam_kept
        rows.append(
            {
                "operator": f"domain_cap_{method}",
                "family": "spam_farm_excess",
                "planted": excess,
                "caught": caught,
                "recall": round(caught / excess, 3) if excess else None,
                "similarity": round(spam_kept / cap, 3) if cap else None,
            }
        )
        rows.append(
            {
                "operator": f"domain_cap_{method}",
                "family": "(precision)",
                "planted": n_clean,
                "caught": caught,
                "fp": organic_removed,
                "precision": round(caught / (caught + organic_removed), 4)
                if caught + organic_removed
                else None,
            }
        )

    # ---------------------------------------------------------- blocklist
    bfams = [
        ("blk_port", 7, "https://zblock.net:8443/x/%d"),
        ("blk_fqdn_dot", 8, "https://zblock.net./x/%d"),
        ("blk_pathless_query", 9, "https://zblock.net?ref=%d"),
        ("blk_userinfo", 10, "https://u:p@zblock.net/x/%d"),
        ("blk_subdomain", 11, "https://a.b.zblock.net/x/%d"),
    ]
    bvariants = None
    for name, fi, fmt in bfams:
        v = (
            clean.filter(
                (F.col("doc_id") % 100 >= 2 * (fi - 6))
                & (F.col("doc_id") % 100 < 2 * (fi - 6) + 2)
            )
            .select(
                (F.col("doc_id") + FAM_OFFSET * fi).alias("doc_id"),
                "text",
                "source",
                F.format_string(fmt, F.col("doc_id")).alias("url"),
                F.lit(name).alias("family"),
            )
        )
        bvariants = v if bvariants is None else bvariants.unionByName(v)
    planted_b = clean.unionByName(bvariants.drop("family"))
    kept_b = domain_blocklist_filter(planted_b, ("zblock.net",)).select("doc_id")
    bverdicts = (
        bvariants.select("family", "doc_id")
        .join(kept_b.withColumn("__alive", F.lit(1)), "doc_id", "left")
        .groupBy("family")
        .agg(
            F.count("*").alias("planted"),
            F.sum(F.when(F.col("__alive").isNull(), 1).otherwise(0)).alias("caught"),
        )
        .collect()
    )
    btp = 0
    for r in bverdicts:
        btp += int(r.caught)
        rows.append(
            {
                "operator": "domain_blocklist",
                "family": r.family,
                "planted": r.planted,
                "caught": int(r.caught),
                "recall": round(r.caught / r.planted, 3) if r.planted else None,
                "similarity": 1.0,
            }
        )
    bfp = clean.select("doc_id").join(kept_b, "doc_id", "left_anti").count()
    rows.append(
        {
            "operator": "domain_blocklist",
            "family": "(precision)",
            "planted": n_clean,
            "caught": btp,
            "fp": bfp,
            "precision": round(btp / (btp + bfp), 4) if btp + bfp else None,
        }
    )
    # streaming predicate parity: the stateless closure gate must keep
    # EXACTLY the batch survivor set on the same planted corpus
    kept_s = planted_b.filter(domain_blocklist_predicate(("zblock.net",))).select(
        "doc_id"
    )
    mismatches = (
        kept_b.unionByName(kept_s)
        .groupBy("doc_id")
        .count()
        .filter(F.col("count") != 2)
        .count()
    )
    rows.append(
        {
            "operator": "domain_blocklist",
            "family": "stream_batch_parity",
            "planted": n_clean,
            "caught": n_clean - mismatches,
            "recall": 1.0 if mismatches == 0 else 0.0,
            "similarity": 1.0,
        }
    )
    clean.unpersist()
    return rows


def measure_scale(spark, docs_dir: str, base: str, k: int) -> list[dict]:
    docs = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
    en = _scaled_embeddings(spark, base, k)
    parts = [
        measure_doc_dedup(spark, docs),
        measure_semdedup(spark, en),
        measure_span_dedup(spark, docs),
        measure_exact_substring(spark, docs),
        measure_line_dedup(spark, docs),
        measure_decontamination(spark, docs),
        measure_quality_gates(spark, docs),
        measure_gopher_full_gate(spark, docs),
        measure_c4_gate(spark, docs),
        measure_lm_bucketing(spark, docs),
        measure_web_curation(spark, docs),
    ]
    rows = []
    for part in parts:
        for r in part:
            r["scale"] = k
        rows.extend(part)
    return rows


# ------------------------------------------------------------- reporting
def quality_section(all_rows: list[dict], base: str) -> str:
    fam_rows = [r for r in all_rows if r["family"] != "(precision)"]
    prec_rows = [r for r in all_rows if r["family"] == "(precision)"]
    lines = [
        QUALITY_BEGIN,
        "",
        "## Dedup effectiveness — precision/recall vs planted near-dups "
        "(tools/dedup_quality.py)",
        "",
        f"Ground-truth near-dup families planted at known rates into each "
        f"operator's own cleaned corpus (base `{base}`; replication as above), "
        "then the operator re-runs and we count catches.  `similarity` is the "
        "family's measured TRUE mean similarity (3-shingle Jaccard for text, "
        "cosine for embeddings; for span_dedup it is the exact-repair rate — "
        "planted span excised with no other token touched), so recall reads "
        "against how hard the family actually is.  Precision counts clean "
        "items the re-run removed (false positives, including clean docs "
        "dragged into a component through a planted variant).  Embedding "
        "ground truth only counts pairs whose true cosine clears the "
        "semdedup threshold (the operator's contract).",
        "",
        "| operator | family | " + " | ".join(
            f"{k}x recall (n)" for k in sorted({r['scale'] for r in fam_rows})
        ) + " | similarity |",
    ]
    scales = sorted({r["scale"] for r in fam_rows})
    lines.append("|---|---|" + "---|" * (len(scales) + 1))
    keys = sorted({(r["operator"], r["family"]) for r in fam_rows})
    for op, fam in keys:
        by_k = {r["scale"]: r for r in fam_rows if r["operator"] == op and r["family"] == fam}
        sim = by_k[scales[-1]]["similarity"]
        lines.append(
            f"| {op} | {fam} | "
            + " | ".join(
                f"{by_k[k]['recall']:.3f} ({by_k[k]['planted']})"
                if k in by_k and by_k[k]["recall"] is not None
                else "—"
                for k in scales
            )
            + f" | {sim} |"
        )
    lines += [
        "",
        "| operator | " + " | ".join(f"{k}x precision (TP/FP)" for k in scales) + " |",
        "|---|" + "---|" * len(scales),
    ]
    for op in sorted({r["operator"] for r in prec_rows}):
        by_k = {r["scale"]: r for r in prec_rows if r["operator"] == op}
        lines.append(
            f"| {op} | "
            + " | ".join(
                f"{by_k[k]['precision']:.4f} ({by_k[k]['caught']}/{by_k[k]['fp']})"
                if k in by_k and by_k[k]["precision"] is not None
                else "—"
                for k in scales
            )
            + " |"
        )
    lines += [
        "",
        "Reading: `ws_rewrap` is the exact stage's contract (must be 1.0); "
        "`suffix_2tok` sits near the LSH design point; `edit_5pct`/`edit_10pct` "
        "measure the published 4-band/4-row MinHash recall curve at decreasing "
        "Jaccard (theory: P = 1-(1-J^4)^4 → 0.99/0.76/0.28 at J 0.95/0.74/0.53 "
        "— the measured columns sit on it) — the knob is band shape / "
        "`min_shared_bands`, and a recall regression here is a "
        "signature-pipeline bug even when the oracles still pass.  FLAT "
        "text-dedup columns across 1x→64x are the scale claim: candidate "
        "generation stays bucket-scoped, so effectiveness does not decay as "
        "the corpus grows (caps or band-bucket saturation would show here "
        "first).  `emb_tiny` (cos ~1) holds ~1.0 at every scale; `emb_noise` "
        "(cos ~0.97 vs threshold 0.95 — deliberately borderline) DECAYS as "
        "the bounded-cell regime grows the cell count with the corpus (more "
        "cells = more boundary area = more cross-cell twins): the measured "
        "SemDeDup cross-cluster trade the paper accepts.  When borderline "
        "recall matters, the remedies are a threshold margin above the target "
        "band or fewer/larger cells (pay the |cell|² term) — now a measured "
        "decision instead of a guessed one.  span_dedup's exact-repair rate "
        "is low at sf0.1 not from a bug but because the templated corpus "
        "shares trailing token runs: seam windows straddling the planted "
        "span's boundary duplicate across planted docs and excise a few "
        "adjacent natural tokens (recall stays 1.0, non-planted docs "
        "untouched).  `line_dedup` probes the exact-line contract from both "
        "sides: the high-df banner, the df=2 pair (exactly at `min_docs` — "
        "the threshold boundary), and indentation-only variants (trim "
        "matching) must all be 1.000, while `banner_fuzz` (ONE doc-specific "
        "token inside the line, df=1 each) must be 0.000 BY DESIGN — exact "
        "line matching cannot catch near-dup lines; that row marks where "
        "the span stage (k-token windows) takes over.  The decontamination "
        "rows measure the n-gram leak contract: `verbatim_leak` and "
        "`quote_13tok` (exactly ONE shared 13-gram — the contract at its "
        "minimum) must be 1.000 in BOTH modes (Bloom has no false "
        "negatives), `paraphrase` (every 8th token rewritten → longest "
        "clean run 7 < 13) is 0.000 by construction — the published miss "
        "mode of n-gram decontamination, which no bitmap size fixes.  "
        "decon_bloom's FP column is the measured Bloom collision count "
        "against a bitmap sized by `bloom_m_bits(eval_grams, 1e-4)` — the "
        "fixed 2^20 default would SATURATE at 64x (~2M set-bit demands on "
        "1M bits flags nearly everything), so sizing-from-the-measured-gram-"
        "count is the practice this harness exercises and the table "
        "verifies.  Two collision effects to read correctly: decon_bloom's "
        "nonzero `paraphrase` numbers are NOT recall — they are the same "
        "hash collisions landing on planted docs (the ngram rows are the "
        "true 0.000); and the 64x FP rate sits above the per-gram 1e-4 "
        "target's per-doc compound because all k bit positions derive from "
        "ONE 32-bit gram hash — an h32 collision with any eval gram "
        "(~n_eval/2^32 ≈ 1.6e-4 per gram at 64x) hits all k bits at once, "
        "a floor no bitmap size removes; past ~10M eval grams the fix is a "
        "64-bit gram hash, not more bits.  The decon_fuzzy rows are dd25 (MinHash train x eval — the StarCoder/BigCode edited-leak remedy), measured against ITS OWN fixpoint baseline so precision stays a zero-FP contract: `verbatim_leak` 1.000 (identical docs share all four bands), `edited_leak` (every 12th token rewritten — zero shared 13-grams, the class ngram/bloom measure 0.000 on BY CONSTRUCTION) lands at the published banding curve (~0.41 at shingle-J ~0.6, theory 1-(1-J^4)^4 ≈ 0.43) and stays FLAT across scales; `quote_13tok` ~0.000 BY DESIGN (a 13-token quote inside a long doc leaves doc-level Jaccard near zero — the quote class belongs to the n-gram rule), `paraphrase` ~0.15 partial — the complementarity the two decontamination families exist for, measured from both sides.  The lm_tail_bucket rows measure CCNet bucketing (t32/t33) as a RANKING gate: word_salad and OOV-spam plants land in the perplexity tail bucket at 1.000 at every scale against the `clean_base_rate` 0.309 design column (a third of ANY corpus is tail by tertile construction — read the ~3.2x lift, not a precision number; CCNet drops or downsamples the tail as recipe).  The gate_* rows are the "
        "quality-gate coverage MATRIX — each junk family is crafted to "
        "slip every gate except its intended catcher, so the diagonal is "
        "the claim: `word_salad` (permuted + hash-token injected "
        "distributional junk) is visible ONLY to the corpus-adaptive "
        "rare-bigram gate; `token_loop` ONLY to the A1.2 repetition "
        "battery (t28 — the measured gap that motivated it: loops pass "
        "every A1.1 rule with the same words/lengths, and pass the "
        "rare-bigram gate because their transitions recur corpus-wide); "
        "`symbol_spam` ONLY to A1.1's hash-ratio rule; `short_frag` to "
        "the word-count bands — it also trips repetition's top-n-gram "
        "fractions trivially (a single 2-gram is ~70% of a 3-token doc's "
        "characters; the published battery runs after the length gates, "
        "which is the composition `prep_corpus` uses).  gate_gopher gates "
        "on A1.1 MINUS the required-stopword rule: the synthetic vocab "
        "contains no Gopher stopwords (and the scale replicas' per-token "
        "rewrite would destroy them anyway), so the full AND-gate would "
        "empty the corpus — the basic gate likewise runs without its "
        "stopword floor (a corpus artifact, production keeps both).  "
        "`gate_gopher_full` closes that measurement gap: two distinct "
        "stopwords are WOVEN into every 11-token stride of the corpus so "
        "the complete eight-rule AND-gate has a live baseline, and the "
        "`stopword_free` family (all stopwords stripped from an "
        "otherwise-healthy doc) is caught at 1.0 by the full gate while "
        "the seven-rule variant measures 0.0 on it — the required-stopword "
        "rule's unique coverage, now a matrix row instead of a footnote.  "
        "The gate_c4 rows are the C4 battery (t34, Raffel 2020 §2.2) on a "
        "re-lined corpus (C4_LINE_WEAVE_SQL — 8-word terminal-punctuated "
        "sentences, the same corpus-artifact repair class as the stopword "
        "weave): `no_terminal`/`curly_code`/`lorem_banner` are LINE/page "
        "editorial-shape junk every distributional gate is blind to "
        "(basic_recall 0.0 alongside each row) and C4 catches at 1.0; "
        "`nav_boilerplate` pins the CLEANING side — short terminal-free nav "
        "lines must NOT kill the page (recall 0.0 is the contract) and the "
        "companion `nav_lines_removed` row measures at 1.0 that the "
        "surviving pages' rebuilt text actually dropped them — the "
        "use_c4-in-prep_corpus behavior, measured.  "
        "The exact_substring rows are dd24 (Lee et al. ExactSubstr "
        "semantics — occurrence-counted, threshold 12 here): `es_sub_6tok` "
        "below the threshold MUST be 0.000 (not duplication); "
        "`es_within_doc` is the semantic delta made visible — dd24 catches "
        "the within-one-doc repeat at 1.0 where dd19's distinct-docs "
        "curation default measures 0.0 (its column in the JSON); and the "
        "es_* `seam_rate` (caught minus exact-repair) is the measured "
        "adjacent-token excision on corpora with shared trailing runs — "
        "inherent to the PUBLISHED semantics (a straddling window that "
        "recurs verbatim IS a duplicated >=min_len substring), so it is "
        "measured rather than pretended away.  Gate precision 1.0 is a hard "
        "contract: per-doc "
        "gates are stateless, and plants only ADD bigram occurrences, so "
        "the corpus-adaptive gate can only get safer.  The url_dedup rows "
        "(r14) measure the w-family's CURATION effect, not just its speed: "
        "mirror/tracking/fragment/userinfo-port twins of real pages must "
        "all collapse at 1.000 (each family isolates one normalization "
        "rule; userinfo_port_twin exercises the r14 authority-boundary and "
        "trailing-dot rules end to end), while `distinct_page` (?page=2 — "
        "a REAL parameter) must be 0.000 BY DESIGN: merging it is "
        "over-canonicalization and counts against precision, which is the "
        "two-sided contract that keeps the rule set honest (C4 keeps one "
        "page per URL; RefinedWeb dedups URLs before any content pass).  "
        "The domain_cap rows plant a spam-farm domain holding 10% of the "
        "corpus into an all-under-cap organic base: exact must shed "
        "EXACTLY the excess (recall 1.000, kept/cap 1.000 in the "
        "similarity column) with zero organic FPs; approx — the 100 TB "
        "zero-window path — sheds ~the excess (kept/cap ~1 within the "
        "hash-threshold's binomial noise), the measured cost of dropping "
        "the per-domain window.  The domain_blocklist rows are the r13 "
        "review's evasion variants AT SCALE (explicit port, FQDN dot, "
        "path-less ?query, userinfo, subdomain — all must drop at 1.000) "
        "plus `stream_batch_parity`: the stateless streaming closure "
        "predicate keeps doc-for-doc the batch anti join's survivor set, "
        "NULL-provenance and all.  Regenerate with "
        "`python tools/dedup_quality.py`.",
        "",
        QUALITY_END,
    ]
    return "\n".join(lines)


def splice_into_scale_md(section: str, repo_root: str) -> None:
    path = os.path.join(repo_root, "SCALE.md")
    text = ""
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
    if QUALITY_BEGIN in text and QUALITY_END in text:
        pre = text[: text.index(QUALITY_BEGIN)]
        post = text[text.index(QUALITY_END) + len(QUALITY_END):]
        text = pre + section + post
    else:
        text = text.rstrip("\n") + "\n\n" + section + "\n"
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)


def main() -> None:
    from tools.scale_stress import build_corpora

    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,16,64")
    ap.add_argument(
        "--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    scales = sorted(int(s) for s in args.scales.split(","))

    spark = get_spark(app_name="hdp-dedup-quality")
    dirs = build_corpora(spark, args.base, scales)
    all_rows: list[dict] = []
    for k in scales:
        rows = measure_scale(spark, dirs[k], args.base, k)
        all_rows.extend(rows)
        for r in rows:
            print(f"# {k}x {r}", file=sys.stderr)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    splice_into_scale_md(quality_section(all_rows, args.base), repo_root)
    print(json.dumps({"rows": all_rows}))
    spark.stop()


if __name__ == "__main__":
    main()

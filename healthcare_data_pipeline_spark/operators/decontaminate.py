"""[EXT] Benchmark decontamination — drop training documents that overlap an
eval set.

The stage every serious training pipeline runs before a model sees data:
remove from the 100 TB training corpus anything that collides with held-out
evaluation sets, so benchmark numbers measure generalization, not leakage.
Two collision definitions, both deterministic:

* **exact** — whitespace-normalized md5 fingerprint equality (the dd01 key,
  operators.dedup_corpus.normalized_fingerprint).
* **ngram** — any shared word n-gram (the GPT-3-style 13-gram overlap rule;
  ``n`` is a knob, catalog dd13 pins n=3 so the synthetic corpus exhibits
  observable contamination).

Scale shape: the EVAL side is always the small one (benchmarks are KBs-MBs
against a TB-scale train side), so its distinct n-gram/fingerprint set is
broadcast; the train side is one linear explode + broadcast-hash semi-join
to find contaminated ids, then a broadcast anti-join.  No shuffle of the
train corpus at any point — the whole pass is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.operators.dedup_corpus import normalized_fingerprint

DEFAULT_NGRAM = 13


def word_ngrams_sql(n: int, toks: str = "toks") -> str:
    """Spark SQL expr: word n-grams of a ``toks`` array column (empty array
    below n tokens — guards the descending-sequence gotcha)."""
    joined = ", ' ', ".join(f"element_at({toks}, i + {j})" for j in range(n))
    return (
        f"CASE WHEN size({toks}) >= {n} THEN transform("
        f"sequence(1, size({toks}) - {n - 1}), i -> concat({joined})"
        f") ELSE array() END"
    )


def _exploded_ngrams(df: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    return df.selectExpr(
        id_col, f"split(lower({text_col}), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+') AS toks"
    ).selectExpr(id_col, f"explode(array_distinct({word_ngrams_sql(n)})) AS g")


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    mode: str = "ngram",
    n: int = DEFAULT_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training rows minus those colliding with ``eval_df`` (all original
    columns preserved)."""
    if mode == "exact":
        ev = eval_df.select(normalized_fingerprint(text_col).alias("__fp")).distinct()
        return (
            train.withColumn("__fp", normalized_fingerprint(text_col))
            .join(F.broadcast(ev), "__fp", "left_anti")
            .drop("__fp")
        )
    contaminated = contaminated_ids(
        train, eval_df, mode=mode, n=n, id_col=id_col, text_col=text_col
    )
    return train.join(F.broadcast(contaminated), id_col, "left_anti")


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    mode: str = "ngram",
    n: int = DEFAULT_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ids of training docs colliding with the eval set — the small set both
    ``decontaminate`` (anti-join) and ``contamination_report`` (flag join)
    broadcast; bounded by the actual overlap, not by corpus size."""
    if mode == "exact":
        ev = eval_df.select(normalized_fingerprint(text_col).alias("__fp")).distinct()
        return (
            train.withColumn("__fp", normalized_fingerprint(text_col))
            .join(F.broadcast(ev), "__fp", "left_semi")
            .select(id_col)
            .distinct()
        )
    if mode != "ngram":
        raise ValueError(f"unknown decontaminate mode {mode!r}: expected 'exact' or 'ngram'")
    ev = _exploded_ngrams(eval_df, n, id_col, text_col).select("g").distinct()
    return (
        _exploded_ngrams(train, n, id_col, text_col)
        .join(F.broadcast(ev), "g", "left_semi")
        .select(id_col)
        .distinct()
    )


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    mode: str = "ngram",
    n: int = DEFAULT_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-``group_col`` contamination statistics — the DIAGNOSTIC twin of
    ``decontaminate``: instead of dropping overlapping training docs, report
    how many each slice has (curation decisions need the rate before anyone
    deletes data).  Columns: group, n_docs, n_contaminated, contamination_rate.

    Same scale shape as decontaminate: the eval side is exploded/broadcast,
    the train side is never shuffled — the contaminated-id set (bounded by
    train doc count but in practice benchmark-overlap-sized) broadcasts back
    for the flag join, and the group aggregation combines map-side.
    """
    bad = contaminated_ids(
        train, eval_df, mode=mode, n=n, id_col=id_col, text_col=text_col
    ).withColumn("__bad", F.lit(True))
    return (
        train.join(F.broadcast(bad), id_col, "left")
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("__bad"), 1).otherwise(0)).alias("n_contaminated"),
        )
        .select(
            "group",
            "n_docs",
            "n_contaminated",
            (F.col("n_contaminated").cast("double") / F.col("n_docs")).alias(
                "contamination_rate"
            ),
        )
    )

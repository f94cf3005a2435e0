"""[EXT] Corpus quality filtering front door — the C4-style cleaning gate.

The text queries expose the SIGNALS (t01 token counts, t02 quality score,
t03 language heuristic); a training-data pipeline needs the composed FILTER:
"give me the corpus minus the junk".  ``filter_corpus`` applies the standard
pre-training gates — word-count band, average-word-length cap, optional
stopword-ratio floor (the language/quality proxy) — as one pure-column-
expression predicate: a single narrow scan, no shuffle, trivially pushed
ahead of every downstream stage (dedup, embedding, tokenization), which is
exactly where a 100 TB pipeline wants its cheapest, most selective filter.

Catalog entry t07_quality_filter pins the composition against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.queries.text import STOPWORDS


def quality_predicate(
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 1000,
    max_avg_word_len: float = 12.0,
    min_stopword_ratio: float | None = None,
) -> Column:
    """The reusable gate expression (also usable on a streaming ingest)."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    n_words = F.size(toks)
    avg_word_len = (F.length(text_col) - n_words + 1).cast("double") / n_words.cast("double")
    pred = n_words.between(min_words, max_words) & (avg_word_len <= max_avg_word_len)
    if min_stopword_ratio is not None:
        stop_ratio = (
            F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
            / n_words.cast("double")
        )
        pred = pred & (stop_ratio >= min_stopword_ratio)
    return pred


def filter_corpus(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 1000,
    max_avg_word_len: float = 12.0,
    min_stopword_ratio: float | None = None,
) -> DataFrame:
    """``docs`` minus documents failing the quality gates; all columns kept."""
    return docs.filter(
        quality_predicate(
            text_col,
            min_words=min_words,
            max_words=max_words,
            max_avg_word_len=max_avg_word_len,
            min_stopword_ratio=min_stopword_ratio,
        )
    )


def prep_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_stopword_ratio: float | None = 0.01,
    hasher: str = "portable",
) -> DataFrame:
    """The whole pre-training prep path: quality FILTER then full DEDUP
    (exact fingerprint -> LSH near-dup clusters -> canonical survivors).

    Filter-first is the scale-correct order: the narrow quality predicate is
    the cheapest, most selective stage, so everything the dedup stages
    shuffle (shingles, signatures, band buckets) is computed only for
    documents that can actually ship.  Catalog entry dd12_prep_corpus
    verifies the composition end-to-end against a recursive-CTE oracle.
    """
    from healthcare_data_pipeline_spark.operators.dedup_corpus import dedup_corpus

    filtered = filter_corpus(
        docs, text_col=text_col, min_stopword_ratio=min_stopword_ratio
    )
    return dedup_corpus(filtered, id_col=id_col, text_col=text_col, hasher=hasher)

"""[EXT] Context-window preparation: document chunking and sequence packing.

The two ops that turn a cleaned corpus into model-ready sequences:

* ``chunk_documents`` — split each document into overlapping token windows
  (chunk_size tokens, stride = chunk_size - overlap).  Pure JVM fan-out:
  ``explode(sequence(...))`` over per-document start offsets, then
  ``slice``/``array_join`` — no UDF, no shuffle; output size is linear in
  total token count regardless of document-length skew.

* ``pack_sequences`` — concat-and-split packing: documents are laid end to
  end in a deterministic order and the stream is cut every ``budget``
  tokens; each document reports which bins it lands in and how many tokens
  it contributes to each.  Packing runs PER GROUP (default: per ``source``)
  so the cumulative-sum window is ``partitionBy(group)`` — parallel across
  shards — rather than a single-partition global window, which is the
  100 TB-scale requirement (training shards are per-source anyway; a
  global pack order would serialize the whole corpus through one task).

Both are deterministic functions of (doc_id, text) so their outputs are
value-hash-verifiable cross-engine (catalog entries t08/t09).

Reference has no training-data surface; charter-mandated [EXT]
(SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CHUNK_SIZE = 64
DEFAULT_OVERLAP = 16
DEFAULT_PACK_BUDGET = 512


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
) -> DataFrame:
    """One row per (document, chunk): (id, chunk_idx, n_chunk_tokens, chunk_text).

    Chunk i covers tokens [i*stride + 1, i*stride + chunk_size] (1-based,
    whitespace tokenizer); the final chunk may be short, and every document
    yields at least one chunk.  ``explode`` fan-out keeps the op narrow —
    chunks of one document stay in its input partition.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap=} {chunk_size=}")
    stride = chunk_size - overlap
    toks = F.split(F.col(text_col), r"[ \t\n\r\f\x0B]+")
    n = F.size(toks)
    # starts: 1, 1+stride, ...; n_starts = 1 if n <= chunk_size else ceil((n-chunk_size)/stride)+1
    n_starts = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n - chunk_size) / F.lit(float(stride))).cast("int") + 1
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_size)
    # Inner explode is correct HERE (r15 note): its inferred filter shares
    # the generate's codegen stage (no exchange between scan and explode),
    # so subexpression elimination already evaluates the tokenize-and-count
    # once — the explode_outer rewrite that pays off behind a repartition
    # (band_buckets, bpe_tokens) only added overhead here (A/B, reverted).
    return (
        df.select(
            id_col, toks.alias("__toks"), n.alias("__n"), n_starts.alias("__ns")
        )
        .select(
            id_col,
            "__toks",
            "__n",
            F.explode(F.sequence(F.lit(0), F.col("__ns") - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            # == size(slice(__toks, chunk_idx*stride + 1, chunk_size)):
            # every generated start satisfies 1 <= start <= n (n_starts'
            # construction), so the slice size is min(chunk_size, n - start
            # + 1) — plain arithmetic on the pre-explode token count.
            # Consumers that prune chunk_text (t14 keeps only the count)
            # then never touch the token array after the explode at all —
            # the per-chunk slice was the dominant post-explode cost (r16).
            F.least(F.lit(chunk_size), F.col("__n") - F.col("chunk_idx") * stride)
            .cast("long")
            .alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    budget: int = DEFAULT_PACK_BUDGET,
    tokenizer: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Concat-and-split packing: (group, id, n_tokens, bin_id, tok_in_bin).

    Documents are concatenated in ``id_col`` order within each ``group_col``
    shard and the token stream is cut every ``budget`` tokens.  A document
    spanning a cut appears once per bin it touches, with the token count it
    contributes to that bin (sum over rows of tok_in_bin == n_tokens).

    ``tokenizer``: a BPE merges list (``operators.bpe``) switches the
    packing currency to the EXACT token count under that tokenizer — bins
    are the sequence slots of a real model, so packing in estimate-tokens
    over- or under-fills them by the measured estimate-vs-exact drift
    (SCALE.md); same plan shape, the count is one scan-bound fold column
    (the ``token_budget_sample(tokenizer=)`` convention).

    Plan shape: one cumulative-sum window partitioned by the shard key
    (parallel, no global sort) + an explode over the (first_bin..last_bin)
    range — at most ceil(n_tokens/budget)+1 rows per document.
    """
    toks = F.split(F.col(text_col), r"[ \t\n\r\f\x0B]+")
    if tokenizer is not None:
        from healthcare_data_pipeline_spark.operators.bpe import bpe_token_count_col

        n = bpe_token_count_col(tokenizer, text_col=text_col).cast("long")
    else:
        n = F.size(toks).cast("long")
    w = Window.partitionBy(group_col).orderBy(id_col)
    cum = F.sum("n_tokens").over(w)
    first_bin = F.floor(F.col("start_off") / budget)
    last_bin = F.floor((F.col("cum") - 1) / budget)
    tok_in_bin = F.least(F.col("cum"), (F.col("bin_id") + 1) * budget) - F.greatest(
        F.col("start_off"), F.col("bin_id") * budget
    )
    # Zero-token docs (possible only under an exact tokenizer: empty /
    # whitespace-only text) contribute nothing to any bin; keeping them
    # would make first_bin > last_bin on an exact boundary (F.sequence
    # would then generate a DESCENDING range -> spurious rows) and emit a
    # degenerate tok_in_bin=0 row otherwise.  Dropping them before the
    # window is exact: they add 0 to every later cum.
    return (
        df.select(group_col, id_col, n.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .withColumn("cum", cum)
        .withColumn("start_off", F.col("cum") - F.col("n_tokens"))
        .select(
            group_col,
            id_col,
            "n_tokens",
            "cum",
            "start_off",
            F.explode(F.sequence(first_bin, last_bin)).alias("bin_id"),
        )
        .select(
            group_col,
            id_col,
            "n_tokens",
            F.col("bin_id").cast("long").alias("bin_id"),
            tok_in_bin.cast("long").alias("tok_in_bin"),
        )
    )

"""[EXT] Text-analysis operators over the ``documents`` table (SURVEY.md §2.7 EXT).

Training-data-pipeline text ops: token counting, quality scoring, language-ID
heuristic, document fingerprinting, shingling.  All pure column expressions
(JVM-side, codegen'd — no Python UDFs), so they scale linearly with input and
never shuffle except where a groupBy is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.queries import query

# Stopword markers used by the quality / language heuristics (vocabulary-based;
# deterministic and oracle-expressible).
STOPWORDS = ("the", "a", "of", "and", "in", "to")
# The Gopher paper's required-stopword list (Rae et al. 2021, A1.1) — lives
# here beside STOPWORDS because operators.quality imports from this module
# (same direction for both constants keeps the import graph acyclic).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_STOP_SQL = "('the', 'a', 'of', 'and', 'in', 'to')"


def _tokens(col):
    return F.split(F.lower(col), r"[ \t\n\r\f\x0B]+")


@query(
    "t01_token_stats",
    oracle="""
    SELECT
      doc_id,
      length(text) AS n_chars_observed,
      n_chars,
      len(string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+')) AS n_tokens
    FROM documents
    """,
    tags=("text", "EXT", "tokens"),
    doc="Token counting (whitespace tokenizer) + char-length audit against the n_chars metadata column.",
)
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_observed"),
        "n_chars",
        F.size(F.split(F.col("text"), r"[ \t\n\r\f\x0B]+")).alias("n_tokens"),
    )


@query(
    "t02_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks,
             length(text) AS n_chars
      FROM documents
    )
    SELECT
      doc_id,
      len(toks) AS n_words,
      CAST(n_chars - len(toks) + 1 AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_word_len,
      CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
        / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
      CASE WHEN len(toks) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END AS len_ok
    FROM t
    """,
    tags=("text", "EXT", "quality"),
    doc="Quality scoring: word count, mean word length, stopword ratio, length gate — the "
    "standard pre-training corpus filters, as pure column expressions.",
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_words = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        ((F.length("text") - n_words + 1).cast("double") / n_words.cast("double")).alias(
            "avg_word_len"
        ),
        (n_stop.cast("double") / n_words.cast("double")).alias("stopword_ratio"),
        F.when(n_words.between(20, 1000), 1).otherwise(0).alias("len_ok"),
    )


@query(
    "t03_lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents
    )
    SELECT
      doc_id,
      lang AS lang_label,
      CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
        / CAST(len(toks) AS DOUBLE) AS en_score,
      CASE WHEN CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
                / CAST(len(toks) AS DOUBLE) >= 0.05
           THEN 'en' ELSE 'unknown' END AS lang_guess
    FROM t
    """,
    tags=("text", "EXT", "langid"),
    doc="Language-ID heuristic: stopword-marker frequency score with a threshold decision. "
    "(The test corpus is a synthetic shared vocabulary, so the heuristic is graded on "
    "determinism, not label recovery.)",
)
def t03_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    score = (
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
        / F.size(toks).cast("double")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        score.alias("en_score"),
        F.when(score >= 0.05, "en").otherwise("unknown").alias("lang_guess"),
    )


@query(
    "t04_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
    tags=("text", "EXT", "fingerprint"),
    doc="Document fingerprinting: whitespace-normalized lowercase md5 digest (stable across "
    "engines; basis of exact dedup dd01).",
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.col("text")), r"[ \t\n\r\f\x0B]+", " ")).alias("fingerprint"),
    )


@query(
    "t05_shingle_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents
    )
    SELECT
      doc_id,
      len(toks) AS n_tokens,
      len(list_distinct(
        list_transform(
          generate_series(1, greatest(len(toks) - 2, 0)),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        )
      )) AS n_distinct_shingles
    FROM t
    """,
    tags=("text", "EXT", "shingles"),
    doc="Word-3-gram shingling: distinct shingle count per document — the shingle layer under "
    "MinHash/Jaccard dedup, as built-in array higher-order functions.",
)
def t05_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.dedup_corpus import WORD_3GRAMS_SQL

    d = table(spark, sf_dir, "documents")
    out = d.selectExpr(
        "doc_id",
        "split(lower(text), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+') AS toks",
    ).selectExpr(
        "doc_id",
        "size(toks) AS n_tokens",
        # WORD_3GRAMS_SQL guards size(toks) < 3 (Spark's sequence(1,0) is
        # DESCENDING, not empty) -> 0 shingles, matching the oracle's
        # empty generate_series
        f"size(array_distinct({WORD_3GRAMS_SQL})) AS n_distinct_shingles",
    )
    return out


# GPT-2-style pre-tokenizer alternation, RE2-safe (no lookaheads, so Java regex
# and DuckDB RE2 agree): optional-space letter runs / digit runs / punct runs.
_BPE_PAT = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 \t\n\r\f\x0B]+"


@query(
    "t06_bpe_token_estimate",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{_BPE_PAT}')) AS n_pieces,
           GREATEST(
             len(regexp_extract_all(lower(text), '{_BPE_PAT}')),
             CAST(CEIL(length(text) / 4.0) AS BIGINT)
           ) AS est_tokens
    FROM documents
    """,
    tags=("text", "EXT", "tokens", "bpe"),
    doc="BPE-ish token counting: a GPT-2-style pre-tokenizer alternation (letter runs / "
    "digit runs / punctuation runs, optional leading space; RE2-safe so Spark and the "
    "oracle agree) plus the chars/4 floor used for budget estimation. One narrow "
    "regexp_count projection — the cheap token-budget pass a training-data pipeline "
    "runs over every document.",
)
def t06_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    n_pieces = F.regexp_count(F.lower("text"), F.lit(_BPE_PAT))
    return d.select(
        "doc_id",
        n_pieces.cast("long").alias("n_pieces"),
        F.greatest(
            n_pieces.cast("long"), F.ceil(F.length("text") / 4.0).cast("long")
        ).alias("est_tokens"),
    )


_CHUNK, _STRIDE = 64, 48  # chunk_size=64, overlap=16


@query(
    "t08_chunk_documents",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= {_CHUNK} THEN 1
                  ELSE CAST(CEIL((len(toks) - {_CHUNK}) / {_STRIDE}.0) AS BIGINT) + 1
             END AS n_starts
      FROM t
    )
    SELECT doc_id,
           CAST(ci.chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(toks[ci.chunk_idx * {_STRIDE} + 1 : ci.chunk_idx * {_STRIDE} + {_CHUNK}])
                AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[ci.chunk_idx * {_STRIDE} + 1 : ci.chunk_idx * {_STRIDE} + {_CHUNK}],
                           ' ') AS chunk_text
    FROM s, UNNEST(generate_series(0, n_starts - 1)) AS ci(chunk_idx)
    """,
    tags=("text", "EXT", "chunking", "front-door"),
    doc="Context-window chunking (operators.chunking.chunk_documents): each document split "
    "into overlapping 64-token windows (stride 48) via explode(sequence) + slice + "
    "array_join — pure JVM fan-out, no UDF, no shuffle; chunks stay in their document's "
    "partition. The op that turns a cleaned corpus into model-ready windows.",
)
def t08_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.chunking import chunk_documents

    d = table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_size=_CHUNK, overlap=_CHUNK - _STRIDE)


_PACK_BUDGET = 512


@query(
    "t09_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             CAST(len(string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM t
    )
    SELECT source, doc_id, n_tokens,
           CAST(b.bin_id AS BIGINT) AS bin_id,
           CAST(LEAST(cum, (b.bin_id + 1) * {_PACK_BUDGET})
                - GREATEST(cum - n_tokens, b.bin_id * {_PACK_BUDGET}) AS BIGINT) AS tok_in_bin
    FROM c, UNNEST(generate_series((cum - n_tokens) // {_PACK_BUDGET},
                                   (cum - 1) // {_PACK_BUDGET})) AS b(bin_id)
    """,
    tags=("text", "EXT", "packing", "front-door"),
    doc="Concat-and-split sequence packing (operators.chunking.pack_sequences): documents "
    "laid end to end per source shard, the token stream cut every 512 tokens; one row per "
    "(document, bin) with the tokens contributed. The cumulative-sum window partitions by "
    "the shard key — parallel across sources, never a single-partition global sort. "
    "(split() always yields >= 1 token, so the bin range is never empty — guards Spark's "
    "descending-sequence gotcha.)",
)
def t09_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.chunking import pack_sequences

    d = table(spark, sf_dir, "documents")
    return pack_sequences(d, budget=_PACK_BUDGET)


# Deterministic PII suffix so redaction is observable in the value hash
# (the synthetic corpus itself contains no contact-shaped spans).
_PII_SUFFIX = "@example.com or 555-123-4567 ssn 123-45-6789"


def _t10_oracle_sql() -> str:
    from healthcare_data_pipeline_spark.operators.redact import EMAIL_PAT, PHONE_PAT, SSN_PAT

    return f"""
    WITH t AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '{_PII_SUFFIX}' AS txt
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '{EMAIL_PAT}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(txt, '{SSN_PAT}')) AS BIGINT) AS n_ssn,
           CAST(len(regexp_extract_all(txt, '{PHONE_PAT}')) AS BIGINT) AS n_phone,
           regexp_replace(regexp_replace(regexp_replace(
             txt, '{EMAIL_PAT}', '[EMAIL]', 'g'),
                  '{SSN_PAT}', '[ID]', 'g'),
                  '{PHONE_PAT}', '[PHONE]', 'g') AS text
    FROM t
    """


@query(
    "t10_pii_redact",
    oracle=_t10_oracle_sql(),
    tags=("text", "EXT", "pii", "front-door"),
    doc="PII redaction (operators.redact.redact_pii): email / SSN-shaped / phone-shaped "
    "spans replaced with typed tags, per-pattern match counts as the audit signal. "
    "Patterns are RE2-safe so Spark's Java regex and the oracle's RE2 match identical "
    "spans — the reproducibility contract for a scrub pass. A deterministic PII suffix "
    "is injected first so the redaction is exercised (and hash-checked), not vacuous.",
)
def t10_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.redact import redact_pii

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit(_PII_SUFFIX),
        ).alias("text"),
    )
    return redact_pii(d).select("doc_id", "n_email", "n_ssn", "n_phone", "text")


# Tiered data-mixing weights over the 20 synthetic sources (src0..src19).
_MIX_WEIGHTS = {
    f"src{i}": (1.0 if i < 5 else 0.6 if i < 10 else 0.3 if i < 15 else 0.1)
    for i in range(20)
}


def _t11_oracle_sql() -> str:
    from healthcare_data_pipeline_spark.operators.mixture import DENOM, weight_thresholds
    from healthcare_data_pipeline_spark.queries.dedup import _SQL_H32

    case = " ".join(
        f"WHEN '{s}' THEN {t}" for s, t in sorted(weight_thresholds(_MIX_WEIGHTS).items())
    )
    return f"""
    WITH t AS (
      SELECT doc_id, lang, source, CAST(doc_id AS VARCHAR) AS s FROM documents
    )
    SELECT doc_id, lang, source
    FROM t
    WHERE ({_SQL_H32}) % {DENOM} < CAST(CASE source {case} ELSE 0 END AS BIGINT)
    """


@query(
    "t11_mixture_sample",
    oracle=_t11_oracle_sql(),
    tags=("text", "EXT", "sampling", "front-door"),
    doc="Deterministic mixture sampling (operators.mixture.mixture_sample): per-source "
    "data-mixing weights applied as a portable-hash gate (same md5 convention as "
    "dd06/dd07) — no RNG, bit-identical selection on any engine, kept-set monotone in "
    "the weight. One narrow filter, shuffle-free, composes with partition pruning on "
    "source.",
)
def t11_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.mixture import mixture_sample

    d = table(spark, sf_dir, "documents")
    return mixture_sample(d, _MIX_WEIGHTS).select("doc_id", "lang", "source")


# Resampling mix: upsample the first tier, keep the second, halve the third,
# drop the rest.
_RESAMPLE_WEIGHTS = {
    f"src{i}": (2.5 if i < 5 else 1.0 if i < 10 else 0.5 if i < 15 else 0.0)
    for i in range(20)
}


def _t12_oracle_sql() -> str:
    from healthcare_data_pipeline_spark.operators.mixture import DENOM, fractional_thresholds
    from healthcare_data_pipeline_spark.queries.dedup import _SQL_H32

    fr = fractional_thresholds(_RESAMPLE_WEIGHTS)
    full_case = " ".join(f"WHEN '{s}' THEN {nf}" for s, (nf, _) in sorted(fr.items()))
    gate_case = " ".join(f"WHEN '{s}' THEN {g}" for s, (_, g) in sorted(fr.items()))
    return f"""
    WITH t AS (
      SELECT doc_id, source, CAST(doc_id AS VARCHAR) AS s FROM documents
    ),
    n AS (
      SELECT doc_id, source,
             (CASE source {full_case} ELSE 0 END)
             + (CASE WHEN ({_SQL_H32}) % {DENOM}
                          < CAST(CASE source {gate_case} ELSE 0 END AS BIGINT)
                     THEN 1 ELSE 0 END) AS nc
      FROM t
    )
    SELECT doc_id, source, CAST(e.epoch AS BIGINT) AS epoch
    FROM n, UNNEST(generate_series(0, nc - 1)) AS e(epoch)
    """


@query(
    "t12_mixture_resample",
    oracle=_t12_oracle_sql(),
    tags=("text", "EXT", "sampling", "front-door"),
    doc="Weighted resampling with upsampling (operators.mixture.mixture_resample): "
    "floor(w) full copies per row plus one hash-gated fractional copy, E[copies] = w "
    "exactly; output carries a 0-based epoch index for downstream mixing. Deterministic "
    "(same portable-hash gate as t11), narrow explode fan-out, no shuffle, no RNG.",
)
def t12_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.mixture import mixture_resample

    d = table(spark, sf_dir, "documents")
    return mixture_resample(d, _RESAMPLE_WEIGHTS).select("doc_id", "source", "epoch")


def _t19_oracle_sql() -> str:
    from healthcare_data_pipeline_spark.operators.mixture import DENOM, split_thresholds
    from healthcare_data_pipeline_spark.queries.dedup import _SQL_H32

    ths = split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    case = " ".join(f"WHEN u < {th} THEN '{name}'" for name, th in ths[:-1])
    return f"""
    WITH t AS (
      SELECT doc_id, source, CAST(doc_id AS VARCHAR) || ':split' AS s FROM documents
    ),
    h AS (SELECT doc_id, source, ({_SQL_H32}) % {DENOM} AS u FROM t)
    SELECT doc_id, source,
           CASE {case} ELSE '{ths[-1][0]}' END AS split
    FROM h
    """


@query(
    "t19_hash_split",
    oracle=_t19_oracle_sql(),
    tags=("text", "EXT", "sampling", "front-door"),
    doc="Deterministic train/val/test split (operators.mixture.hash_split): salted "
    "portable-hash assignment — disjoint, exhaustive, no RNG, bit-identical on any "
    "engine, and a document's split NEVER changes when other documents are added or "
    "removed (frozen eval sets stay frozen across corpus versions). The salt "
    "decorrelates the split from t11's mixture gate (correlated hash gates are silent "
    "selection bias). Zero shuffle: one narrow projection. Count-exact per-stratum "
    "variant: operators.mixture.exact_stratified_split (window-ranked, for bounded "
    "strata).",
)
def t19_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.mixture import hash_split

    d = table(spark, sf_dir, "documents")
    return hash_split(d).select("doc_id", "source", "split")


def _t22_oracle_sql() -> str:
    from healthcare_data_pipeline_spark.operators.mixture import DENOM, split_thresholds
    from healthcare_data_pipeline_spark.queries.dedup import _SQL_H32

    ths = split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    case = " ".join(f"WHEN u < {th} THEN '{name}'" for name, th in ths[:-1])
    return f"""
    WITH t AS (
      SELECT doc_id, source, CAST(doc_id AS VARCHAR) || ':split' AS s,
             len(string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+')) AS ntok
      FROM documents
    ),
    h AS (SELECT source, ntok, ({_SQL_H32}) % {DENOM} AS u FROM t),
    sp AS (
      SELECT source, CASE {case} ELSE '{ths[-1][0]}' END AS split, ntok FROM h
    )
    SELECT source, split, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens
    FROM sp GROUP BY ROLLUP(source, split)
    """


@query(
    "t22_corpus_composition",
    oracle=_t22_oracle_sql(),
    tags=("text", "EXT", "report", "sampling"),
    doc="Training-run planning table (operators.mixture.corpus_composition): documents and "
    "whitespace tokens per (source, split) with ROLLUP subtotals — what the mixture + "
    "split will actually feed the trainer, computed from the SAME hash_split assignment "
    "training uses (t19), not an estimate. One narrow scan, map-side partials, one "
    "exchange.",
)
def t22_corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.mixture import corpus_composition

    return corpus_composition(table(spark, sf_dir, "documents"))


@query(
    "t21_adaptive_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents
    ),
    sc AS (
      SELECT doc_id, source,
             CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS s
      FROM t
    ),
    r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY s ASC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM sc
    )
    SELECT doc_id, source FROM r WHERE rn > (n * 20) // 100
    """,
    tags=("text", "EXT", "quality"),
    doc="Distribution-aware quality gate (operators.quality.adaptive_quality_filter, "
    "method='exact'): drop the worst 20% of each source by stopword-ratio score — "
    "percentile gates per corpus slice, the way production curation specifies quality "
    "budgets, vs t07's fixed thresholds (a cut that trims web spam decimates a "
    "transcript source). Exact mode ranks per group with an integer drop boundary "
    "(reproduces bit-identically anywhere); method='approx' is the 100 TB path — "
    "per-group approx_percentile thresholds broadcast as a narrow filter, rate-tested "
    "in pytest.",
)
def t21_adaptive_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.quality import adaptive_quality_filter

    d = table(spark, sf_dir, "documents")
    return adaptive_quality_filter(d, drop_pct=20).select("doc_id", "source")


def _t20_oracle_sql() -> str:
    from healthcare_data_pipeline_spark.operators.mixture import DENOM
    from healthcare_data_pipeline_spark.queries.dedup import _SQL_H32

    k, oversample = 10, 2
    return f"""
    WITH t AS (
      SELECT doc_id, source, CAST(doc_id AS VARCHAR) || ':sample' AS s FROM documents
    ),
    h AS (SELECT doc_id, source, ({_SQL_H32}) % {DENOM} AS u FROM t),
    n AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    gated AS (
      SELECT h.doc_id, h.source, h.u
      FROM h JOIN n USING (source)
      WHERE h.u < LEAST({DENOM}, ({oversample * k} * {DENOM}) // n.n + 1)
    ),
    ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY u, doc_id) AS rn
      FROM gated
    )
    SELECT doc_id, source FROM ranked WHERE rn <= {k}
    """


@query(
    "t20_group_sample",
    oracle=_t20_oracle_sql(),
    tags=("text", "EXT", "sampling"),
    doc="Deterministic fixed-size per-group sample (operators.mixture.group_sample): up to "
    "k rows per source by salted portable hash — the 'k docs from every source' "
    "debugging/eval primitive (t11 samples by RATE, this by COUNT). Scale shape is "
    "two-phase: per-group counts broadcast back as a ~2k/n hash gate (narrow filter, "
    "discards almost everything in a big group), then a window rank over the "
    "~2k-per-group survivors — no group's full membership ever sits in one window "
    "partition. All-integer gate arithmetic (div both sides), bit-identical on any "
    "engine.",
)
def t20_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.mixture import group_sample

    d = table(spark, sf_dir, "documents")
    return group_sample(d, k=10).select("doc_id", "source")


_SHUFKEY_SQL = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
    f" * CAST({16 ** (11 - i)} AS BIGINT)"
    for i in range(12)
)


@query(
    "t13_corpus_shuffle",
    oracle=f"""
    SELECT doc_id, CAST({_SHUFKEY_SQL} AS BIGINT) AS shuffle_key
    FROM documents
    """,
    tags=("text", "EXT", "shuffle", "front-door"),
    doc="Deterministic corpus shuffle (operators.shuffle.shuffle_corpus): pseudo-random "
    "global order via a portable md5-derived sort key + repartitionByRange + "
    "sortWithinPartitions — N globally-ordered splits in parallel, never a "
    "single-partition sort. The key is value-hash-verified here; the range-exchange "
    "plan shape is pinned by tests/test_chunking_redact.py.",
)
def t13_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.shuffle import shuffle_corpus

    d = table(spark, sf_dir, "documents")
    return shuffle_corpus(d).select("doc_id", "shuffle_key")


def _t14_oracle_sql() -> str:
    """t14 oracle: the full prep chain as one WHERE conjunction + chunk
    fan-out.  Quality gate, decontamination, and mixture gate are all
    row-level filters, so they compose as AND regardless of stage order."""
    from healthcare_data_pipeline_spark.operators.mixture import DENOM, weight_thresholds
    from healthcare_data_pipeline_spark.queries.dedup import _SQL_H32

    case = " ".join(
        f"WHEN '{s}' THEN {t}" for s, t in sorted(weight_thresholds(_MIX_WEIGHTS).items())
    )
    g3 = (
        "unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)), "
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
    )
    return f"""
    WITH tr AS (
      SELECT doc_id, source, CAST(doc_id AS VARCHAR) AS s,
             string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS ltoks,
             string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+') AS toks_raw,
             length(text) AS nc
      FROM documents WHERE source <> 'src0'
    ),
    ev AS (
      SELECT DISTINCT {g3} AS g
      FROM (SELECT string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
            FROM documents WHERE source = 'src0')
    ),
    bad AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, {g3} AS g
            FROM (SELECT doc_id, ltoks AS toks FROM tr)) t
      JOIN ev USING (g)
    ),
    kept AS (
      SELECT doc_id, toks_raw AS toks FROM tr
      WHERE len(ltoks) BETWEEN 20 AND 1000
        AND CAST(nc - len(ltoks) + 1 AS DOUBLE) / CAST(len(ltoks) AS DOUBLE) <= 12.0
        AND CAST(len(list_filter(ltoks, x -> x IN {_STOP_SQL})) AS DOUBLE)
            / CAST(len(ltoks) AS DOUBLE) >= 0.01
        AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = tr.doc_id)
        AND ({_SQL_H32}) % {DENOM} < CAST(CASE source {case} ELSE 0 END AS BIGINT)
    ),
    st AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= {_CHUNK} THEN 1
                  ELSE CAST(CEIL((len(toks) - {_CHUNK}) / {_STRIDE}.0) AS BIGINT) + 1
             END AS n_starts
      FROM kept
    )
    SELECT doc_id,
           CAST(ci.chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(toks[ci.chunk_idx * {_STRIDE} + 1 : ci.chunk_idx * {_STRIDE} + {_CHUNK}])
                AS BIGINT) AS n_chunk_tokens
    FROM st, UNNEST(generate_series(0, n_starts - 1)) AS ci(chunk_idx)
    """


@query(
    "t14_training_windows",
    oracle=_t14_oracle_sql(),
    tags=("text", "EXT", "front-door", "composition"),
    doc="The COMPLETE documents -> model-ready-windows path as one verified composition: "
    "C4-style quality gates (filter_corpus) -> benchmark decontamination vs the held-out "
    "source (decontaminate, n=3) -> per-source mixture sampling (mixture_sample) -> "
    "overlapping context windows (chunk_documents). All three gates are narrow row-level "
    "filters stacked on one scan (no shuffle until the optional pack/shuffle stages); "
    "the oracle mirrors every stage in one WHERE conjunction + fan-out.",
)
def t14_training_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.chunking import chunk_documents
    from healthcare_data_pipeline_spark.operators.decontaminate import decontaminate
    from healthcare_data_pipeline_spark.operators.mixture import mixture_sample
    from healthcare_data_pipeline_spark.operators.quality import filter_corpus

    d = table(spark, sf_dir, "documents")
    train = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    x = filter_corpus(train, min_stopword_ratio=0.01)
    x = decontaminate(x, ev, mode="ngram", n=3)
    x = mixture_sample(x, _MIX_WEIGHTS)
    return chunk_documents(x, chunk_size=_CHUNK, overlap=_CHUNK - _STRIDE).select(
        "doc_id", "chunk_idx", "n_chunk_tokens"
    )


@query(
    "t15_vocab_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+')) AS token
      FROM documents
    )
    SELECT token,
           COUNT(DISTINCT doc_id) AS doc_freq,
           COUNT(*) AS term_freq
    FROM tok GROUP BY token
    """,
    tags=("text", "EXT", "vocab"),
    doc="Corpus vocabulary statistics: per-token document frequency and total term "
    "frequency — the head/tail distribution diagnostic (and the df table an idf "
    "weighting or stop-list induction reads). One explode + one shuffle on the token "
    "key; partial aggregation makes the map side absorb each partition's token "
    "repetitions before the exchange.",
)
def t15_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens(F.col("text"))).alias("token"), "doc_id")
        .groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.count("*").alias("term_freq"),
        )
    )


@query(
    "t16_doc_keywords",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token NOT IN ('the', 'a', 'of', 'and', 'in', 'to')
      GROUP BY doc_id, token
    ),
    rk AS (
      SELECT doc_id, token, tf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, token) AS rn
      FROM tf
    )
    SELECT doc_id, token, tf, CAST(rn AS BIGINT) AS rn
    FROM rk WHERE rn <= 3
    """,
    tags=("text", "EXT", "keywords"),
    doc="Per-document keyword extraction: top-3 non-stopword tokens by in-document term "
    "frequency (deterministic ties by token). Integer ranking only — no float idf in the "
    "verified path, so the result is exactly reproducible cross-engine; an idf weighting "
    "composes on top via t15's doc_freq table. Two exchanges (agg on (doc_id, token), "
    "window on doc_id) — deliberately NOT collapsed to one via repartition(doc_id): that "
    "would shuffle raw token occurrences with no map-side combine and concentrate hot "
    "documents; partial aggregation before the first exchange is the robust shape.",
)
def t16_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
        .filter(~F.col("token").isin(*STOPWORDS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("token"))
    return (
        tf.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tf", "rn")
    )


@query(
    "t07_quality_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source, n_chars,
             string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks,
             length(text) AS nc
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars
    FROM t
    WHERE len(toks) BETWEEN 20 AND 1000
      AND CAST(nc - len(toks) + 1 AS DOUBLE) / CAST(len(toks) AS DOUBLE) <= 12.0
      AND CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
          / CAST(len(toks) AS DOUBLE) >= 0.01
    """,
    tags=("text", "EXT", "quality", "front-door"),
    doc="Corpus quality FILTER front door (operators.quality.filter_corpus): word-count "
    "band + average-word-length cap + stopword-ratio floor composed into one narrow "
    "pushdown-friendly predicate — the C4-style cleaning gate a training pipeline runs "
    "before any expensive stage. One scan, no shuffle, no UDF.",
)
def t07_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.quality import filter_corpus

    d = table(spark, sf_dir, "documents")
    return filter_corpus(d, min_stopword_ratio=0.01).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "t18_repetition_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents
    ),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
    top AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_token_count FROM tc GROUP BY doc_id),
    g AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_2grams,
             CAST(len(list_distinct(list_transform(
               generate_series(1, greatest(len(toks) - 1, 0)),
               i -> toks[i] || ' ' || toks[i+1]
             ))) AS BIGINT) AS n_distinct_2grams
      FROM t
    )
    SELECT g.doc_id, g.n_tokens, top.top_token_count, g.n_2grams, g.n_distinct_2grams
    FROM g JOIN top USING (doc_id)
    """,
    tags=("text", "EXT", "quality", "repetition"),
    doc="Gopher-style repetition signals per document: top-token frequency and duplicate "
    "word-2-gram counts — the loops/boilerplate detector that complements t02's "
    "length/punct/stopword quality score (repetitive docs degrade LMs even when every "
    "other gate passes). Integer hash surface (counts, not ratios); the 2-gram stats are "
    "per-row array ops (no shuffle), the top-token count one (doc_id, token)-keyed "
    "aggregation — linear, skew-safe (keys are doc-scoped), no UDF.",
)
def t18_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = d.selectExpr("doc_id", "split(lower(text), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+') AS toks")
    grams = t.selectExpr(
        "doc_id",
        "size(toks) AS n_tokens",
        "cast(greatest(size(toks) - 1, 0) as long) AS n_2grams",
        # sequence(1, 0) is DESCENDING in Spark (not empty) -> guard < 2 tokens
        "cast(size(array_distinct(CASE WHEN size(toks) >= 2 THEN transform("
        "sequence(1, size(toks) - 1), "
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))"
        ") ELSE array() END)) as long) AS n_distinct_2grams",
    )
    tok = t.select("doc_id", F.explode("toks").alias("tok"))
    top = (
        tok.groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_token_count"))
    )
    return grams.join(top, "doc_id")


@query(
    "t23_rare_bigram_gibberish",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg
      FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
      WHERE len(toks) >= 2
    ),
    c AS (
      SELECT bg, COUNT(*) AS df_bg FROM bg GROUP BY bg
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN df_bg <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           CAST(SUM(CASE WHEN df_bg <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS rare_ratio
    FROM bg JOIN c USING (bg)
    GROUP BY doc_id
    """,
    tags=("text", "EXT", "quality", "corpus-adaptive"),
    doc="Corpus-adaptive gibberish scoring (operators.quality.rare_bigram_scores): per-doc "
    "fraction of bigram occurrences whose corpus-wide frequency is <= 2. Distributional "
    "junk (shuffled words, OCR noise) passes every per-doc gate but draws its word "
    "transitions from the long tail — natural text reuses a heavy head. The "
    "integer-exact stand-in for n-gram LM perplexity (counts + small-int division, no "
    "transcendental logs, so it value-hashes in any engine). One bigram explode, one "
    "frequency groupBy (map-side combine), one bigram-clustered shuffle join back, one "
    "per-doc agg — all linear in token count; the frequency table is never collected "
    "or broadcast (its rare side IS most of it at any scale).",
)
def t23_rare_bigram_gibberish(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.quality import rare_bigram_scores

    return rare_bigram_scores(table(spark, sf_dir, "documents"), rare_df=2)


def _t24_oracle_sql() -> str:
    from healthcare_data_pipeline_spark.operators.mixture import DENOM
    from healthcare_data_pipeline_spark.queries.dedup import _SQL_H32

    return f"""
    WITH t AS (
      SELECT doc_id, source, CAST(doc_id AS VARCHAR) || ':budget' AS s,
             CAST(len(string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+')) AS BIGINT) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    ),
    h AS (
      SELECT doc_id, source, n_tokens, ({_SQL_H32}) % {DENOM} AS u FROM t
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id) AS cum_tokens
      FROM h
    )
    SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= 5000
    """


@query(
    "t24_token_budget_sample",
    oracle=_t24_oracle_sql(),
    tags=("text", "EXT", "sampling", "mixture"),
    doc="Token-budget mixture sampling (operators.mixture.token_budget_sample): keep each "
    "source's documents in salted-portable-hash order until 5000 tokens are spent. "
    "Mixture recipes are written in TOKENS, but doc-count sampling can't hit token "
    "targets when doc-length distributions differ across sources — this selects on the "
    "inclusive running token total directly (integer window arithmetic, bit-identical "
    "in any engine; cum_tokens emitted so the selection is auditable). Exact path is "
    "bounded-strata (per-group cumsum in one partition, SCALE.md); method='approx' is "
    "the 100 TB path — per-group totals once, then the same zero-shuffle hash-threshold "
    "filter as mixture_sample, budget-exact in expectation (rate-tested).",
)
def t24_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.mixture import token_budget_sample

    d = table(spark, sf_dir, "documents")
    return token_budget_sample(d, budget=5000).select(
        "doc_id", "source", "n_tokens", "cum_tokens"
    )


@query(
    "t25_dsir_scores",
    oracle="""
    WITH rawt AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+')) AS tok
      FROM documents
    ),
    tgtt AS (
      SELECT unnest(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+')) AS tok
      FROM documents WHERE source = 'src0'
    ),
    cr AS (SELECT tok, COUNT(*) AS c_r FROM rawt GROUP BY tok),
    ct AS (SELECT tok, COUNT(*) AS c_t FROM tgtt GROUP BY tok),
    tot AS (
      SELECT (SELECT COUNT(*) FROM rawt) AS n_raw,
             (SELECT COUNT(*) FROM tgtt) AS n_target
    ),
    per AS (
      SELECT r.doc_id,
             COUNT(*) AS n_tokens,
             CAST(SUM(CASE WHEN ct.c_t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             CAST(SUM(COALESCE(ct.c_t, 0)) AS BIGINT) AS target_mass,
             CAST(SUM(cr.c_r) AS BIGINT) AS raw_mass
      FROM rawt r JOIN cr USING (tok) LEFT JOIN ct USING (tok)
      GROUP BY r.doc_id
    )
    SELECT doc_id, n_tokens, n_oov, target_mass, raw_mass,
           (CAST(target_mass AS DOUBLE) / CAST(raw_mass AS DOUBLE))
             * (CAST(n_raw AS DOUBLE) / CAST(n_target AS DOUBLE)) AS importance
    FROM per, tot
    """,
    tags=("text", "EXT", "mixture", "selection"),
    doc="TARGETED data selection scores (operators.mixture.dsir_scores): every doc "
    "scored by its token distribution's affinity to a target slice (source='src0' "
    "here) relative to the raw corpus - the DSIR-style importance knob that selects "
    "FOR a domain rather than just filtering junk. importance = (doc's mean "
    "target-frequency / mean raw-frequency), exact BIGINT masses + three IEEE-exact "
    "double ops (the linearized surrogate of the paper's log-likelihood ratio - "
    "sums of libm logs are not bit-portable across engines; n_oov reports the "
    "zero-mass tokens a log form would have to smooth). The synthetic corpus "
    "shares one vocabulary, so the score is graded on determinism (the t03 "
    "precedent); on a real crawl the target slice's head tokens dominate.",
)
def t25_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.mixture import dsir_scores

    d = table(spark, sf_dir, "documents")
    return dsir_scores(d, d.filter(F.col("source") == "src0"))


@query(
    "t26_corpus_drift",
    oracle="""
    WITH reft AS (
      SELECT unnest(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+')) AS tok
      FROM documents WHERE source <> 'src19'
    ),
    newt AS (
      SELECT unnest(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+')) AS tok
      FROM documents WHERE source = 'src19'
    ),
    u AS (
      SELECT tok, 1 AS is_ref FROM reft
      UNION ALL
      SELECT tok, 0 AS is_ref FROM newt
    ),
    tk AS (
      SELECT tok,
             CAST(SUM(is_ref) AS BIGINT) AS c_ref,
             CAST(SUM(1 - is_ref) AS BIGINT) AS c_new
      FROM u GROUP BY tok
    ),
    tot AS (
      SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
             CAST(SUM(c_new) AS BIGINT) AS n_new
      FROM tk
    )
    SELECT
      CAST(SUM(c_ref) AS BIGINT) AS n_ref_tokens,
      CAST(SUM(c_new) AS BIGINT) AS n_new_tokens,
      CAST(SUM(CASE WHEN c_ref > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref_types,
      CAST(SUM(CASE WHEN c_new > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new_types,
      CAST(SUM(CASE WHEN c_ref = 0 AND c_new > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_new_only_types,
      CAST(SUM(CASE WHEN c_new = 0 AND c_ref > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_lost_types,
      CAST(SUM(ABS(c_ref * n_new - c_new * n_ref)) AS DOUBLE)
        / (2.0 * CAST(MAX(n_ref) AS DOUBLE) * CAST(MAX(n_new) AS DOUBLE)) AS tvd
    FROM tk, tot
    """,
    tags=("text", "EXT", "quality", "drift"),
    doc="Corpus DRIFT report (operators.quality.corpus_drift_report, summary mode): "
    "token-distribution total variation distance between a new batch (source='src19' "
    "here) and the reference corpus (everything else), plus exact vocabulary-churn "
    "counts (new-only / lost token types) - the text twin of s09's quantizer-drift "
    "diagnostic and the admission gate a continuously-ingesting pipeline runs before "
    "accepting a crawl snapshot. TVD is computed in the common-denominator integer "
    "form (decimal products, one final double division) so the statistic "
    "value-hashes identically in any engine - no libm-log KL portability problems.",
)
def t26_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.quality import corpus_drift_report

    d = table(spark, sf_dir, "documents")
    return corpus_drift_report(
        d.filter(F.col("source") != "src19"), d.filter(F.col("source") == "src19")
    )


def _gopher_oracle_sql() -> str:
    """t27 oracle: the Gopher rule battery recomputed in DuckDB list
    functions — every threshold in the same integer arithmetic as the Spark
    expressions, so all eight flags hash-compare exactly."""
    stop_sum = " + ".join(
        f"CASE WHEN list_contains(toks, '{w}') THEN 1 ELSE 0 END"
        for w in GOPHER_STOPWORDS
    )
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+'),
                         x -> len(x) > 0) AS toks,
             list_filter(string_split(text, chr(10)), l -> len(l) > 0) AS lines,
             len(text) - len(replace(text, '#', '')) AS hash_cnt,
             CAST((len(text) - len(replace(text, '...', ''))) // 3
               + len(text) - len(replace(text, '…', '')) AS BIGINT) AS ellipsis_cnt
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(COALESCE(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT)
               AS total_chars,
             hash_cnt, ellipsis_cnt,
             CAST(len(list_filter(lines, l -> substr(l, 1, 1) = '•'
               OR substr(l, 1, 2) = '- ' OR substr(l, 1, 2) = '* ')) AS BIGINT)
               AS bullet_lines,
             CAST(len(list_filter(lines, l -> substr(l, len(l) - 2, 3) = '...'
               OR substr(l, len(l), 1) = '…')) AS BIGINT) AS ellipsis_lines,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
               AS alpha_words,
             ({stop_sum}) AS n_stopwords
      FROM t
    )
    SELECT doc_id,
           n_words,
           n_lines,
           (n_words BETWEEN 50 AND 100000) AS flag_word_count,
           (3 * n_words <= total_chars AND total_chars <= 10 * n_words) AS flag_mean_word_len,
           (10 * hash_cnt <= n_words) AS flag_hash_ratio,
           (10 * ellipsis_cnt <= n_words) AS flag_ellipsis_ratio,
           (10 * bullet_lines <= 9 * n_lines) AS flag_bullet_lines,
           (10 * ellipsis_lines <= 3 * n_lines) AS flag_ellipsis_lines,
           (5 * alpha_words >= 4 * n_words) AS flag_alpha_words,
           (n_stopwords >= 2) AS flag_stopwords,
           ((n_words BETWEEN 50 AND 100000)
             AND (3 * n_words <= total_chars AND total_chars <= 10 * n_words)
             AND (10 * hash_cnt <= n_words)
             AND (10 * ellipsis_cnt <= n_words)
             AND (10 * bullet_lines <= 9 * n_lines)
             AND (10 * ellipsis_lines <= 3 * n_lines)
             AND (5 * alpha_words >= 4 * n_words)
             AND (n_stopwords >= 2)) AS gopher_pass
    FROM c
    """


@query(
    "t27_gopher_quality",
    oracle=_gopher_oracle_sql(),
    tags=("text", "EXT", "quality", "gopher"),
    doc="The published Gopher document-quality rule battery (Rae et al. 2021 A1.1) as "
    "per-document flags (operators.quality.gopher_quality_flags): word-count range, mean "
    "word length, #/ellipsis symbol ratios, bullet/ellipsis line ratios, alphabetic-word "
    "share, stopword presence — the industry-standard heuristic pre-filter before any "
    "model-based scoring. Every threshold is integer arithmetic (10*count <= n, never "
    "count/n <= 0.1), so all eight flags plus the AND hash-compare exactly cross-engine. "
    "One projection over the scan, no shuffle, no UDF; gopher_filter applies the same "
    "battery as a stateless streaming-safe predicate.",
)
def t27_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.quality import gopher_quality_flags

    return gopher_quality_flags(table(spark, sf_dir, "documents"))


_T28_ORACLE = """
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+'), x -> x != '') AS toks
      FROM documents
    ),
    tl AS (
      SELECT doc_id, toks,
             list_transform(toks, x -> CAST(length(x) AS BIGINT)) AS lens
      FROM t
    ),
    g AS (
      SELECT tl.doc_id, nn.n, s.i AS spos,
             array_to_string(toks[s.i:s.i+nn.n-1], ' ') AS g,
             CAST(list_sum(lens[s.i:s.i+nn.n-1]) AS BIGINT) AS glen
      FROM tl,
           (VALUES (2), (3), (4), (5), (6), (7), (8), (9), (10)) AS nn(n),
           UNNEST(generate_series(1, greatest(len(toks) - nn.n + 1, 0))) AS s(i)
    ),
    c AS (
      SELECT doc_id, n, g, COUNT(*) AS c, MAX(glen) AS glen
      FROM g GROUP BY 1, 2, 3
    ),
    top AS (
      SELECT doc_id, n, c * glen AS chars
      FROM (SELECT doc_id, n, c, glen,
                   ROW_NUMBER() OVER (PARTITION BY doc_id, n
                                      ORDER BY c DESC, glen DESC) AS rn
            FROM c WHERE n IN (2, 3, 4))
      WHERE rn = 1
    ),
    dpos AS (
      SELECT DISTINCT g.doc_id, g.n, g.spos + u.d AS p
      FROM g
      JOIN c ON g.doc_id = c.doc_id AND g.n = c.n AND g.g = c.g,
           UNNEST(generate_series(0, g.n - 1)) AS u(d)
      WHERE c.c >= 2 AND g.n IN (5, 6, 7, 8, 9, 10)
    ),
    pl AS (
      SELECT doc_id, s.i AS p, lens[s.i] AS l
      FROM tl, UNNEST(generate_series(1, len(lens))) AS s(i)
    ),
    dup AS (
      SELECT dpos.doc_id, dpos.n, CAST(SUM(pl.l) AS BIGINT) AS chars
      FROM dpos JOIN pl ON dpos.doc_id = pl.doc_id AND dpos.p = pl.p
      GROUP BY 1, 2
    ),
    pern AS (
      SELECT doc_id, n, chars FROM top UNION ALL SELECT doc_id, n, chars FROM dup
    ),
    wide AS (
      SELECT doc_id,
             MAX(CASE WHEN n = 2 THEN chars END) AS top2_chars,
             MAX(CASE WHEN n = 3 THEN chars END) AS top3_chars,
             MAX(CASE WHEN n = 4 THEN chars END) AS top4_chars,
             MAX(CASE WHEN n = 5 THEN chars END) AS dup5_chars,
             MAX(CASE WHEN n = 6 THEN chars END) AS dup6_chars,
             MAX(CASE WHEN n = 7 THEN chars END) AS dup7_chars,
             MAX(CASE WHEN n = 8 THEN chars END) AS dup8_chars,
             MAX(CASE WHEN n = 9 THEN chars END) AS dup9_chars,
             MAX(CASE WHEN n = 10 THEN chars END) AS dup10_chars
      FROM pern GROUP BY doc_id
    ),
    ln AS (
      SELECT t.doc_id, u.l
      FROM t, UNNEST(list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                                 x -> x != '')) AS u(l)
    ),
    lc AS (SELECT doc_id, l, COUNT(*) AS c FROM ln GROUP BY 1, 2),
    lstats AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_lines,
             CAST(SUM(length(l) * c) AS BIGINT) AS line_chars,
             CAST(SUM(CASE WHEN c >= 2 THEN c - 1 ELSE 0 END) AS BIGINT) AS dup_lines,
             CAST(SUM(CASE WHEN c >= 2 THEN length(l) * (c - 1) ELSE 0 END) AS BIGINT)
               AS dup_line_chars
      FROM lc GROUP BY doc_id
    ),
    base AS (
      SELECT tl.doc_id,
             COALESCE(CAST(list_sum(lens) AS BIGINT), 0) AS total_chars,
             COALESCE(w.top2_chars, 0) AS top2_chars,
             COALESCE(w.top3_chars, 0) AS top3_chars,
             COALESCE(w.top4_chars, 0) AS top4_chars,
             COALESCE(w.dup5_chars, 0) AS dup5_chars,
             COALESCE(w.dup6_chars, 0) AS dup6_chars,
             COALESCE(w.dup7_chars, 0) AS dup7_chars,
             COALESCE(w.dup8_chars, 0) AS dup8_chars,
             COALESCE(w.dup9_chars, 0) AS dup9_chars,
             COALESCE(w.dup10_chars, 0) AS dup10_chars,
             COALESCE(ls.n_lines, 0) AS n_lines,
             COALESCE(ls.dup_lines, 0) AS dup_lines,
             COALESCE(ls.dup_line_chars, 0) AS dup_line_chars,
             COALESCE(ls.line_chars, 0) AS line_chars
      FROM tl LEFT JOIN wide w USING (doc_id) LEFT JOIN lstats ls USING (doc_id)
    )
    SELECT *,
           (5 * top2_chars <= 1 * total_chars) AS flag_top2,
           (50 * top3_chars <= 9 * total_chars) AS flag_top3,
           (25 * top4_chars <= 4 * total_chars) AS flag_top4,
           (20 * dup5_chars <= 3 * total_chars) AS flag_dup5,
           (50 * dup6_chars <= 7 * total_chars) AS flag_dup6,
           (100 * dup7_chars <= 13 * total_chars) AS flag_dup7,
           (25 * dup8_chars <= 3 * total_chars) AS flag_dup8,
           (100 * dup9_chars <= 11 * total_chars) AS flag_dup9,
           (10 * dup10_chars <= 1 * total_chars) AS flag_dup10,
           (10 * dup_lines <= 3 * n_lines) AS flag_dup_lines,
           (5 * dup_line_chars <= 1 * line_chars) AS flag_dup_line_chars,
           ((5 * top2_chars <= 1 * total_chars) AND (50 * top3_chars <= 9 * total_chars)
            AND (25 * top4_chars <= 4 * total_chars) AND (20 * dup5_chars <= 3 * total_chars)
            AND (50 * dup6_chars <= 7 * total_chars) AND (100 * dup7_chars <= 13 * total_chars)
            AND (25 * dup8_chars <= 3 * total_chars) AND (100 * dup9_chars <= 11 * total_chars)
            AND (10 * dup10_chars <= 1 * total_chars) AND (10 * dup_lines <= 3 * n_lines)
            AND (5 * dup_line_chars <= 1 * line_chars)) AS rep_pass
    FROM base
"""


@query(
    "t28_repetition_flags",
    oracle=_T28_ORACLE,
    tags=("text", "EXT", "quality", "repetition", "gopher"),
    doc="The FULL Gopher REPETITION rule battery (operators.quality.repetition_flags; "
    "Rae et al. 2021 A1.2) — most-frequent-{2,3,4}-gram char fractions, "
    "duplicated-{5..10}-gram char COVERAGE (position coverage, overlaps counted once), "
    "duplicate-line count/char fractions, each capped at the published threshold in "
    "exact integer arithmetic.  Closes the measured gate gap: a within-doc loop passes "
    "every A1.1 gate (same words, lengths, stopwords) AND the corpus-adaptive "
    "rare-bigram gate (its transitions recur once the doc is in the corpus) — only "
    "repetition structure catches it.  Two independent single-pass pipelines: an "
    "arg-max groupBy for top-n, and a char-space interval-union sweep (count window + "
    "sorted running-max-end window) for coverage — linear, zero row blow-up, no joins, "
    "no UDF.",
)
def t28_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.quality import repetition_flags

    return repetition_flags(table(spark, sf_dir, "documents"))


def _t29_oracle_sql() -> str:
    """t29 oracle: the SAME two constructions in DuckDB — per-symbol
    ``\\x1f``-unit state string, one ``list_reduce`` fold over the merge
    rules applying ``replace`` per rule (split_part unpacks the
    ``from\\x1dto`` pattern pair).  DuckDB strings are standard-SQL (no
    backslash escapes), so the control characters are embedded verbatim and
    the regex replacement backref is a single-backslash ``\\1``."""
    from healthcare_data_pipeline_spark.operators.bpe import (
        BOUND,
        BPE_PRETOKEN_PAT,
        DEMO_MERGES,
        SEP,
        SPACE_MARK,
    )

    msep = "\x1d"
    melems = ", ".join(
        f"'{SEP}{l}{SEP}{SEP}{r}{SEP}{msep}{SEP}{l}{r}{SEP}'" for l, r in DEMO_MERGES
    )
    return f"""
    WITH p AS (
      SELECT doc_id,
             COALESCE(regexp_extract_all(
               regexp_replace(lower(text), '[{SEP}{BOUND}{SPACE_MARK}]', '', 'g'),
               '{BPE_PRETOKEN_PAT}'), []) AS pieces
      FROM documents
    ),
    s AS (
      SELECT doc_id, len(pieces) AS n_pieces,
             COALESCE(array_to_string(
               list_transform(pieces, x ->
                 regexp_replace(regexp_replace(x, '^ ', '{SPACE_MARK}'),
                                '(.)', '{SEP}\\1{SEP}', 'g')),
               '{BOUND}'), '') AS state0
      FROM p
    ),
    f AS (
      SELECT doc_id, n_pieces,
             list_reduce(list_prepend(state0, [{melems}]),
               (acc, m) -> replace(acc, split_part(m, chr(29), 1),
                                   split_part(m, chr(29), 2))) AS fin
      FROM s
    )
    SELECT doc_id,
           CAST(n_pieces AS BIGINT) AS n_pieces,
           CAST((length(fin) - length(replace(fin, chr(31), ''))) // 2 AS BIGINT)
             AS n_tokens_bpe
    FROM f
    """


@query(
    "t29_bpe_tokenize",
    oracle=_t29_oracle_sql(),
    tags=("text", "EXT", "tokens", "bpe"),
    doc="EXACT BPE token counts (operators.bpe.bpe_token_counts, doc mode) under a "
    "committed merges list in the public GPT-2 merges format — the tokenizer-TRUE "
    "upgrade of t06's pieces/chars-4 estimate, for the token budgets that denominate "
    "mixture sampling and shard manifests. Two constructions collapse the canonical "
    "merge loop into ONE fold expression: each symbol rides as a '\\x1f s \\x1f' unit "
    "so SQL replace IS the greedy-leftmost merge-all-occurrences step, and a "
    "training-ordered merges list applies exactly in sequential rank order (rule j's "
    "constituents predate it, and merging rule k only creates pairs of LATER rules). "
    "Scan-bound, zero shuffle, no UDF, no driver loop; cross-checked against a "
    "canonical python BPE in tests; vocab mode (fold per DISTINCT piece + join) is "
    "the large-merges-table path.",
)
def t29_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.bpe import bpe_token_counts

    return bpe_token_counts(table(spark, sf_dir, "documents", widen=True))


def _t30_oracle_sql() -> str:
    """t30 oracle: t29's fold, then the final state splits back into tokens
    (empty fragments and the piece-boundary char drop out) and aggregates
    into the corpus vocabulary table."""
    from healthcare_data_pipeline_spark.operators.bpe import (
        BOUND,
        BPE_PRETOKEN_PAT,
        DEMO_MERGES,
        SEP,
        SPACE_MARK,
    )

    msep = "\x1d"
    melems = ", ".join(
        f"'{SEP}{l}{SEP}{SEP}{r}{SEP}{msep}{SEP}{l}{r}{SEP}'" for l, r in DEMO_MERGES
    )
    return f"""
    WITH p AS (
      SELECT doc_id,
             COALESCE(regexp_extract_all(
               regexp_replace(lower(text), '[{SEP}{BOUND}{SPACE_MARK}]', '', 'g'),
               '{BPE_PRETOKEN_PAT}'), []) AS pieces
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             COALESCE(array_to_string(
               list_transform(pieces, x ->
                 regexp_replace(regexp_replace(x, '^ ', '{SPACE_MARK}'),
                                '(.)', '{SEP}\\1{SEP}', 'g')),
               '{BOUND}'), '') AS state0
      FROM p
    ),
    f AS (
      SELECT doc_id,
             list_reduce(list_prepend(state0, [{melems}]),
               (acc, m) -> replace(acc, split_part(m, chr(29), 1),
                                   split_part(m, chr(29), 2))) AS fin
      FROM s
    ),
    tok AS (
      SELECT doc_id, u.t AS token
      FROM f, UNNEST(list_filter(string_split(fin, chr(31)),
                                 x -> x != '' AND x != chr(30))) AS u(t)
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM tok GROUP BY token
    """


@query(
    "t30_bpe_vocab",
    oracle=_t30_oracle_sql(),
    tags=("text", "EXT", "tokens", "bpe", "vocab"),
    doc="Corpus token-frequency table under the exact BPE tokenizer "
    "(operators.bpe.bpe_vocab_report over bpe_tokens): one tokenize pass (the t29 "
    "fold), the final state split back into tokens, one map-side-combined groupBy — "
    "(token, n_occurrences, n_docs), the vocabulary diagnostic a tokenizer swap is "
    "judged by (coverage, tail mass, which raw strings stay unmerged).  Pairs with "
    "learn_bpe_merges (Sennrich et al. 2016): BPE TRAINING on the piece-frequency "
    "table — distributed piece counting, size-gated driver merge loop (the dedup "
    "components' budget class; raises past the gate, never silently samples) — so "
    "learn -> tokenize -> budget runs end to end with no external merges file.",
)
def t30_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.bpe import bpe_vocab_report

    # widen: the merge fold is the heaviest per-row map work in the text
    # family (r15 A/B after the posexplode_outer fix: 3.8 -> 1.7 s; the
    # earlier widen A/B lost only because the inner posexplode's inferred
    # filter re-ran the fold below the repartition — see bpe_tokens).
    return bpe_vocab_report(table(spark, sf_dir, "documents", widen=True))


def _t31_oracle_sql() -> str:
    """t31 oracle: the byte-level construction in DuckDB — UTF-8 bytes via
    hex(encode()) (uppercase pairs in both engines), the public GPT-2
    byte-to-unicode table as a MAP literal (standard-SQL escaping: quotes
    doubled, backslash literal), then the same fold/count as t29."""
    from healthcare_data_pipeline_spark.operators.bpe import (
        BOUND,
        BPE_PRETOKEN_PAT,
        DEMO_MERGES,
        SEP,
        gpt2_byte_unicode_map,
    )

    m = gpt2_byte_unicode_map()
    keys = ", ".join(f"'{k}'" for k in m)
    vals = ", ".join("'" + v.replace("'", "''") + "'" for v in m.values())
    msep = "\x1d"
    melems = ", ".join(
        f"'{SEP}{l}{SEP}{SEP}{r}{SEP}{msep}{SEP}{l}{r}{SEP}'" for l, r in DEMO_MERGES
    )
    return f"""
    WITH p AS (
      SELECT doc_id,
             COALESCE(regexp_extract_all(lower(text), '{BPE_PRETOKEN_PAT}'), [])
               AS pieces
      FROM documents
    ),
    s AS (
      SELECT doc_id, len(pieces) AS n_pieces,
             COALESCE(array_to_string(
               list_transform(pieces, x ->
                 array_to_string(
                   list_transform(regexp_extract_all(hex(encode(x)), '..'),
                     h -> chr(31) || (MAP([{keys}], [{vals}]))[h][1] || chr(31)),
                   '')),
               '{BOUND}'), '') AS state0
      FROM p
    ),
    f AS (
      SELECT doc_id, n_pieces,
             list_reduce(list_prepend(state0, [{melems}]),
               (acc, m) -> replace(acc, split_part(m, chr(29), 1),
                                   split_part(m, chr(29), 2))) AS fin
      FROM s
    )
    SELECT doc_id,
           CAST(n_pieces AS BIGINT) AS n_pieces,
           CAST((length(fin) - length(replace(fin, chr(31), ''))) // 2 AS BIGINT)
             AS n_tokens_bpe
    FROM f
    """


@query(
    "t31_bpe_byte_level",
    oracle=_t31_oracle_sql(),
    tags=("text", "EXT", "tokens", "bpe", "byte-level"),
    doc="GPT-2 BYTE-LEVEL exact BPE token counts (operators.bpe."
    "bpe_token_counts_byte_level): initial symbols are byte-unicode-mapped UTF-8 "
    "BYTES of each piece via the public 256-entry table (space lands on Ġ through "
    "the table itself — the actual GPT-2 construction the char-level t29 "
    "approximates), so a real merges.txt reproduces real GPT-2 segment boundaries "
    "for arbitrary unicode.  Same single-fold plan as t29 plus hex(encode()) and one "
    "map literal; the oracle rebuilds the byte plumbing independently in DuckDB.  "
    "Unicode fidelity is pinned in pytest against a canonical byte-level python BPE "
    "(multi-byte codepoints, control chars, backslash/quote bytes).",
)
def t31_bpe_byte_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.bpe import (
        bpe_token_counts_byte_level,
    )

    return bpe_token_counts_byte_level(table(spark, sf_dir, "documents", widen=True))


# --- t32/t33: CCNet-style LM perplexity (operators.lm) ------------------
# The reference slice the bigram LM trains on: a fixed trusted subset of
# sources (CCNet trains on Wikipedia; here three of the twenty synthetic
# sources play that role).
_LM_REF_SOURCES = ("src0", "src1", "src2")


def _lm_scores_oracle_cte(grouped: bool = False) -> str:
    """Shared oracle CTE chain: positioned token pairs, reference bigram /
    unigram / total counts, per-token stupid-backoff rational, eighth-bit
    integer log2 quantization (operators.lm module doc), per-doc sums.
    ``grouped=True`` keys every model table by ``lang`` — one LM per
    language, CCNet's actual construction (t38); the totals join becomes
    an INNER join so documents of reference-less languages drop, mirroring
    ``lm_score(group_col=)``."""
    srcs = ", ".join(f"'{s}'" for s in _LM_REF_SOURCES)
    thresholds = " + ".join(
        f"(den*256 >= m*{t})::INT" for t in (279, 304, 332, 362, 395, 431, 470)
    )
    k = "lang, " if grouped else ""
    pk = "p.lang, " if grouped else ""
    tot_join = (
        "JOIN tot t ON t.lang = p.lang" if grouped else "CROSS JOIN tot t"
    )
    band_k = "AND b.lang = p.lang " if grouped else ""
    uni_k = "AND u.lang = p.lang " if grouped else ""
    return f"""
    WITH dt AS (
      SELECT doc_id, source, lang,
             list_filter(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    ref_pairs AS (
      SELECT {k}CASE WHEN i = 1 THEN NULL ELSE toks[i-1] END AS w1, toks[i] AS w2
      FROM dt, UNNEST(generate_series(1, len(toks))) AS g(i)
      WHERE source IN ({srcs})
    ),
    big AS (
      SELECT {k}w1, w2, COUNT(*)::BIGINT AS c12
      FROM ref_pairs WHERE w1 IS NOT NULL GROUP BY {k}w1, w2
    ),
    bigc AS (
      SELECT {k}w1, w2, c12, (SUM(c12) OVER (PARTITION BY {k}w1))::BIGINT AS c1 FROM big
    ),
    uni AS (SELECT {k}w2, COUNT(*)::BIGINT AS cu FROM ref_pairs GROUP BY {k}w2),
    tot AS (
      SELECT {k}COUNT(*)::BIGINT AS n_ref, COUNT(DISTINCT w2)::BIGINT AS v_ref
      FROM ref_pairs{" GROUP BY lang" if grouped else ""}
    ),
    doc_pairs AS (
      SELECT doc_id, {k}CASE WHEN i = 1 THEN NULL ELSE toks[i-1] END AS w1,
             toks[i] AS w2
      FROM dt, UNNEST(generate_series(1, len(toks))) AS g(i)
    ),
    branch AS (
      SELECT p.doc_id, {pk}
             (p.w1 IS NOT NULL AND b.c12 IS NULL)::INT AS is_backoff,
             (u.cu IS NULL)::INT AS is_oov,
             CASE WHEN p.w1 IS NULL THEN COALESCE(u.cu, 0) + 1
                  WHEN b.c12 IS NULL THEN 2 * (COALESCE(u.cu, 0) + 1)
                  ELSE b.c12 END::BIGINT AS num,
             CASE WHEN p.w1 IS NULL THEN t.n_ref + t.v_ref
                  WHEN b.c12 IS NULL THEN 5 * (t.n_ref + t.v_ref)
                  ELSE b.c1 END::BIGINT AS den
      FROM doc_pairs p
      LEFT JOIN bigc b ON p.w1 = b.w1 AND p.w2 = b.w2 {band_k}
      LEFT JOIN uni u ON p.w2 = u.w2 {uni_k}
      {tot_join}
    ),
    k0t AS (
      SELECT doc_id, {k}is_backoff, is_oov, num, den,
             length(bin(den)) - length(bin(num)) AS k0
      FROM branch
    ),
    kt AS (
      SELECT doc_id, {k}is_backoff, is_oov, num, den,
             CASE WHEN (num << k0) > den THEN k0 - 1 ELSE k0 END AS k
      FROM k0t
    ),
    costed AS (
      SELECT doc_id, {k}is_backoff, is_oov,
             8 * k + {thresholds} AS cost
      FROM (SELECT doc_id, {k}is_backoff, is_oov, den, k, (num << k) AS m FROM kt)
    ),
    lm_scores AS (
      SELECT doc_id, {k}
             COUNT(*)::BIGINT AS n_tokens,
             SUM(is_backoff)::BIGINT AS n_backoff,
             SUM(is_oov)::BIGINT AS n_oov,
             SUM(cost)::BIGINT AS cost_eighth_bits,
             CAST(SUM(cost) AS DOUBLE) / (8.0 * COUNT(*)) AS bits_per_token
      FROM costed
      GROUP BY doc_id{", lang" if grouped else ""}
    )"""


def _lm_catalog_inputs(spark: SparkSession, sf_dir: str):
    d = table(spark, sf_dir, "documents")
    ref = d.filter(F.col("source").isin(*_LM_REF_SOURCES))
    return d, ref


@query(
    "t32_lm_perplexity",
    oracle=_lm_scores_oracle_cte() + "\n    SELECT * FROM lm_scores",
    tags=("text", "EXT", "quality", "lm", "ccnet"),
    doc="CCNet-style LM perplexity scoring (operators.lm.lm_score): a bigram "
    "stupid-backoff LM (Brants et al. 2007) trained on a fixed trusted source "
    "slice scores every document's quantized cross-entropy — the model-based "
    "quality signal of the published CCNet recipe (Wenzek et al. 2020), "
    "complementing the heuristic gates (t02/t21/t23/t27/t28).  Every "
    "probability is an exact BIGINT rational and -log2(p) is quantized to "
    "eighth-bits in pure integer arithmetic (binary-digit counts + a 7-step "
    "mantissa ladder), so document costs value-hash across engines; "
    "bits_per_token is the one correctly-rounded IEEE division.",
)
def t32_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.lm import lm_score

    d, ref = _lm_catalog_inputs(spark, sf_dir)
    return lm_score(d, ref)


@query(
    "t33_perplexity_buckets",
    oracle=_lm_scores_oracle_cte()
    + """
    , ranked AS (
      SELECT doc_id, bits_per_token,
             ROW_NUMBER() OVER (ORDER BY bits_per_token, doc_id) AS r,
             COUNT(*) OVER () AS n
      FROM lm_scores
    )
    SELECT doc_id, bits_per_token,
           CASE WHEN 3 * r <= n THEN 'head'
                WHEN 3 * r <= 2 * n THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM ranked
    """,
    tags=("text", "EXT", "quality", "lm", "ccnet"),
    doc="CCNet head/middle/tail perplexity bucketing (operators.lm."
    "perplexity_buckets): the paper's 33/66-percentile split of the crawl by LM "
    "score, exact mode (deterministic (bits_per_token, doc_id) rank, integer "
    "third-boundaries) for the oracle; production uses method='approx' — "
    "approx_percentile thresholds broadcast as a narrow filter, the corpus "
    "never sorts (the adaptive_quality_filter pattern).",
)
def t33_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.lm import (
        lm_score,
        perplexity_buckets,
    )

    d, ref = _lm_catalog_inputs(spark, sf_dir)
    return perplexity_buckets(lm_score(d, ref), method="exact").select(
        "doc_id", "bits_per_token", "ppl_bucket"
    )


# --- t34: C4 cleaning battery (operators.quality.c4_clean) ----------------
# The synthetic corpus is single-line and unpunctuated, so the catalog
# entry first applies a DETERMINISTIC lining transform (6-token lines; a
# terminal period on most lines, none when (doc_id+i)%4=0, a trailing
# ' javascript.' when (doc_id+i)%7=0) and plants the page-level drop
# reasons ('lorem ipsum' on doc_id%11=3, a curly-brace code line on
# doc_id%13=5) — mirrored exactly in the oracle, so every rule has live
# positive and negative cases at sf0.01.
_C4_BLOCKLIST = ("forbidden", "slow")

_C4_LINED_SPARK = """
    concat(
      array_join(transform(sequence(1, CAST(ceil(size(split(text, ' ')) / 6.0) AS INT)),
        i -> concat(array_join(slice(split(text, ' '), (i - 1) * 6 + 1, 6), ' '),
          CASE WHEN (doc_id + i) % 4 = 0 THEN ''
               WHEN (doc_id + i) % 7 = 0 THEN ' javascript.'
               ELSE '.' END)), '\\n'),
      CASE WHEN doc_id % 11 = 3 THEN '\\nthis page has lorem ipsum planted on it for the filter.' ELSE '' END,
      CASE WHEN doc_id % 13 = 5 THEN '\\nfunction f() { return 1; }.' ELSE '' END
    )"""


def _t34_oracle_sql() -> str:
    bl = ", ".join(f"'{w}'" for w in _C4_BLOCKLIST)
    return f"""
    WITH lined AS (
      SELECT doc_id,
             concat(
               array_to_string(list_transform(generate_series(1,
                   CAST(ceil(len(string_split(text, ' ')) / 6.0) AS INT)),
                 i -> concat(array_to_string(string_split(text, ' ')[(i - 1) * 6 + 1 : i * 6], ' '),
                   CASE WHEN (doc_id + i) % 4 = 0 THEN ''
                        WHEN (doc_id + i) % 7 = 0 THEN ' javascript.'
                        ELSE '.' END)), chr(10)),
               CASE WHEN doc_id % 11 = 3 THEN chr(10) || 'this page has lorem ipsum planted on it for the filter.' ELSE '' END,
               CASE WHEN doc_id % 13 = 5 THEN chr(10) || 'function f() {{ return 1; }}.' ELSE '' END
             ) AS text
      FROM documents
    ),
    parts AS (
      SELECT doc_id, text,
             list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS lines
      FROM lined
    ),
    kept AS (
      SELECT doc_id, text, lines,
             list_filter(lines, l ->
               substring(trim(l), length(trim(l)), 1) IN ('.', '!', '?', '"')
               AND len(list_filter(string_split_regex(trim(l), '[ \\t]+'), w -> w != '')) >= 5
               AND NOT contains(lower(l), 'javascript')) AS keep_l,
             len(list_filter(list_filter(string_split_regex(lower(text),
                   '[ \\t\\n\\r\\f\\x0B]+'), x -> x != ''), x -> x IN ({bl}))) > 0 AS blocked
      FROM parts
    )
    SELECT doc_id,
           COALESCE(array_to_string(keep_l, chr(10)), '') AS text,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(keep_l) AS BIGINT) AS n_kept_lines,
           contains(lower(text), 'lorem ipsum') AS flag_lorem_ipsum,
           contains(text, '{{') AS flag_curly_brace,
           blocked AS flag_blocklist,
           (NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{{')
            AND NOT blocked AND len(keep_l) >= 3) AS c4_keep
    FROM kept
    """


@query(
    "t34_c4_rules",
    oracle=_t34_oracle_sql(),
    tags=("text", "EXT", "quality", "c4"),
    doc="The published C4 cleaning battery (operators.quality.c4_clean; Raffel et al. "
    "2020 §2.2): line rules (terminal punctuation, >= 5 words, no 'javascript') "
    "rebuild each page from its surviving lines; page rules ('lorem ipsum', curly "
    "brace, blocklist words, >= 3 surviving sentences) gate the document — the "
    "line-grain editorial complement of the Gopher batteries.  One zero-shuffle "
    "scalar projection (no explode: lines live inside per-row arrays), exact "
    "string/integer predicates only, so the rebuilt text and every flag "
    "hash-verify.",
)
def t34_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.quality import c4_clean

    d = table(spark, sf_dir, "documents", widen=True).selectExpr(
        "doc_id", _C4_LINED_SPARK + " AS text"
    )
    return c4_clean(d, blocklist=_C4_BLOCKLIST)


@query(
    "t35_temperature_mix",
    oracle="""
    WITH per AS (
      SELECT source,
             COUNT(*)::BIGINT AS n_docs,
             SUM(len(list_filter(string_split_regex(lower(text),
                 '[ \\t\\n\\r\\f\\x0B]+'), x -> x != '')))::BIGINT AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(25,8))) AS DOUBLE) AS t FROM per)
    SELECT source, n_docs, n_tokens,
           sqrt(CAST(n_tokens AS DOUBLE)) / tot.t AS weight,
           CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) / tot.t * 100000.0) AS BIGINT)
             AS budget_tokens
    FROM per, tot
    """,
    tags=("text", "EXT", "mixture", "temperature"),
    doc="Temperature-scaled mixture weights (operators.mixture.temperature_weights; "
    "Conneau & Lample 2019 §3.1 / mT5 §3.2: p_i ∝ n_i^alpha): per-source token "
    "masses raised to alpha=0.5 (sqrt — IEEE-correctly-rounded, so the weights "
    "hash cross-engine), normalized, and turned into the per-group token budgets "
    "token_budget_sample(budgets=) consumes — upsample the small trusted sources, "
    "damp the dominant crawl.  One tiny groupBy + a 1x1 broadcast combine.",
)
def t35_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.mixture import temperature_weights

    return temperature_weights(
        table(spark, sf_dir, "documents"), alpha=0.5, total_budget=100_000
    )


@query(
    "t36_perplexity_buckets_by_lang",
    oracle=_lm_scores_oracle_cte()
    + """
    , withlang AS (
      SELECT s.doc_id, d.lang, s.bits_per_token
      FROM lm_scores s JOIN documents d USING (doc_id)
    ),
    ranked AS (
      SELECT doc_id, lang, bits_per_token,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY bits_per_token, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM withlang
    )
    SELECT doc_id, lang, bits_per_token,
           CASE WHEN 3 * r <= n THEN 'head'
                WHEN 3 * r <= 2 * n THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM ranked
    """,
    tags=("text", "EXT", "quality", "lm", "ccnet"),
    doc="CCNet bucketing in its PAPER-FAITHFUL per-language form (operators.lm."
    "perplexity_buckets(group_col='lang')): tertiles computed within each language, "
    "so no language's perplexity scale drowns another's — and the exact path's rank "
    "window partitions by language, each group sorting in its own partition instead "
    "of the ungrouped single-sort (t33's verification shape).",
)
def t36_perplexity_buckets_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.lm import (
        lm_score,
        perplexity_buckets,
    )

    d, ref = _lm_catalog_inputs(spark, sf_dir)
    scores = lm_score(d, ref).join(d.select("doc_id", "lang"), "doc_id")
    return perplexity_buckets(scores, method="exact", group_col="lang").select(
        "doc_id", "lang", "bits_per_token", "ppl_bucket"
    )


_T37_BUDGET = 20_000


def _t37_oracle_sql() -> str:
    from healthcare_data_pipeline_spark.operators.mixture import DENOM
    from healthcare_data_pipeline_spark.queries.dedup import _SQL_H32

    ws = r"[ \t\n\r\f\x0B]+"
    ntok = f"len(list_filter(string_split_regex(lower(text), '{ws}'), x -> x != ''))"
    return f"""
    WITH per AS (
      SELECT source,
             SUM({ntok})::BIGINT AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(25,8))) AS DOUBLE) AS t FROM per),
    b AS (
      SELECT source,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) / tot.t * {_T37_BUDGET}.0) AS BIGINT)
               AS budget
      FROM per, tot
    ),
    t AS (
      SELECT doc_id, source, CAST(doc_id AS VARCHAR) || ':budget' AS s,
             CAST({ntok} AS BIGINT) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    ),
    h AS (
      SELECT doc_id, source, n_tokens, ({_SQL_H32}) % {DENOM} AS u FROM t
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id) AS cum_tokens
      FROM h
    )
    SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c JOIN b USING (source)
    WHERE cum_tokens <= b.budget
    """


@query(
    "t37_temperature_budget_sample",
    oracle=_t37_oracle_sql(),
    tags=("text", "EXT", "mixture", "temperature", "sampling"),
    doc="The FULL published temperature-mixture pipeline end to end (operators.mixture."
    "temperature_budget_sample = temperature_weights -> per-source budgets -> "
    "token_budget_sample): per-source token masses to the alpha=0.5 power over a "
    "DECIMAL-exact normalizer, floor(weight*budget) per-group token budgets, then each "
    "source kept in salted-portable-hash order until ITS budget is spent — computed and "
    "SPENT in the same normalized token currency (lowercased, empty split fragments "
    "dropped; the r11-advice currency fix, hash-verified here).  Driver-side state is "
    "one recipe-sized budget table (max_groups-gated collect); the corpus pays one "
    "groupBy + the per-source cumsum window.",
)
def t37_temperature_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.mixture import temperature_budget_sample

    return temperature_budget_sample(
        table(spark, sf_dir, "documents"), total_budget=_T37_BUDGET, alpha=0.5
    ).select("doc_id", "source", "n_tokens", "cum_tokens")


@query(
    "t38_lm_perplexity_by_lang",
    oracle=_lm_scores_oracle_cte(grouped=True) + "\n    SELECT * FROM lm_scores",
    tags=("text", "EXT", "quality", "lm", "ccnet"),
    doc="CCNet LM scoring in its PAPER-FAITHFUL per-language form (operators.lm."
    "lm_score(group_col='lang'); Wenzek 2020 trains one Wikipedia LM PER LANGUAGE): "
    "bigram/unigram/total tables are all keyed by lang, so an English page is never "
    "scored against French statistics — under one shared model a whole language reads "
    "as high-perplexity noise and its head/tail split collapses.  Same scale shape as "
    "t32 with one extra key column; the 1-row totals broadcast becomes n_langs rows; "
    "documents of reference-less languages DROP (no model — the paper routes by "
    "language id first).  Composes with perplexity_buckets(group_col=) / "
    "prep_corpus(lm_group_col=) for the full per-language pipeline.",
)
def t38_lm_perplexity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.lm import lm_score

    d, ref = _lm_catalog_inputs(spark, sf_dir)
    return lm_score(d, ref, group_col="lang")


@query(
    "t39_lm_drop_audit",
    oracle="""
    WITH ref_langs AS (
      SELECT DISTINCT lang FROM documents
      WHERE source IN ('src0', 'src1', 'src2') AND lang NOT IN ('es', 'zh')
    )
    SELECT d.lang, COUNT(*) AS n_docs_dropped
    FROM documents d
    LEFT JOIN ref_langs r ON r.lang = d.lang
    WHERE r.lang IS NULL
    GROUP BY d.lang
    """,
    tags=("text", "EXT", "quality", "lm", "ccnet", "audit"),
    doc="Per-language drop audit for the per-language LM stage (operators.lm."
    "lm_drop_audit): lm_score(group_col='lang') inner-joins the per-group totals, so "
    "documents whose language has NO reference rows silently drop — paper-faithful "
    "(CCNet routes by language id first), but on a production corpus a typo'd or "
    "incomplete reference slice would shrink the corpus with zero signal.  This "
    "relation makes the drop observable BEFORE the scoring pass (the "
    "minhash_pairs(max_bucket=) never-silent accounting standard): one row per "
    "reference-less language with its doc count, empty when the reference covers every "
    "language.  Cost: a vocabulary-sized distinct broadcast into an anti join + one "
    "map-side-combinable groupBy — nothing corpus-sized moves.  The catalog form "
    "audits a reference deliberately missing two languages; lm_score/prep_corpus "
    "surface the same counts via dropped_group_log / lm_dropped_group_log.",
)
def t39_lm_drop_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.lm import lm_drop_audit

    d, ref = _lm_catalog_inputs(spark, sf_dir)
    return lm_drop_audit(d, ref.filter(~F.col("lang").isin("es", "zh")), "lang")

"""[EXT] Exact BPE tokenization as a relational plan — tokenizer-TRUE token
counts for the budgets that denominate everything downstream (t22/t24
mixture sampling, corpus_composition, shard manifests), replacing the t06
pieces/chars-4 ESTIMATE where exactness matters.

No reference counterpart (the reference has no tokenizer); charter-mandated
LLM-data-pipeline surface.

The two ideas that make exact BPE a *plan* instead of a UDF:

1. **Greedy-leftmost pair merge IS string ``replace``.**  Each symbol
   rides as its own ``\\x1f s \\x1f`` unit and a word is the units
   concatenated; merging pair (x, y) into xy is ``replace(state,
   '\\x1fx\\x1f\\x1fy\\x1f', '\\x1fxy\\x1f')``.  Units share no
   characters, so adjacent occurrences in SYMBOL space are adjacent —
   never overlapping — in string space, and SQL replace's left-to-right
   non-overlapping substitution is exactly BPE's merge-all-occurrences
   greedy-leftmost step (``a a a a`` + (a,a) -> ``aa aa``; the
   single-delimiter encoding, where neighbors share the middle delimiter,
   provably skips every other occurrence in runs — caught by the
   cross-check against a canonical python BPE in tests).  Identical replace
   semantics in Spark and DuckDB.

2. **A VALID merges list applies in sequential rank order.**  Canonical BPE
   repeatedly merges the lowest-ranked pair PRESENT; that loop is
   data-dependent and unbounded.  But in any merges list produced by BPE
   training, rule j's two constituent symbols are single characters or
   outputs of rules < j, and merging rule k's pair (C, D) -> CD can only
   create new adjacencies INVOLVING CD (…A C D B… -> …A CD B…: the new
   pairs are (A, CD) and (CD, B)) — i.e. only pairs of rules whose rank is
   > k by the validity property.  So a lower-ranked pair never (re)appears
   after a higher-ranked merge, and one sequential pass over the rules in
   rank order — ``aggregate(merges, state, (s, m) -> replace(s, m.f, m.t))``
   — produces exactly the canonical result.  That collapses the whole
   tokenizer into ONE fold expression: no driver loop, no UDF, no shuffle.

Pre-tokenization reuses t06's GPT-2-style, RE2-safe alternation (letter
runs / digit runs / punctuation runs over lowercased text, optional leading
space), with the leading space mapped to the public GPT-2 marker ``Ġ`` so
merges files in the standard ``merges.txt`` format ("#version" header,
one "left right" pair per line, rank = line order) load as-is.  The
char-level default approximates GPT-2 for multi-byte codepoints (initial
symbols are characters); ``bpe_token_counts_byte_level`` (t31) closes
that: initial symbols are byte-unicode-mapped UTF-8 BYTES via the public
256-entry table, so a real merges.txt reproduces real GPT-2 segment
boundaries for arbitrary unicode.

Scale shapes:

- ``mode='doc'``: the fold runs once per document over the whole-document
  block string (piece blocks are joined with the ``\\x1e`` boundary char,
  which appears in no merge pattern, so merges never span piece
  boundaries).  One narrow projection — scan-bound, zero shuffle,
  streaming-safe; per-doc cost O(R * doc_chars).
- ``mode='vocab'``: the 100 TB path for large merges tables — tokenize each
  DISTINCT piece once (BPE(piece) depends only on the piece), then join the
  per-piece token count back and sum per document.  The R-fold work runs on
  the piece vocabulary (sub-linear in corpus size); the corpus side is one
  groupBy + one join on the piece key.  Identical results by construction
  (property-tested).

Delimiters ``\\x1f``/``Ġ`` are stripped from input text up front (they are
encoding machinery, not data — the one input constraint, stated here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
BOUND = "\x1e"  # piece boundary — appears in no merge pattern, blocks cross-piece merges
SPACE_MARK = "Ġ"

# t06's pre-tokenizer (queries/text.py): GPT-2-style, RE2-safe alternation.
BPE_PRETOKEN_PAT = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 \t\n\r\f\x0B]+"

# A small committed merges list in learned order (every rule's constituents
# are single characters or outputs of EARLIER rules — the validity property
# the sequential fold relies on), over common lowercase-English sequences.
# Used by the t29 catalog entry and tests; production swaps in a real
# merges.txt via load_merges().
DEMO_MERGES: list[tuple[str, str]] = [
    (SPACE_MARK, "t"),
    (SPACE_MARK, "a"),
    ("h", "e"),
    ("i", "n"),
    ("r", "e"),
    ("o", "n"),
    (SPACE_MARK + "t", "he"),
    ("e", "r"),
    (SPACE_MARK, "s"),
    ("a", "t"),
    ("e", "n"),
    (SPACE_MARK, "o"),
    ("a", "n"),
    ("o", "r"),
    ("in", "g"),
    ("an", "d"),
    ("t", "i"),
    ("ti", "on"),
    ("e", "d"),
    ("i", "s"),
    (SPACE_MARK, "w"),
    ("o", "u"),
    ("er", "s"),
    ("l", "l"),
]


def parse_merges_text(text: str) -> list[tuple[str, str]]:
    """Parse the public GPT-2 ``merges.txt`` format: an optional
    ``#version`` header line, then one ``left right`` pair per line, rank =
    line order.  Blank lines are skipped; malformed lines raise."""
    pairs: list[tuple[str, str]] = []
    for i, line in enumerate(text.splitlines()):
        if i == 0 and line.startswith("#"):
            continue
        if not line.strip():
            continue
        parts = line.split(" ")
        if len(parts) != 2 or not parts[0] or not parts[1]:
            raise ValueError(f"malformed merges line {i}: {line!r}")
        pairs.append((parts[0], parts[1]))
    return pairs


def load_merges(path: str) -> list[tuple[str, str]]:
    """Read a ``merges.txt`` file (driver-side: a merges table is tokenizer
    CONFIG — a few hundred KB even at GPT-2's 50k rules — not data)."""
    with open(path, encoding="utf-8") as fh:
        return parse_merges_text(fh.read())


def validate_merges(pairs: list[tuple[str, str]]) -> None:
    """Enforce the validity property the sequential fold relies on: every
    rule's constituents are single characters or outputs of earlier rules.
    Any merges list produced by BPE training satisfies this by construction;
    a hand-edited one that doesn't would silently diverge from canonical
    BPE, so it is refused instead."""
    built: set[str] = set()
    for i, (left, right) in enumerate(pairs):
        for side in (left, right):
            if len(side) > 1 and side not in built:
                raise ValueError(
                    f"merges rule {i} ({left!r}, {right!r}) uses multi-char "
                    f"symbol {side!r} not produced by any earlier rule — not "
                    "a valid BPE training order; the sequential fold would "
                    "diverge from canonical BPE"
                )
        built.add(left + right)


def _merges_row(spark, pairs: list[tuple[str, str]]) -> DataFrame:
    """ONE-row DataFrame carrying the rank-ordered (f, t) replace patterns —
    rides as the repo's standard broadcast 1x1 scalar combine."""
    from healthcare_data_pipeline_spark.localrel import local_relation

    # LocalRelation, not createDataFrame: the Python-RDD-backed form cost a
    # 32-task stage (one Python worker round trip per task) under EVERY
    # consumer's broadcast build — ~0.8s/run on the bench box (r15).
    mdf = local_relation(
        spark,
        [(i, l, r) for i, (l, r) in enumerate(pairs)],
        "rank long, left string, right string",
    )
    return mdf.select(
        F.struct(
            "rank",
            F.concat(
                F.lit(SEP), "left", F.lit(SEP + SEP), "right", F.lit(SEP)
            ).alias("f"),
            F.concat(F.lit(SEP), "left", "right", F.lit(SEP)).alias("t"),
        ).alias("m")
    ).agg(
        F.transform(
            F.array_sort(F.collect_list("m")), lambda x: F.struct(x["f"].alias("f"), x["t"].alias("t"))
        ).alias("__merges")
    )


# NOTE: Spark SQL string literals do NOT interpret \xHH escapes, so the
# actual U+001F/U+001E control characters are embedded in these fragments
# via f-strings (regex contexts would accept either form; plain string
# literals only the real character).
_PIECES_SQL = (
    f"regexp_extract_all(regexp_replace(lower({{text}}), '[{SEP}{BOUND}{SPACE_MARK}]', ''), "
    f"'{BPE_PRETOKEN_PAT}', 0)"
)
# per-piece block: map the leading space to Ġ, then one '|c|' unit per char
_BLOCK_SQL = (
    f"transform({{pieces}}, p -> "
    f"regexp_replace(regexp_replace(p, '^ ', '{SPACE_MARK}'), '(.)', '{SEP}$1{SEP}'))"
)
_FOLD_SQL = "aggregate(__merges, {state}, (s, m) -> replace(s, m.f, m.t))"


def _n_tokens_sql(state_final: str) -> str:
    # every symbol is a '|s|' unit carrying exactly 2 separators, and each
    # merge turns '|x||y|' (4 separators) into '|xy|' (2) while removing one
    # symbol — so n_separators == 2 * n_symbols before and after the fold
    return (
        f"CAST((length({state_final}) - length(replace({state_final}, '{SEP}', ''))) "
        "DIV 2 AS BIGINT)"
    )


def bpe_token_counts(
    docs: DataFrame,
    pairs: list[tuple[str, str]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "doc",
) -> DataFrame:
    """(id_col, n_pieces, n_tokens_bpe) — EXACT BPE token counts under the
    given merges list (default ``DEMO_MERGES``).  See the module docstring
    for the two constructions; ``mode='doc'`` is the scan-bound zero-shuffle
    form (catalog t29), ``mode='vocab'`` the distinct-piece form for large
    merges tables.  NULL text counts zero pieces and zero tokens (never
    dropped)."""
    if mode not in ("doc", "vocab"):
        raise ValueError(f"mode must be 'doc' or 'vocab', got {mode!r}")
    pairs = DEMO_MERGES if pairs is None else pairs
    validate_merges(pairs)
    merges = _merges_row(docs.sparkSession, pairs)
    pieces = _PIECES_SQL.format(text=text_col)
    base = docs.selectExpr(
        f"{id_col}", f"coalesce({pieces}, CAST(array() AS ARRAY<STRING>)) AS __pieces"
    ).crossJoin(F.broadcast(merges))
    if mode == "doc":
        # piece blocks joined with the \x1e boundary char, which appears in
        # no merge pattern — merges can never span piece boundaries
        state0 = f"array_join({_BLOCK_SQL.format(pieces='__pieces')}, '{BOUND}')"
        final = _FOLD_SQL.format(state=state0)
        return base.selectExpr(
            id_col,
            "CAST(size(__pieces) AS BIGINT) AS n_pieces",
            f"({_n_tokens_sql(final)}) AS n_tokens_bpe",
        )
    # vocab mode: fold once per DISTINCT piece, join counts back
    pp = base.select(id_col, F.explode("__pieces").alias("__p")).groupBy(
        id_col, "__p"
    ).agg(F.count("*").alias("__c"))
    vocab = (
        pp.select("__p")
        .distinct()
        .crossJoin(F.broadcast(merges))
        .selectExpr(
            "__p",
            f"({_n_tokens_sql(_FOLD_SQL.format(state=_piece_state0('__p')))}) AS __nt",
        )
    )
    agg = (
        pp.join(vocab.select("__p", "__nt"), "__p")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_pieces"),
            F.sum(F.col("__c") * F.col("__nt")).cast("long").alias("n_tokens_bpe"),
        )
    )
    # left join so empty/NULL-text docs keep (0, 0) like doc mode
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_pieces", F.lit(0).cast("long")).alias("n_pieces"),
            F.coalesce("n_tokens_bpe", F.lit(0).cast("long")).alias("n_tokens_bpe"),
        )
    )


def _piece_state0(piece_col: str) -> str:
    return (
        f"regexp_replace(regexp_replace({piece_col}, '^ ', "
        f"'{SPACE_MARK}'), '(.)', '{SEP}$1{SEP}')"
    )


def bpe_token_count_col(
    pairs: list[tuple[str, str]], text_col: str = "text"
) -> Column:
    """The doc-mode token count as a plain COLUMN (merges inlined as a
    literal array) — for call sites that need a per-row expression without a
    crossJoin, e.g. ``token_budget_sample(tokenizer=)``.  Plan size grows
    with the merges list; prefer ``bpe_token_counts`` past a few thousand
    rules."""
    validate_merges(pairs)
    merges = F.array(
        *[
            F.struct(
                F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}").alias("f"),
                F.lit(f"{SEP}{l}{r}{SEP}").alias("t"),
            )
            for l, r in pairs
        ]
    )
    blocks = F.expr(
        _BLOCK_SQL.format(
            pieces=f"coalesce({_PIECES_SQL.format(text=text_col)}, CAST(array() AS ARRAY<STRING>))"
        )
    )
    state0 = F.array_join(blocks, BOUND)
    final = F.aggregate(merges, state0, lambda s, m: F.replace(s, m["f"], m["t"]))
    seps = F.length(final) - F.length(F.replace(final, F.lit(SEP), F.lit("")))
    return (seps / 2).cast("long").alias("n_tokens_bpe")


def bpe_tokens(
    docs: DataFrame,
    pairs: list[tuple[str, str]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, pos, token) — the exact BPE SEGMENTATION, one row per token
    in document order (pos is 1-based).  Same doc-mode fold as
    ``bpe_token_counts``; the final state splits back into tokens on the
    unit delimiter (empty fragments and the piece-boundary char drop out).
    The relation downstream vocabulary/frequency reports (t30) and OOV
    analyses consume."""
    pairs = DEMO_MERGES if pairs is None else pairs
    validate_merges(pairs)
    merges = _merges_row(docs.sparkSession, pairs)
    pieces = _PIECES_SQL.format(text=text_col)
    base = docs.selectExpr(
        f"{id_col}", f"coalesce({pieces}, CAST(array() AS ARRAY<STRING>)) AS __pieces"
    ).crossJoin(F.broadcast(merges))
    state0 = f"array_join({_BLOCK_SQL.format(pieces='__pieces')}, '{BOUND}')"
    final = _FOLD_SQL.format(state=state0)
    toks = (
        f"filter(split({final}, '{SEP}'), x -> x != '' AND x != '{BOUND}')"
    )
    # posexplode_OUTER + null filter, not inner posexplode (r15): the inner
    # generate's inferred ``size(__bt) > 0`` filter substitutes the ENTIRE
    # merge fold and pushes it below any upstream repartition — running the
    # tokenizer twice, once of those on the row-group-starved single scan
    # task (this is why t30's widen A/B lost before this fix).  Outer
    # generates infer nothing; token-less docs (empty/NULL text) emit one
    # NULL row each, dropped by the cheap generated-column filter — exactly
    # the docs the inner posexplode dropped.
    return (
        base.selectExpr(id_col, f"{toks} AS __bt")
        .select(id_col, F.posexplode_outer("__bt").alias("__p0", "token"))
        .filter(F.col("token").isNotNull())
        .select(id_col, (F.col("__p0") + 1).alias("pos"), "token")
    )


def bpe_vocab_report(
    docs: DataFrame,
    pairs: list[tuple[str, str]] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(token, n_occurrences, n_docs) — the corpus token-frequency table
    under the given tokenizer, descending by count (token tie-break).  The
    standard vocabulary diagnostic a tokenizer swap is judged by: coverage,
    tail mass, and which raw strings stay unmerged.  One tokenize pass +
    one map-side-combined groupBy."""
    t = bpe_tokens(docs, pairs=pairs, text_col=text_col)
    return (
        t.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    max_vocab_rows: int = 1_000_000,
) -> list[tuple[str, str]]:
    """TRAIN a BPE merges list on the corpus (Sennrich et al. 2016): greedily
    merge the most frequent adjacent symbol pair ``n_merges`` times.  Returns
    pairs in learned order — a valid training order by construction, so the
    sequential-fold tokenizer consumes it directly (learn -> tokenize ->
    budget, tokenizer-true end to end with no external merges file).

    Scale shape: training statistics live on the PIECE-FREQUENCY table, not
    the corpus — the standard trainer construction (HF tokenizers does the
    same): one distributed pass builds (piece, count) with a groupBy
    (map-side combined; the vocabulary is sub-linear in corpus size), and
    the merge loop then runs DRIVER-SIDE over that bounded table — the same
    size-gate budget class as the dedup components' union-find (one Arrow
    collect of at most ``max_vocab_rows``; raises, never silently samples,
    when the vocabulary exceeds it — cap pieces upstream or raise the gate
    deliberately).  A 100 TB corpus has a few million distinct pieces; the
    loop is pure python over that table, exact and deterministic
    (ties break lexicographically on the pair).

    The loop maintains pair counts INCREMENTALLY (the standard trainer
    optimization, HF tokenizers' trainer does the same): each merge touches
    only the pieces that actually CONTAIN the merged pair (tracked in a
    pair -> pieces index), so per-merge cost is O(affected pieces), not
    O(|vocab|) — the difference between "32k merges over ~1M pieces is
    hours of driver time" and "seconds-to-minutes".  Bit-identical to the
    full recompute (property-tested against the naive mirror): the counts
    after every step are the same numbers, so the greedy argmax sequence is
    the same sequence.
    """
    pieces_sql = _PIECES_SQL.format(text=text_col)
    vocab_df = (
        docs.selectExpr(f"explode(coalesce({pieces_sql}, CAST(array() AS ARRAY<STRING>))) AS __p")
        .selectExpr(f"{_gpiece_sql('__p')} AS __p")
        .groupBy("__p")
        .agg(F.count("*").alias("__c"))
        .limit(max_vocab_rows + 1)
    )
    rows = vocab_df.toPandas()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"piece vocabulary exceeds max_vocab_rows={max_vocab_rows}; "
            "the driver-side trainer gate refuses rather than silently "
            "sampling — pre-filter pieces or raise the gate deliberately"
        )
    vocab: dict[tuple[str, ...], int] = {
        tuple(p): int(c) for p, c in zip(rows["__p"], rows["__c"])
    }
    return _greedy_merges(vocab, n_merges)


def _apply_merge(syms: tuple[str, ...], x: str, y: str) -> tuple[str, ...]:
    """Left-to-right, non-overlapping application of one merge — the exact
    per-piece rewrite both the trainer and the fold tokenizer use."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == x and syms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _greedy_merges(
    vocab: dict[tuple[str, ...], int], n_merges: int
) -> list[tuple[str, str]]:
    """The greedy merge loop over a (piece -> count) table with INCREMENTAL
    pair-count maintenance: ``counts`` holds every adjacent pair's total
    occurrence count; ``where`` indexes which pieces currently contain each
    pair.  A merge removes the contributions of exactly the affected pieces,
    rewrites them, and adds the rewrites' contributions back — O(affected)
    per merge.  Deterministic: max count, lexicographically-smallest pair
    tie-break, identical numbers to the full recompute at every step."""

    def piece_pairs(syms: tuple[str, ...]):
        return zip(syms, syms[1:])

    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    for syms, c in vocab.items():
        for p in piece_pairs(syms):
            counts[p] = counts.get(p, 0) + c
        for p in set(piece_pairs(syms)):
            where.setdefault(p, set()).add(syms)

    vocab = dict(vocab)  # private copy — we mutate it
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not counts:
            break
        # deterministic argmax: max count, then lexicographically smallest
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        x, y = best
        for syms in list(where.get(best, ())):
            c = vocab.pop(syms, None)
            if c is None:
                continue
            for p in piece_pairs(syms):
                nc = counts[p] - c
                if nc:
                    counts[p] = nc
                else:
                    del counts[p]
            for p in set(piece_pairs(syms)):
                s = where.get(p)
                if s is not None:
                    s.discard(syms)
                    if not s:
                        del where[p]
            new = _apply_merge(syms, x, y)
            vocab[new] = vocab.get(new, 0) + c
            for p in piece_pairs(new):
                counts[p] = counts.get(p, 0) + c
            for p in set(piece_pairs(new)):
                where.setdefault(p, set()).add(new)
    return merges


def _gpiece_sql(piece_col: str) -> str:
    """Ġ-mapped piece split into its initial character symbols."""
    return (
        f"filter(split(regexp_replace({piece_col}, '^ ', '{SPACE_MARK}'), ''), "
        "x -> x != '')"
    )


def gpt2_byte_unicode_map() -> dict[str, str]:
    """The public GPT-2 byte-to-unicode table (Radford et al. 2019,
    encoder.py's ``bytes_to_unicode``: printable latin-1 bytes map to
    themselves, every other byte to ``chr(256 + n)`` in order), keyed by
    UPPERCASE hex byte — the form both Spark's and DuckDB's ``hex()`` emit.
    Space (0x20) lands on ``Ġ`` = chr(288), which is exactly why ``Ġ`` is
    the merges-file space marker; newline lands on ``Ċ``.  256 distinct
    single-char values by construction."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), 256))
    )
    cs = list(bs)
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {f"{b:02X}": chr(c) for b, c in zip(bs, cs)}


def _bmap_sql_literal() -> str:
    """The byte map as a Spark ``map()`` literal (512 constant args — folded
    by Catalyst; the plan carries it once per stage).  Spark string literals
    interpret backslash escapes (non-standard SQL), so ``\\`` and ``'``
    are backslash-escaped."""
    m = gpt2_byte_unicode_map()

    def esc(v: str) -> str:
        return v.replace("\\", "\\\\").replace("'", "\\'")

    args = ", ".join(f"'{k}', '{esc(v)}'" for k, v in m.items())
    return f"map({args})"


def _byte_block_sql(pieces: str) -> str:
    """Byte-level per-piece block: UTF-8 bytes -> hex pairs -> mapped
    byte-unicode chars, one '|s|' unit per BYTE.  The leading space needs no
    special-casing — 0x20 maps to Ġ through the table, which is the actual
    GPT-2 construction the char-level path approximates."""
    bmap = _bmap_sql_literal()
    return (
        f"transform({pieces}, p -> array_join(transform("
        f"regexp_extract_all(hex(encode(p, 'UTF-8')), '..', 0), "
        f"h -> concat('{SEP}', element_at({bmap}, h), '{SEP}')), ''))"
    )


def bpe_token_counts_byte_level(
    docs: DataFrame,
    pairs: list[tuple[str, str]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_pieces, n_tokens_bpe) under GPT-2 BYTE-LEVEL semantics —
    initial symbols are byte-unicode-mapped BYTES of each (lowercased)
    piece, closing the char-level path's stated deviation: a real GPT-2
    ``merges.txt`` applied here reproduces real GPT-2 segment boundaries
    for arbitrary unicode (multi-byte codepoints split into byte symbols
    exactly as the reference encoder does; cross-checked against a
    canonical byte-level python BPE in tests).  No input stripping is
    needed: every raw byte maps to a symbol char distinct from the ``\\x1f``
    / ``\\x1e`` delimiters by construction.  Same fold, same cost shape as
    the char-level doc mode (catalog t31 hash-verifies the byte plumbing —
    hex + 256-entry map — against DuckDB)."""
    pairs = DEMO_MERGES if pairs is None else pairs
    validate_merges(pairs)
    merges = _merges_row(docs.sparkSession, pairs)
    pieces = (
        f"regexp_extract_all(lower({text_col}), '{BPE_PRETOKEN_PAT}', 0)"
    )
    base = docs.selectExpr(
        f"{id_col}", f"coalesce({pieces}, CAST(array() AS ARRAY<STRING>)) AS __pieces"
    ).crossJoin(F.broadcast(merges))
    state0 = f"array_join({_byte_block_sql('__pieces')}, '{BOUND}')"
    final = _FOLD_SQL.format(state=state0)
    return base.selectExpr(
        id_col,
        "CAST(size(__pieces) AS BIGINT) AS n_pieces",
        f"({_n_tokens_sql(final)}) AS n_tokens_bpe",
    )

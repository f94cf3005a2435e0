"""Exact BPE tokenizer (operators/bpe.py, catalog t29): the fold-over-merges
construction cross-checked against a CANONICAL python BPE (lowest-rank-pair
loop with greedy-leftmost merge-all-occurrences), mode equivalence on real
data, merges-format round-trip, and the validity guard."""

import re

import pytest
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.operators.bpe import (
    BPE_PRETOKEN_PAT,
    DEMO_MERGES,
    SPACE_MARK,
    bpe_token_count_col,
    bpe_token_counts,
    parse_merges_text,
    validate_merges,
)
from tests.conftest import SF_DIR


def canonical_bpe_count(text, pairs):
    """Reference implementation of CANONICAL BPE: repeatedly merge the
    lowest-ranked pair present (all occurrences, greedy leftmost) — the
    data-dependent loop the relational fold must reproduce exactly."""
    if text is None:
        return (0, 0)
    text = (
        text.lower().replace("\x1f", "").replace("\x1e", "").replace(SPACE_MARK, "")
    )
    pieces = re.findall(BPE_PRETOKEN_PAT.replace("\\x0B", "\x0b"), text)
    ranks = {p: i for i, p in enumerate(pairs)}
    total = 0
    for pc in pieces:
        pc = re.sub(r"^ ", SPACE_MARK, pc)
        syms = list(pc)
        while True:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            x, y = pairs[best]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        total += len(syms)
    return (len(pieces), total)


ADVERSARIAL = [
    # run-of-self-pair cases: the single-delimiter encoding provably skips
    # every other occurrence here (caught by this very test during build)
    (1, "aaaa llll lllll llllll"),
    (2, "xyxyxy thththth athe athe"),
    (3, "The thermometer reading and the patient isolation wing"),
    (4, "inns running 1234 it-is, the then there!!  and sand band"),
    (5, None),
    (6, ""),
    (7, "tion station nation anders ties ingesting"),
    (8, "\x1f\x1e" + SPACE_MARK + " stripped-chars only"),
]


def test_bpe_matches_canonical_python(spark):
    d = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    exp = {i: canonical_bpe_count(t, DEMO_MERGES) for i, t in ADVERSARIAL}
    got = {
        r.doc_id: (r.n_pieces, r.n_tokens_bpe) for r in bpe_token_counts(d).collect()
    }
    assert got == exp


def test_bpe_modes_identical_on_corpus(spark):
    """doc fold == vocab (distinct-piece) fold == literal-array column, on
    the real documents table — the mode-equivalence contract."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    doc = {
        r.doc_id: (r.n_pieces, r.n_tokens_bpe)
        for r in bpe_token_counts(d).collect()
    }
    voc = {
        r.doc_id: (r.n_pieces, r.n_tokens_bpe)
        for r in bpe_token_counts(d, mode="vocab").collect()
    }
    assert doc == voc and len(doc) == d.count()
    col = {
        r.doc_id: r.n
        for r in d.select(
            "doc_id", bpe_token_count_col(DEMO_MERGES).alias("n")
        ).collect()
    }
    assert col == {k: v[1] for k, v in doc.items()}
    # tokens never exceed characters, never undercut piece count
    assert all(v[1] >= v[0] for v in doc.values())


def test_merges_format_roundtrip_and_validity():
    text = "#version: 0.2\n" + "\n".join(f"{l} {r}" for l, r in DEMO_MERGES)
    assert parse_merges_text(text) == DEMO_MERGES
    with pytest.raises(ValueError, match="malformed"):
        parse_merges_text("a b c")
    # rule using a multi-char symbol no earlier rule built -> refused
    with pytest.raises(ValueError, match="valid BPE training order"):
        validate_merges([("a", "b"), ("xy", "ab")])
    validate_merges([("a", "b"), ("ab", "c")])  # proper order passes


def test_bpe_mode_rejects_unknown():
    with pytest.raises(ValueError, match="mode"):
        bpe_token_counts(None, mode="word")


def test_token_budget_sample_tokenizer_mode(spark):
    """tokenizer= denominates budgets in exact BPE tokens: same selection
    discipline, n_tokens column equals bpe_token_counts, and budgets bind
    on the BPE totals (which differ from the whitespace estimate)."""
    from healthcare_data_pipeline_spark.operators.mixture import token_budget_sample

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = token_budget_sample(d, budget=2_000, tokenizer=DEMO_MERGES)
    rows = out.select("doc_id", "n_tokens", "cum_tokens", "source").collect()
    exact = {
        r.doc_id: r.n_tokens_bpe for r in bpe_token_counts(d).collect()
    }
    assert rows and all(r.n_tokens == exact[r.doc_id] for r in rows)
    # inclusive running total respects the budget per group
    assert all(r.cum_tokens <= 2_000 for r in rows)
    # the BPE denomination selects a different (smaller-count) doc set than
    # the whitespace estimate at the same numeric budget, because BPE counts
    # run higher than whitespace counts on the same text
    ws = token_budget_sample(d, budget=2_000)
    assert out.count() < ws.count()


def test_bpe_tokens_segmentation_and_vocab(spark):
    """bpe_tokens returns the exact segmentation in document order; the
    vocab report aggregates it (hand-computed expectation under
    DEMO_MERGES)."""
    from healthcare_data_pipeline_spark.operators.bpe import (
        bpe_tokens,
        bpe_vocab_report,
    )

    d = spark.createDataFrame([(1, "The the cat")], "doc_id long, text string")
    toks = [(r.pos, r.token) for r in bpe_tokens(d).orderBy("pos").collect()]
    assert toks == [
        (1, "t"),
        (2, "he"),
        (3, SPACE_MARK + "the"),
        (4, SPACE_MARK),
        (5, "c"),
        (6, "at"),
    ]
    counts = {r.token: (r.n_occurrences, r.n_docs) for r in bpe_vocab_report(d).collect()}
    assert counts["t"] == (1, 1) and counts[SPACE_MARK + "the"] == (1, 1)
    # token count surfaces agree
    n = bpe_token_counts(d).collect()[0].n_tokens_bpe
    assert n == len(toks) == 6


def test_learn_bpe_merges_trains_a_valid_consumable_tokenizer(spark):
    """The trainer's output is (a) a valid training order the fold consumes
    directly, (b) deterministic, (c) canonical: tokenizing the training
    corpus with the learned merges matches the canonical python BPE under
    the same list — learn -> tokenize -> budget works end to end with no
    external merges file."""
    from healthcare_data_pipeline_spark.operators.bpe import (
        learn_bpe_merges,
        validate_merges,
    )

    texts = [
        (i, "the patient record shows the reading and the wing "
            f"isolation running note {i % 3}")
        for i in range(30)
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string")
    merges = learn_bpe_merges(d, n_merges=25)
    assert len(merges) == 25
    validate_merges(merges)  # training order valid by construction
    assert merges == learn_bpe_merges(d, n_merges=25)  # deterministic
    got = {
        r.doc_id: (r.n_pieces, r.n_tokens_bpe)
        for r in bpe_token_counts(d, pairs=merges).collect()
    }
    exp = {i: canonical_bpe_count(t, merges) for i, t in texts}
    assert got == exp
    # learned merges compress: fewer tokens than characters-as-symbols
    assert all(got[i][1] < len(t.replace(" ", "")) + got[i][0] for i, t in texts)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_vocab_rows"):
        learn_bpe_merges(d, n_merges=5, max_vocab_rows=3)


def test_bpe_plan_shapes(spark):
    """Scale-shape pins for the tokenizer plans: the doc-mode fold is
    scan-bound (its only exchange is the tiny merges-row aggregation — no
    corpus shuffle, no sort-merge join); vocab mode adds only the piece
    groupBys + joins, and no plan anywhere contains a row-at-a-time python
    UDF."""
    from healthcare_data_pipeline_spark.plans import (
        count_exchanges,
        formatted_plan,
        has_sort_merge_join,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    doc = bpe_token_counts(d)
    # one exchange total: the 24-row merges table's collect_list agg; the
    # corpus side is a mapped scan
    assert count_exchanges(doc) <= 1
    assert not has_sort_merge_join(doc)
    assert "BatchEvalPython" not in formatted_plan(doc)
    voc = bpe_token_counts(d, mode="vocab")
    assert "BatchEvalPython" not in formatted_plan(voc)


def test_bpe_byte_level_matches_canonical(spark):
    """Byte-level mode == canonical GPT-2 byte-level BPE: UTF-8 bytes mapped
    through the public 256-entry table (space -> Ġ via the table, multi-byte
    codepoints split into byte symbols), verified on unicode, control-char,
    backslash and quote bytes — the char-level path's stated deviation,
    closed."""
    from healthcare_data_pipeline_spark.operators.bpe import (
        bpe_token_counts_byte_level,
        gpt2_byte_unicode_map,
    )

    M = gpt2_byte_unicode_map()
    assert len(set(M.values())) == 256 and M["20"] == SPACE_MARK and M["0A"] == "Ċ"

    def ref(text, pairs):
        if text is None:
            return (0, 0)
        pieces = re.findall(BPE_PRETOKEN_PAT.replace("\\x0B", "\x0b"), text.lower())
        ranks = {p: i for i, p in enumerate(pairs)}
        total = 0
        for pc in pieces:
            syms = [M[f"{b:02X}"] for b in pc.encode("utf-8")]
            while True:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                x, y = pairs[best]
                out, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == x and syms[i + 1] == y:
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            total += len(syms)
        return (len(pieces), total)

    texts = [
        (1, "The thermometer reading and the patient wing"),
        (2, "café naïve — ünïcode résumé 日本語 test"),
        (3, None),
        (4, ""),
        (5, "aaaa llll the the \x1f\x1e Ġ weird bytes back\\slash 'quote'"),
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_pieces, r.n_tokens_bpe)
        for r in bpe_token_counts_byte_level(d).collect()
    }
    assert got == {i: ref(t, DEMO_MERGES) for i, t in texts}
    # ASCII-only text: byte-level == char-level (the table is identity on
    # printable ASCII and the Ġ prefix is the 0x20 mapping)
    ascii_d = spark.createDataFrame(texts[:1], "doc_id long, text string")
    a = bpe_token_counts(ascii_d).collect()[0]
    b = bpe_token_counts_byte_level(ascii_d).collect()[0]
    assert (a.n_pieces, a.n_tokens_bpe) == (b.n_pieces, b.n_tokens_bpe)

def _naive_greedy_merges(vocab, n_merges):
    """The r11 full-recompute trainer loop, kept as the parity mirror for
    the incremental-pair-count production loop (_greedy_merges)."""
    vocab = dict(vocab)
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        x, y = best
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def test_incremental_trainer_matches_naive_recompute_property():
    """The incremental loop is bit-identical to the full recompute: same
    counts at every step -> same greedy argmax sequence.  Property-tested
    over random small vocabularies (overlapping pairs, piece collisions
    after rewrite, singleton pieces — all the incremental bookkeeping's
    edge cases)."""
    from hypothesis import given, settings, strategies as st

    from healthcare_data_pipeline_spark.operators.bpe import _greedy_merges

    piece = st.lists(st.sampled_from(list("abcX")), min_size=1, max_size=6).map(tuple)
    vocab_st = st.dictionaries(piece, st.integers(min_value=1, max_value=9),
                               min_size=1, max_size=12)

    @settings(max_examples=200, deadline=None)
    @given(vocab_st, st.integers(min_value=1, max_value=30))
    def check(vocab, n):
        assert _greedy_merges(vocab, n) == _naive_greedy_merges(vocab, n)

    check()


def test_incremental_trainer_scales_past_naive_budget():
    """The production point: per-merge cost is O(affected pieces), so a
    2000-merge run over a 50k-piece vocabulary finishes in seconds where
    the naive loop's O(n_merges x |vocab|) would take minutes.  Pure
    driver-side check (no Spark) with a wall-clock ceiling loose enough
    to never flake, tight enough that an accidental revert to the naive
    loop fails it."""
    import time

    from healthcare_data_pipeline_spark.operators.bpe import _greedy_merges

    # Zipf-ish synthetic vocabulary: 50k distinct pieces over a 26-symbol
    # alphabet, deterministic construction (no RNG in tests).
    vocab = {}
    for i in range(50_000):
        s = []
        v = i
        for _ in range(3 + (i % 5)):
            s.append(chr(97 + v % 26))
            v = (v * 31 + 7) % 999_983
        vocab[tuple(s)] = 1 + (i % 97)
    t0 = time.monotonic()
    merges = _greedy_merges(vocab, 2000)
    dt = time.monotonic() - t0
    assert len(merges) == 2000
    assert dt < 60, f"incremental trainer took {dt:.1f}s for 2000 merges on 50k pieces"

"""Dedup-effectiveness harness contracts (tools/dedup_quality.py).

The harness measures what no oracle can — whether the dedup family CATCHES
realistic planted near-dups — so its own invariants need pinning: hard
contracts (exact-stage recall, zero false positives on a fixpoint-cleaned
corpus) assert exactly; curve points (LSH recall at a family's Jaccard)
assert loose brackets, because their exact values are the published
band-structure trade the SCALE.md table exists to report, not constants.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def _rows(spark):
    from tools.dedup_quality import measure_scale

    rows = measure_scale(spark, SF_DIR, SF_DIR, 1)
    return {(r["operator"], r["family"]): r for r in rows}


def test_dedup_quality_harness_contracts(spark):
    got = _rows(spark)

    # exact-stage contract: whitespace rewraps are exact dups after
    # normalization — anything below 1.0 is a fingerprint bug
    assert got[("dedup_corpus", "ws_rewrap")]["recall"] == 1.0

    # near the LSH design point: two appended tokens on ~54-token docs
    assert got[("dedup_corpus", "suffix_2tok")]["recall"] >= 0.9

    # curve points: 4-band/4-row theory predicts ~0.76 at J~0.74 and ~0.28
    # at J~0.53 — bracket generously, the harness reports the precise value
    assert 0.5 <= got[("dedup_corpus", "edit_5pct")]["recall"] <= 1.0
    assert 0.05 <= got[("dedup_corpus", "edit_10pct")]["recall"] <= 0.7

    # similarity column really measures family hardness (ordering)
    assert (
        got[("dedup_corpus", "suffix_2tok")]["similarity"]
        > got[("dedup_corpus", "edit_5pct")]["similarity"]
        > got[("dedup_corpus", "edit_10pct")]["similarity"]
    )

    # embedding families: a ~cos-1 nudge must be caught; borderline noise
    # is the measured cell-boundary trade (any nonzero recall acceptable)
    assert got[("semdedup", "emb_tiny")]["recall"] >= 0.9
    assert got[("semdedup", "emb_noise")]["recall"] > 0.0

    # planted boilerplate span: always excised
    assert got[("span_dedup", "boilerplate_12tok")]["recall"] == 1.0

    # line-level boilerplate: exact-line contract from both sides — high-df
    # banner, the df=2 pair exactly at min_docs, and indentation-only
    # variants (trim matching) are hard catches; a line with ONE
    # doc-specific token is a hard MISS by design (df=1 per distinct line —
    # that's where the span stage takes over)
    assert got[("line_dedup", "banner_5pct")]["recall"] == 1.0
    assert got[("line_dedup", "banner_df2")]["recall"] == 1.0
    assert got[("line_dedup", "banner_indent")]["recall"] == 1.0
    assert got[("line_dedup", "banner_fuzz")]["recall"] == 0.0

    # decontamination: verbatim leaks and a single shared 13-gram (the
    # any-shared-gram contract at its minimum) are hard catches in BOTH
    # modes — bloom must have NO false negatives; every-8th-token
    # paraphrase (longest clean run 7 < n=13) is a hard miss by contract
    for op in ("decon_ngram", "decon_bloom"):
        assert got[(op, "verbatim_leak")]["recall"] == 1.0, op
        assert got[(op, "quote_13tok")]["recall"] == 1.0, op
        assert got[(op, "paraphrase")]["recall"] == 0.0, op

    # similarity column orders decon hardness: verbatim ~1 > quote ~1/grams > 0
    assert (
        got[("decon_ngram", "verbatim_leak")]["similarity"]
        > got[("decon_ngram", "quote_13tok")]["similarity"]
        > got[("decon_ngram", "paraphrase")]["similarity"]
    )

    # fixpoint/differential false-positive accounting: a cleaned corpus
    # re-run may remove ONLY planted material.  decon_ngram's zero is a
    # HARD contract (the clean set shares no gram with eval); decon_bloom's
    # FPs are measured hash collisions — bounded separately below.
    for op in ("dedup_corpus", "semdedup", "span_dedup", "line_dedup", "decon_ngram"):
        assert got[(op, "(precision)")]["fp"] == 0, op
        assert got[(op, "(precision)")]["precision"] == 1.0, op

    # bloom collisions at a bloom_m_bits(·, 1e-4)-sized bitmap: per-doc FP
    # rate must sit within ~100x of the per-gram target (each doc probes
    # ~40 grams) — saturation or a sizing regression blows far past this
    prec = got[("decon_bloom", "(precision)")]
    assert prec["fp"] <= max(5, 0.05 * prec["planted"]), prec

    # quality-gate coverage matrix: the DIAGONAL is the claim — each junk
    # family is visible only to its intended gate
    assert got[("gate_rare_bigram", "word_salad")]["recall"] == 1.0
    assert got[("gate_repetition", "token_loop")]["recall"] == 1.0
    assert got[("gate_basic", "short_frag")]["recall"] == 1.0
    assert got[("gate_gopher", "short_frag")]["recall"] == 1.0
    assert got[("gate_gopher", "symbol_spam")]["recall"] == 1.0
    # ...and the off-diagonal zeros that make each row meaningful: the loop
    # slips A1.1 (same words/lengths) AND the corpus-adaptive gate (its
    # transitions recur corpus-wide) — the measured gap t28 exists to close
    assert got[("gate_basic", "word_salad")]["recall"] == 0.0
    assert got[("gate_gopher", "token_loop")]["recall"] == 0.0
    assert got[("gate_rare_bigram", "token_loop")]["recall"] == 0.0
    assert got[("gate_repetition", "symbol_spam")]["recall"] == 0.0
    assert got[("gate_rare_bigram", "symbol_spam")]["recall"] == 0.0

    # gate precision: stateless per-doc gates cannot flip a clean doc, and
    # plants only add bigram occurrences (corpus-adaptive gate gets safer)
    for op in ("gate_basic", "gate_gopher", "gate_repetition", "gate_rare_bigram"):
        assert got[(op, "(precision)")]["fp"] == 0, op

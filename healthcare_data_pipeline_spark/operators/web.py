"""URL/domain-level corpus curation — the stage published web pipelines run
BEFORE any content-level work.

RefinedWeb (Penedo 2023 §3.2/G) deduplicates by URL and applies a URL
blocklist as its FIRST filters — a page fetched twice (mirrors, tracking
variants, scheme/host-case drift) should cost one content pass, not two;
C4 (Raffel 2020 §2.2) keeps one page per URL; per-domain caps are standard
crawl-curation practice (a handful of template-spam domains otherwise
dominates token mass).  None of this exists in the reference (a CSV/JDBC
healthcare ETL — no web provenance at all); it is part of the mandated
large-scale training-data surface.

Everything here is either a zero-shuffle scalar projection (normalization,
domain extraction, blocklist via a broadcast anti join) or a bounded
aggregate (per-domain stats: one map-side-combinable groupBy of n_domains
output rows).  The per-domain cap ships the repo's standard exact/approx
twin: the exact form window-ranks within each domain (auditable, but a
mega-domain's whole rank lands in ONE task — bounded-domain-lists only),
the approx form is the ``token_budget_sample``/``hash_split`` scale path —
per-domain counts, then a salted portable-hash threshold keeps ~cap docs
per domain with ZERO windows and stable membership under corpus growth.

Normalization rule set (applied IDENTICALLY by the DuckDB oracles — every
step is one portable regex):

1. strip the scheme (``^[A-Za-z][A-Za-z0-9+.-]*://``);
2. split the authority (up to the first ``/``, ``?`` or ``#`` — a path-less
   URL may carry a query or fragment right after the host) from the rest;
3. host: strip userinfo (up to the last ``@``), lowercase, strip one
   leading ``www.``, strip FQDN trailing dot(s), strip an explicit default
   port (``:80``/``:443``; non-default ports are KEPT in the norm — a
   different port can serve a different site);
4. rest: strip the fragment (``#...``); drop tracking parameters
   (default ``utm_*``, ``fbclid``, ``gclid`` — widen via
   ``tracking_params=``) and tidy separators; strip a trailing
   ``?``/``&``; strip one trailing ``/``;
5. ``url_norm = host || rest``.

For MATCHING (registrable-domain extraction, blocklists) the host is
additionally stripped of ANY explicit port — ``https://spam.net:8443/x``
must not evade a ``spam.net`` blocklist entry via the port (trailing-dot
evasion is already closed by step 3).

Deliberately NOT done: percent-decoding (changes semantics for reserved
chars), query-param re-ordering (reordering is rare in crawls and sorting
params can merge distinct pages), IDN/punycode folding (needs a table).

``registrable_domain`` approximates the PSL (public-suffix list)
registrable domain as the last ``levels`` host labels (default 2) — this
container carries no PSL, and the approximation errs on two-label public
suffixes by MERGING every site under them (``a.co.uk``/``b.co.uk`` both
land under ``co.uk`` — for a ccTLD-heavy crawl ``domain_cap`` would then
cap unrelated sites against each other).  For those corpora pass
``levels=3``, or supply a real suffix list via ``psl_table=`` on
``with_registrable_domain``/``domain_cap``/``domain_stats``/
``domain_blocklist_filter`` — a user-provided one-column suffix DataFrame,
matched longest-suffix-first through a fixed chain of BROADCAST left joins
(one per candidate depth — zero shuffle, no window, no explode-groupBy).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.localrel import local_relation

from healthcare_data_pipeline_spark.operators.mixture import DENOM, _split_hash

_SCHEME = r"^[A-Za-z][A-Za-z0-9+.\-]*://"

#: Size gate for ``psl_table`` collection (the real PSL is ~10k entries;
#: 20x headroom — anything past this is not a public-suffix list).
_MAX_PSL_SUFFIXES = 200_000

#: Default tracking-parameter families stripped by ``url_normalize_col``.
#: A trailing ``*`` is a prefix wildcard (``utm_*`` -> ``utm_[^=&#]*``).
#: Real crawls carry more (``msclkid``, ``twclid``, ``igshid``, ``mc_eid``,
#: ``ref_src``, ...) — pass them via ``tracking_params=``; the default stays
#: frozen at the r13 three families so existing norms are stable.
DEFAULT_TRACKING_PARAMS: tuple[str, ...] = ("utm_*", "fbclid", "gclid")


def tracking_param_regex(
    params: tuple[str, ...] | list[str] = DEFAULT_TRACKING_PARAMS,
) -> str:
    """The tracking-parameter removal regex for a parameter-name list —
    portable across Spark (Java regex) and DuckDB (RE2), so the SQL oracles
    build their pattern from THIS function and can never drift from the
    engine (the lockstep builder the stratum/label entries use).

    The leading ``[?&]`` is REQUIRED and captured (kept in the replacement
    as ``$1``/``\\1``): without it the alternation matches INSIDE other
    parameter names — ``?myutm_x=1&a=2`` would normalize to ``?mya=2``,
    merging distinct pages.  The separator runs the kept ``$1``s produce
    (``?&``, ``&&``) are tidied by the caller's follow-up rewrites.

    A trailing ``*`` on a name is a prefix wildcard; every other character
    is matched literally (escaped)."""
    if not params:
        raise ValueError("need at least one tracking parameter name")
    alts = []
    for p in params:
        if not p or p == "*":
            raise ValueError(f"bad tracking parameter name: {p!r}")
        if p.endswith("*"):
            alts.append(_re.escape(p[:-1]) + "[^=&#]*")
        else:
            alts.append(_re.escape(p))
    return "([?&])(" + "|".join(alts) + ")=[^&#]*"


def url_host_col(url_col: str | Column) -> Column:
    """Normalized host of a URL: scheme and userinfo stripped, lowercased,
    one leading ``www.`` stripped, FQDN trailing dot(s) stripped, explicit
    DEFAULT port stripped (a non-default port is kept — it can serve a
    different site, so it stays distinct in ``url_norm``).  Pure scalar.

    The authority ends at the first ``/``, ``?`` or ``#`` (r13 review fix:
    ``^[^/]*`` ran through a path-less URL's query, so
    ``https://spam.net?ref=1`` yielded host ``spam.net?ref=1`` and walked
    straight past the blocklist)."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.regexp_replace(url, _SCHEME, "")
    auth = F.regexp_extract(u, r"^[^/?#]*", 0)
    host = F.lower(F.regexp_replace(auth, r"^.*@", ""))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r"\.+(:\d+)?$", "$1")
    return F.regexp_replace(host, r":(80|443)$", "")


def _match_host_col(url_col: str | Column) -> Column:
    """Matching form of the host: ANY explicit port stripped on top of
    ``url_host_col`` (r13 review fix — ``https://spam.net:8443/x`` must hit
    a ``spam.net`` blocklist entry; the norm keeps the port for
    distinctness, matching must not)."""
    return F.regexp_replace(url_host_col(url_col), r":\d+$", "")


def url_normalize_col(
    url_col: str | Column,
    tracking_params: tuple[str, ...] | list[str] = DEFAULT_TRACKING_PARAMS,
) -> Column:
    """The canonical form of a URL under the module's documented rule set —
    one scalar expression (a chain of regex rewrites), zero shuffle."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.regexp_replace(url, _SCHEME, "")
    rest = F.regexp_replace(u, r"^[^/?#]*", "")
    rest = F.regexp_replace(rest, r"#.*", "")
    rest = F.regexp_replace(rest, tracking_param_regex(tracking_params), "$1")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/$", "")
    return F.concat(url_host_col(url), rest)


def registrable_domain_col(url_col: str | Column, levels: int = 2) -> Column:
    """Last ``levels`` labels of the match host (PSL approximation — see
    the module doc for the error direction and the ``psl_table=`` exact
    path); the whole host when it has fewer labels.  Ports and trailing
    dots never reach the domain (r13 review fix)."""
    if levels < 1:
        raise ValueError(f"need levels >= 1, got {levels}")
    return _last_labels(_match_host_col(url_col), levels)


def _last_labels(host: Column, levels: int) -> Column:
    """Last ``levels`` dot-labels of a host column; the whole host when it
    has fewer."""
    pat = r"((?:[^.]+\.)" + "{" + str(levels - 1) + "}" + r"[^.]+)$"
    tail = F.regexp_extract(host, pat, 1)
    return F.when(tail == "", host).otherwise(tail)


def _tail_exact(host: Column, labels: int) -> Column:
    """Exactly the last ``labels`` dot-labels of a host, or '' when the
    host has fewer — the PSL candidate-suffix generator."""
    pat = r"(?:^|\.)((?:[^.]+\.)" + "{" + str(labels - 1) + "}" + r"[^.]+)$"
    return F.regexp_extract(host, pat, 1)


def with_registrable_domain(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
    levels: int = 2,
    psl_table: DataFrame | None = None,
    max_suffix_labels: int = 4,
) -> DataFrame:
    """All input columns + ``out_col`` = the registrable domain.

    Without ``psl_table`` this is the zero-join last-``levels``-labels
    approximation (``registrable_domain_col``).  With it, real PSL
    semantics: ``psl_table``'s first column is a public-suffix list
    (``com``, ``co.uk``, ``com.au``, ...), the LONGEST suffix matching the
    host wins, and the registrable domain is that suffix plus one more
    label (Mozilla PSL algorithm; the unlisted-TLD default rule ``*`` falls
    back to the ``levels`` approximation, and a host that IS a bare public
    suffix degenerates to itself).

    Scale shape: candidate tails for depths 1..``max_suffix_labels`` are
    scalar regex extracts; each depth is ONE broadcast left join against
    the (distinct, lowercased) suffix list; longest-match selection is a
    chain of ``when``s.  No shuffle, no window, no explode — the suffix
    list is curation-sized (the real PSL is ~10k entries), never
    corpus-sized."""
    if psl_table is None:
        return df.withColumn(out_col, registrable_domain_col(url_col, levels=levels))
    if max_suffix_labels < 1:
        raise ValueError(f"need max_suffix_labels >= 1, got {max_suffix_labels}")
    suffix_col = psl_table.columns[0]
    # The suffix list is curation-sized BY CONTRACT (the real PSL is ~10k
    # entries) — collect it once through a size gate and rebuild it as a
    # deduped local relation: the per-depth joins then broadcast a
    # LocalTableScan with ZERO exchanges (a lazy .distinct() would re-run
    # its dedup exchange on every join branch), and a duplicate suffix row
    # can never fan out the left joins.  The gate raises rather than
    # silently truncating (the bounded-distinct-collection standard).
    rows = psl_table.select(F.lower(F.col(suffix_col))).limit(
        _MAX_PSL_SUFFIXES + 1
    ).collect()
    if len(rows) > _MAX_PSL_SUFFIXES:
        raise ValueError(
            f"psl_table exceeds {_MAX_PSL_SUFFIXES} suffixes — not a "
            "public-suffix list; pass a curation-sized suffix table"
        )
    # LocalRelation (localrel.py): the suffix table is rebuilt per depth as a
    # broadcast side; the Python-RDD form paid a worker round-trip task storm
    # under every one of those builds.  Falls back past the 10k-row gate.
    suf = local_relation(
        df.sparkSession,
        [(s,) for s in sorted({r[0] for r in rows if r[0] is not None})],
        "__psl_suffix string",
    )
    d = df.withColumn("__h", _match_host_col(url_col))
    for i in range(1, max_suffix_labels + 2):
        d = d.withColumn(f"__t{i}", _tail_exact(F.col("__h"), i))
    for i in range(1, max_suffix_labels + 1):
        m = suf.withColumnRenamed("__psl_suffix", f"__m{i}")
        d = d.join(F.broadcast(m), d[f"__t{i}"] == m[f"__m{i}"], "left")
    # Longest matched suffix wins (built ascending so depth max is checked
    # first); registrable = one label more than the suffix, degenerating to
    # the host itself when the host IS the suffix; unmatched hosts take the
    # PSL "*" default rule = the levels approximation.
    dom = _last_labels(F.col("__h"), levels)
    for i in range(1, max_suffix_labels + 1):
        reg = F.when(F.col(f"__t{i + 1}") != "", F.col(f"__t{i + 1}")).otherwise(
            F.col("__h")
        )
        dom = F.when(F.col(f"__m{i}").isNotNull(), reg).otherwise(dom)
    d = d.withColumn(out_col, dom)
    drop = ["__h"] + [f"__t{i}" for i in range(1, max_suffix_labels + 2)] + [
        f"__m{i}" for i in range(1, max_suffix_labels + 1)
    ]
    return d.drop(*drop)


def url_normalize(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_norm",
    tracking_params: tuple[str, ...] | list[str] = DEFAULT_TRACKING_PARAMS,
) -> DataFrame:
    """All input columns + ``out_col`` = the canonical URL."""
    return df.withColumn(out_col, url_normalize_col(url_col, tracking_params))


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_params: tuple[str, ...] | list[str] = DEFAULT_TRACKING_PARAMS,
) -> DataFrame:
    """Keep ONE document per canonical URL (the RefinedWeb first-stage
    dedup): the survivor is the smallest id — deterministic, engine-free.

    Scale shape: one scalar normalization, one groupBy(url_norm) min(id)
    with map-side combine, one semi join back on the id.  URL-keyed, so a
    page's duplicates collide regardless of content drift in headers or
    ads; content-level dedup (``dedup_corpus``) still runs AFTER this —
    URL dedup is the cheap pass that keeps exact refetches from ever
    paying shingle shuffles.

    NULL URLs (non-web provenance in a mixed corpus) PASS THROUGH: missing
    provenance is not evidence of duplication, and a plain groupBy would
    collapse every NULL-url document into one surviving "duplicate"."""
    with_url = df.filter(F.col(url_col).isNotNull())
    keep = (
        with_url.withColumn("__un", url_normalize_col(url_col, tracking_params))
        .groupBy("__un")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return with_url.join(keep, id_col, "left_semi").unionByName(
        df.filter(F.col(url_col).isNull())
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str | None = None,
    levels: int = 2,
    psl_table: DataFrame | None = None,
) -> DataFrame:
    """Per-registrable-domain occupancy: (domain, n_docs[, n_chars]) — the
    observability face of ``domain_cap`` (decide the cap from measured
    occupancy, the ``ann_index_report`` pattern).  One map-side-combinable
    groupBy; output bounded by the domain count, never corpus-sized."""
    d = with_registrable_domain(
        df, url_col, out_col="__dom", levels=levels, psl_table=psl_table
    )
    aggs = [F.count("*").alias("n_docs")]
    if text_col is not None:
        aggs.append(F.sum(F.length(text_col)).cast("long").alias("n_chars"))
    return d.groupBy(F.col("__dom").alias("domain")).agg(*aggs)


def domain_cap(
    df: DataFrame,
    max_docs: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    levels: int = 2,
    salt: str = "domcap",
    method: str = "exact",
    psl_table: DataFrame | None = None,
) -> DataFrame:
    """Keep at most ``max_docs`` documents per registrable domain — the
    anti-template-spam frequency cap.  Selection is a salted portable hash
    of the id: deterministic, decorrelated from every other hash gate, and
    SELECTION-ORDER stable — a domain's members are admitted in a fixed
    hash order, so re-running on the same corpus is bit-identical, and the
    kept set only changes at the hash boundary the cap implies.  Under a
    FIXED cap a growing domain necessarily evicts its highest-hash members
    (the cap is the point); for frozen membership across corpus versions,
    scale the cap with the corpus (a fixed keep FRACTION — then the hash
    gate alone decides and kept documents stay kept, the ``hash_split``
    contract).

    ``method='exact'``: window-rank within each domain by (hash, id), keep
    rank <= cap — count-exact and auditable, but a mega-domain's whole rank
    runs in ONE task (bounded domain lists; the same trade as
    ``exact_stratified_split``).  ``method='approx'`` is the 100 TB path:
    one bounded per-domain count, then keep rows whose hash falls under
    cap/count of the hash space — ~cap per domain in expectation, zero
    windows, nothing sorts.  A domain under its cap keeps everything in
    both forms.  NULL URLs pass through uncapped: missing provenance is
    not a domain, and grouping NULLs would cap unrelated non-web documents
    against each other as one pseudo-domain.  ``psl_table=`` swaps the
    domain key to real PSL semantics (see ``with_registrable_domain``) —
    on ccTLD-heavy corpora the levels approximation would otherwise cap
    unrelated ``*.co.uk`` sites against each other under one pseudo-domain."""
    if max_docs < 1:
        raise ValueError(f"need max_docs >= 1, got {max_docs}")
    if method not in ("exact", "approx"):
        raise ValueError(f"method must be 'exact' or 'approx', got {method!r}")
    no_url = df.filter(F.col(url_col).isNull())
    d = with_registrable_domain(
        df.filter(F.col(url_col).isNotNull()),
        url_col,
        out_col="__dom",
        levels=levels,
        psl_table=psl_table,
    )
    if method == "exact":
        from pyspark.sql import Window

        w = Window.partitionBy("__dom").orderBy(
            _split_hash(id_col, salt).asc(), F.col(id_col).asc()
        )
        capped = (
            d.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_docs)
            .drop("__dom", "__rn")
        )
        return capped.unionByName(no_url)
    counts = d.groupBy("__dom").agg(F.count("*").alias("__n"))
    # threshold in DOUBLE before scaling (the token_budget_sample overflow
    # lesson: an integer product cap*DENOM wraps for huge caps)
    thr = F.least(
        F.lit(DENOM).cast("long"),
        (F.lit(float(max_docs)) / F.col("__n") * DENOM).cast("long"),
    )
    capped = (
        d.join(F.broadcast(counts), "__dom")
        .filter(_split_hash(id_col, salt) < thr)
        .drop("__dom", "__n")
    )
    return capped.unionByName(no_url)


def registrable_domain_literal_col(
    url_col: str | Column,
    psl_suffixes: tuple[str, ...] | list[str],
    levels: int = 2,
    max_suffix_labels: int = 4,
) -> Column:
    """PSL-exact registrable domain as ONE scalar Column — the suffix list
    rides the expression as ``isin`` literals (longest-match via chained
    whens over per-depth tails), so it works where a join cannot: streaming
    closure predicates, per-row gates.  Identical semantics to
    ``with_registrable_domain(psl_table=)`` (same tails, same longest-match
    rule, same ``levels`` fallback for unlisted TLDs); prefer the join form
    for batch work or suffix lists past closure size (the real PSL's ~10k
    entries are fine as literals — the ``domain_blocklist_predicate``
    contract)."""
    if not psl_suffixes:
        raise ValueError("need at least one public suffix")
    if max_suffix_labels < 1:
        raise ValueError(f"need max_suffix_labels >= 1, got {max_suffix_labels}")
    suf = sorted({str(s).lower() for s in psl_suffixes})
    host = _match_host_col(url_col)
    dom = _last_labels(host, levels)
    for i in range(1, max_suffix_labels + 1):
        tail_i = _tail_exact(host, i)
        tail_up = _tail_exact(host, i + 1)
        reg = F.when(tail_up != "", tail_up).otherwise(host)
        dom = F.when(tail_i.isin(suf), reg).otherwise(dom)
    return dom


def domain_blocklist_predicate(
    blocked: tuple[str, ...] | list[str],
    url_col: str = "url",
    levels: int = 2,
    psl_suffixes: tuple[str, ...] | list[str] = (),
) -> Column:
    """STATELESS keep-predicate form of ``domain_blocklist_filter`` for
    streaming gates (``prep_stream``): the curation-sized list rides the
    task closure as an ``isin`` literal — no join, no state store, append-
    mode safe (the ``eval_bloom`` pattern).  Prefer the join form for lists
    past closure size (hundreds of thousands of entries).

    ``psl_suffixes`` (r14) keys the domain on PSL-exact registrable
    domains via ``registrable_domain_literal_col`` — the stream-side twin
    of the batch filter's ``psl_table=``, so a PSL-keyed batch pipeline
    has a stream gate that keeps doc-for-doc the same set.

    NULL URLs KEEP (coalesce to true) — matching the batch anti join, where
    a NULL key never matches; without the coalesce, ``~NULL`` is NULL and
    ``filter`` would silently drop every missing-provenance document,
    diverging from the batch path on the same corpus."""
    bl = [str(b).lower() for b in blocked]
    dom = (
        registrable_domain_literal_col(url_col, psl_suffixes, levels=levels)
        if psl_suffixes
        else registrable_domain_col(url_col, levels=levels)
    )
    pred = (~dom.isin(bl)) & (~_match_host_col(url_col).isin(bl))
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.when(url.isNull(), F.lit(True)).otherwise(pred)


def domain_blocklist_filter(
    df: DataFrame,
    blocked: tuple[str, ...] | list[str],
    url_col: str = "url",
    levels: int = 2,
    psl_table: DataFrame | None = None,
) -> DataFrame:
    """Drop documents whose registrable domain OR full match host is on the
    blocklist (entries may be either; hosts match with ports and trailing
    dots stripped, so ``:8443``/FQDN-dot variants can't evade — r13 review
    fix).  Broadcast anti joins — the list is curation-sized (thousands),
    never corpus-sized; matching is equi-join, not regex-per-row."""
    bl = local_relation(
        df.sparkSession, [(str(b).lower(),) for b in blocked], "b string"
    )
    d = with_registrable_domain(
        df, url_col, out_col="__dom", levels=levels, psl_table=psl_table
    ).withColumn("__host", _match_host_col(url_col))
    return (
        d.join(F.broadcast(bl), d["__dom"] == bl["b"], "left_anti")
        .join(F.broadcast(bl), F.col("__host") == bl["b"], "left_anti")
        .drop("__dom", "__host")
    )

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
2. split host (up to the first ``/``) from the rest;
3. host: lowercase, strip one leading ``www.``, strip an explicit default
   port (``:80``/``:443``);
4. rest: strip the fragment (``#...``); drop tracking parameters
   (``utm_*``, ``fbclid``, ``gclid``) and tidy separators; strip a
   trailing ``?``/``&``; strip one trailing ``/``;
5. ``url_norm = host || rest``.

Deliberately NOT done: percent-decoding (changes semantics for reserved
chars), query-param re-ordering (reordering is rare in crawls and sorting
params can merge distinct pages), IDN/punycode folding (needs a table).

``registrable_domain`` approximates the PSL (public-suffix list)
registrable domain as the last ``levels`` host labels (default 2) — this
container carries no PSL, and the approximation errs by SPLITTING
(``a.co.uk`` sites land under ``co.uk``), never by merging unrelated
registrable domains under two-label TLDs, which is the safe direction for
caps; pass ``levels=3`` for ccTLD-heavy corpora or post-join a PSL table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.operators.mixture import DENOM, _split_hash

_SCHEME = r"^[A-Za-z][A-Za-z0-9+.\-]*://"
# The leading [?&] is REQUIRED and captured (kept in the replacement):
# without it the alternation matches INSIDE other parameter names —
# '?myutm_x=1&a=2' would normalize to '?mya=2', merging distinct pages.
# The separator runs the kept '$1's produce ('?&', '&&') are tidied after.
_TRACKING = r"([?&])(utm_[^=&#]*|fbclid|gclid)=[^&#]*"


def url_host_col(url_col: str | Column) -> Column:
    """Normalized host of a URL: scheme stripped, lowercased, one leading
    ``www.`` stripped, explicit default port stripped.  Pure scalar."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.regexp_replace(url, _SCHEME, "")
    host = F.lower(F.regexp_extract(u, r"^[^/]*", 0))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r":(80|443)$", "")


def url_normalize_col(url_col: str | Column) -> Column:
    """The canonical form of a URL under the module's documented rule set —
    one scalar expression (a chain of regex rewrites), zero shuffle."""
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.regexp_replace(url, _SCHEME, "")
    rest = F.regexp_replace(u, r"^[^/]*", "")
    rest = F.regexp_replace(rest, r"#.*", "")
    rest = F.regexp_replace(rest, _TRACKING, "$1")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/$", "")
    return F.concat(url_host_col(url), rest)


def registrable_domain_col(url_col: str | Column, levels: int = 2) -> Column:
    """Last ``levels`` labels of the normalized host (PSL approximation —
    see the module doc for the error direction); the whole host when it has
    fewer labels."""
    if levels < 1:
        raise ValueError(f"need levels >= 1, got {levels}")
    host = url_host_col(url_col)
    pat = r"((?:[^.]+\.)" + "{" + str(levels - 1) + "}" + r"[^.]+)$"
    tail = F.regexp_extract(host, pat, 1)
    return F.when(tail == "", host).otherwise(tail)


def url_normalize(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """All input columns + ``out_col`` = the canonical URL."""
    return df.withColumn(out_col, url_normalize_col(url_col))


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
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
        with_url.withColumn("__un", url_normalize_col(url_col))
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
    id_col: str = "doc_id",
    text_col: str | None = None,
    levels: int = 2,
) -> DataFrame:
    """Per-registrable-domain occupancy: (domain, n_docs[, n_chars]) — the
    observability face of ``domain_cap`` (decide the cap from measured
    occupancy, the ``ann_index_report`` pattern).  One map-side-combinable
    groupBy; output bounded by the domain count, never corpus-sized."""
    d = df.withColumn("__dom", registrable_domain_col(url_col, levels=levels))
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
    against each other as one pseudo-domain."""
    if max_docs < 1:
        raise ValueError(f"need max_docs >= 1, got {max_docs}")
    if method not in ("exact", "approx"):
        raise ValueError(f"method must be 'exact' or 'approx', got {method!r}")
    no_url = df.filter(F.col(url_col).isNull())
    d = df.filter(F.col(url_col).isNotNull()).withColumn(
        "__dom", registrable_domain_col(url_col, levels=levels)
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


def domain_blocklist_predicate(
    blocked: tuple[str, ...] | list[str],
    url_col: str = "url",
    levels: int = 2,
) -> Column:
    """STATELESS keep-predicate form of ``domain_blocklist_filter`` for
    streaming gates (``prep_stream``): the curation-sized list rides the
    task closure as an ``isin`` literal — no join, no state store, append-
    mode safe (the ``eval_bloom`` pattern).  Prefer the join form for lists
    past closure size (hundreds of thousands of entries).

    NULL URLs KEEP (coalesce to true) — matching the batch anti join, where
    a NULL key never matches; without the coalesce, ``~NULL`` is NULL and
    ``filter`` would silently drop every missing-provenance document,
    diverging from the batch path on the same corpus."""
    bl = [str(b).lower() for b in blocked]
    pred = (~registrable_domain_col(url_col, levels=levels).isin(bl)) & (
        ~url_host_col(url_col).isin(bl)
    )
    url = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.when(url.isNull(), F.lit(True)).otherwise(pred)


def domain_blocklist_filter(
    df: DataFrame,
    blocked: tuple[str, ...] | list[str],
    url_col: str = "url",
    levels: int = 2,
) -> DataFrame:
    """Drop documents whose registrable domain OR full normalized host is on
    the blocklist (entries may be either).  Broadcast anti joins — the list
    is curation-sized (thousands), never corpus-sized; matching is
    equi-join, not regex-per-row."""
    bl = df.sparkSession.createDataFrame(
        [(str(b).lower(),) for b in blocked], "b string"
    )
    d = (
        df.withColumn("__dom", registrable_domain_col(url_col, levels=levels))
        .withColumn("__host", url_host_col(url_col))
    )
    return (
        d.join(F.broadcast(bl), d["__dom"] == bl["b"], "left_anti")
        .join(F.broadcast(bl), F.col("__host") == bl["b"], "left_anti")
        .drop("__dom", "__host")
    )

"""Catalog entries for the URL/domain curation family (operators.web).

The driver's test tables carry no URL column (the reference is a CSV/JDBC
healthcare ETL with no web provenance), so each entry SYNTHESIZES a
deterministic URL from (source, doc_id) with printf — identical expressions
on the Spark and DuckDB sides, the same convention the stratum/label
entries use — deliberately messy (scheme case, WWW., explicit :443,
tracking params, fragments) so the normalization rules are exercised, not
just typed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.localrel import local_relation

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.operators.mixture import DENOM
from healthcare_data_pipeline_spark.queries import query

# The messy URL (w01): exercises scheme-strip, host lowercase, www-strip,
# default-port strip, fragment strip, tracking-param removal (leading AND
# trailing positions), separator tidy-up.
_W01_FMT = (
    "HTTPS://WWW.%s-%d.Example.COM:443/Path/%d/?utm_source=w01&id=%d&utm_medium=x#frag"
)
_W01_SQL_URL = f"printf('{_W01_FMT}', source, doc_id % 37, doc_id % 11, doc_id)"

# Scheme-case/variant collisions (w02): raw strings differ, canonical forms
# collide for every (source, doc_id % 40) group.
_W02_SQL_URL = (
    "printf('%s://%s.EXAMPLE.com/p/%d', "
    "CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTP' END, source, doc_id % 40)"
)

# Distinct registrable domains (w03/w04/w05): 'sub.<source>-<k>.net'.
_W0345_SQL_URL = "printf('https://sub.%s-%d.net/x/%d', source, doc_id % 13, doc_id)"
_W0345_SQL_DOM = "printf('%s-%d.net', source, doc_id % 13)"

# The module's normalization chain as DuckDB SQL over a CTE exposing (u):
# authority/rest split at the first /?# (the r13 review fix — a path-less
# URL may carry a query/fragment right after the host), userinfo strip,
# trailing-dot strip, then the documented rewrite sequence.  The 'g' flag is
# needed only on the tracking removal (Spark's regexp_replace is global;
# every other pattern here matches at most once).  The tracking pattern
# comes from the SAME builder the engine uses (tracking_param_regex) so the
# oracle can never drift from the operator.
from healthcare_data_pipeline_spark.operators.web import tracking_param_regex

_SQL_NORM_CTES = (
    r"""
    hp AS (
      SELECT doc_id, url,
             regexp_replace(regexp_replace(regexp_replace(
               lower(regexp_replace(regexp_extract(u, '^[^/?#]*'), '^.*@', '')),
               '^www\.', ''), '\.+(:\d+)?$', '\1'), ':(80|443)$', '') AS host,
             regexp_replace(u, '^[^/?#]*', '') AS rest
      FROM s1
    ),
    r1 AS (
      SELECT doc_id, url, host,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(
                 regexp_replace(rest, '#.*', ''),
                 '"""
    # ''-doubled for the single-quoted SQL literal (r14 advice fix):
    # re.escape leaves ' unescaped, so a custom tracking-param name
    # containing a quote would otherwise break or alter the oracle SQL.
    # Default params contain no quote, so the spliced text — and the w02
    # oracle hash — is unchanged.
    + tracking_param_regex().replace("'", "''")
    + r"""', '\1', 'g'),
               '&&+', '&', 'g'),
               '\?&', '?'), '[?&]+$', ''), '/$', '') AS rest
      FROM hp
    )
"""
)

_SQL_H32 = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(s), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


def _docs_with_url(spark: SparkSession, sf_dir: str, fmt: str, *args) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.withColumn("url", F.format_string(fmt, *args))


@query(
    "w01_url_normalize",
    oracle=f"""
    WITH u0 AS (SELECT doc_id, {_W01_SQL_URL} AS url FROM documents),
    s1 AS (
      SELECT doc_id, url,
             regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS u
      FROM u0
    ),
    {_SQL_NORM_CTES},
    r2 AS (
      SELECT doc_id, url, host, rest,
             regexp_replace(host, ':[0-9]+$', '') AS mhost
      FROM r1
    )
    SELECT doc_id, url, host || rest AS url_norm,
           CASE WHEN regexp_extract(mhost, '((?:[^.]+\\.)' || '{{1}}' || '[^.]+)$', 1) = ''
                THEN mhost
                ELSE regexp_extract(mhost, '((?:[^.]+\\.)' || '{{1}}' || '[^.]+)$', 1)
           END AS domain
    FROM r2
    """,
    tags=("web", "EXT", "url", "front-door"),
    doc="URL canonicalization (operators.web.url_normalize/registrable_domain_col; the "
    "first stage of RefinedWeb-style web curation — Penedo 2023 runs URL-level filters "
    "before any content pass): scheme and userinfo stripped, authority split at the "
    "first /?# (path-less URLs keep their query out of the host — r13 review fix), "
    "host lowercased with www./trailing-dot/default-port removal, fragment and "
    "tracking params (utm_*/fbclid/gclid by default; tracking_params= widens) dropped, "
    "separators tidied, one trailing slash stripped — ONE scalar regex-chain "
    "projection, zero shuffle; the registrable domain (PSL approximated as the last 2 "
    "labels of the PORT-stripped match host; psl_table= gives exact PSL semantics, see "
    "w06) extracted the same way.  The synthesized URL is deliberately messy so every "
    "rule fires; the oracle re-runs the identical chain in DuckDB regex syntax, with "
    "the tracking pattern built by the SAME tracking_param_regex builder.",
)
def w01_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.web import (
        registrable_domain_col,
        url_normalize_col,
    )

    d = _docs_with_url(
        spark,
        sf_dir,
        _W01_FMT,
        F.col("source"),
        F.col("doc_id") % 37,
        F.col("doc_id") % 11,
        F.col("doc_id"),
    )
    return d.select(
        "doc_id",
        "url",
        url_normalize_col("url").alias("url_norm"),
        registrable_domain_col("url").alias("domain"),
    )


@query(
    "w02_url_dedup",
    oracle=f"""
    WITH u0 AS (
      SELECT doc_id, source, {_W02_SQL_URL} AS url FROM documents
    ),
    keep AS (
      SELECT MIN(doc_id) AS doc_id FROM u0 GROUP BY source, doc_id % 40
    )
    SELECT u0.doc_id, u0.url FROM u0 JOIN keep USING (doc_id)
    """,
    tags=("web", "EXT", "url", "dedup", "front-door"),
    doc="URL-level dedup (operators.web.url_dedup; RefinedWeb's first dedup stage — one "
    "page per canonical URL BEFORE content dedup ever pays shingle shuffles): raw URLs "
    "that differ only by scheme case ('https'/'HTTP') and host case collide after "
    "canonicalization; the survivor is the smallest doc_id.  One scalar normalization + "
    "one map-side-combined groupBy(url_norm) + one semi join.  The oracle groups by the "
    "synthesis parameters — equivalent iff the normalization merges exactly the right "
    "URLs, so over- AND under-canonicalization both hash-mismatch.",
)
def w02_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.web import url_dedup

    d = _docs_with_url(
        spark,
        sf_dir,
        "%s://%s.EXAMPLE.com/p/%d",
        F.when(F.col("doc_id") % 2 == 0, F.lit("https")).otherwise(F.lit("HTTP")),
        F.col("source"),
        F.col("doc_id") % 40,
    )
    return url_dedup(d).select("doc_id", "url")


@query(
    "w03_domain_cap",
    oracle=f"""
    WITH u0 AS (
      SELECT doc_id, {_W0345_SQL_URL} AS url, {_W0345_SQL_DOM} AS domain,
             CAST(doc_id AS VARCHAR) || ':domcap' AS s
      FROM documents
    ),
    h AS (SELECT doc_id, url, domain, ({_SQL_H32}) % {DENOM} AS u FROM u0),
    r AS (
      SELECT doc_id, url,
             ROW_NUMBER() OVER (PARTITION BY domain ORDER BY u ASC, doc_id ASC) AS rn
      FROM h
    )
    SELECT doc_id, url FROM r WHERE rn <= 5
    """,
    tags=("web", "EXT", "url", "sampling", "front-door"),
    doc="Per-domain frequency cap (operators.web.domain_cap, method='exact'): at most "
    "5 documents per registrable domain, selected by a salted portable hash of the id — "
    "deterministic, decorrelated from every other hash gate, and admission order is "
    "hash-fixed (under a FIXED cap a growing domain necessarily evicts its "
    "highest-hash members; scale the cap with the corpus for frozen membership — the "
    "hash_split contract applies to the keep FRACTION).  The exact form "
    "window-ranks within each domain (auditable; a mega-domain's rank is ONE task — the "
    "exact_stratified_split trade), and the approx twin (per-domain count + hash "
    "threshold, zero windows) is the 100 TB path, pytest-verified against the same "
    "expectation.  Cap template spam BEFORE it dominates token mass.",
)
def w03_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.web import domain_cap

    d = _docs_with_url(
        spark,
        sf_dir,
        "https://sub.%s-%d.net/x/%d",
        F.col("source"),
        F.col("doc_id") % 13,
        F.col("doc_id"),
    )
    return domain_cap(d, max_docs=5, salt="domcap").select("doc_id", "url")


@query(
    "w04_domain_stats",
    oracle=f"""
    WITH u0 AS (
      SELECT doc_id, text, {_W0345_SQL_DOM} AS domain FROM documents
    )
    SELECT domain, COUNT(*) AS n_docs, CAST(SUM(length(text)) AS BIGINT) AS n_chars
    FROM u0 GROUP BY domain
    """,
    tags=("web", "EXT", "url", "profiling"),
    doc="Per-domain occupancy report (operators.web.domain_stats): (domain, n_docs, "
    "n_chars) from one map-side-combinable groupBy — output bounded by the domain "
    "count, never corpus-sized.  The observability face of w03's cap: decide the cap "
    "from measured occupancy (the ann_index_report pattern), don't guess it.",
)
def w04_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.web import domain_stats

    d = _docs_with_url(
        spark,
        sf_dir,
        "https://sub.%s-%d.net/x/%d",
        F.col("source"),
        F.col("doc_id") % 13,
        F.col("doc_id"),
    )
    return domain_stats(d, text_col="text")


@query(
    "w05_domain_blocklist",
    oracle=f"""
    WITH u0 AS (
      SELECT doc_id, {_W0345_SQL_URL} AS url, {_W0345_SQL_DOM} AS domain
      FROM documents
    )
    SELECT doc_id, url FROM u0
    WHERE domain <> 'src0-0.net' AND ('sub.' || domain) <> 'sub.src1-1.net'
    """,
    tags=("web", "EXT", "url", "quality"),
    doc="URL blocklist filter (operators.web.domain_blocklist_filter; RefinedWeb applies "
    "a 4.6M-domain blocklist as its very first filter): entries match by registrable "
    "domain ('src0-0.net') OR full normalized host ('sub.src1-1.net') — two broadcast "
    "anti equi-joins against the curation-sized list, no per-row regex scan.",
)
def w05_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.web import domain_blocklist_filter

    d = _docs_with_url(
        spark,
        sf_dir,
        "https://sub.%s-%d.net/x/%d",
        F.col("source"),
        F.col("doc_id") % 13,
        F.col("doc_id"),
    )
    return domain_blocklist_filter(d, ("src0-0.net", "sub.src1-1.net")).select(
        "doc_id", "url"
    )


@query(
    "w06_psl_domain",
    oracle="""
    WITH u0 AS (
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com.au'
                             WHEN 2 THEN 'net' ELSE 'example' END AS sfx
      FROM documents
    )
    SELECT doc_id,
           printf('https://Sub.Site%d.%s/p/%d', doc_id % 50, sfx, doc_id) AS url,
           printf('site%d.%s', doc_id % 50, sfx) AS domain
    FROM u0
    """,
    tags=("web", "EXT", "url", "front-door"),
    doc="PSL-exact registrable domain (operators.web.with_registrable_domain with "
    "psl_table=; Mozilla public-suffix-list algorithm — longest listed suffix wins, "
    "registrable = suffix + one label, unlisted TLDs take the '*' default rule = the "
    "levels approximation): hosts under two-label public suffixes ('co.uk', 'com.au') "
    "resolve to 'site<k>.co.uk', NOT the approximation's 'co.uk' — the r13 verdict's "
    "cap-merging hazard for ccTLD-heavy crawls, closed with a user-supplied suffix "
    "DataFrame.  Scale shape: candidate tails are scalar regex extracts, one BROADCAST "
    "left join per suffix depth (the PSL is ~10k rows, curation-sized), longest-match "
    "via chained whens — zero shuffle, zero windows.  The oracle derives the expected "
    "domain closed-form from the synthesis parameters (the w02 convention), so an "
    "approx fallback on listed suffixes hash-mismatches ('co.uk' != 'site<k>.co.uk').",
)
def w06_psl_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.web import with_registrable_domain

    sfx = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("co.uk"))
        .when(F.col("doc_id") % 4 == 1, F.lit("com.au"))
        .when(F.col("doc_id") % 4 == 2, F.lit("net"))
        .otherwise(F.lit("example"))
    )
    d = table(spark, sf_dir, "documents").withColumn(
        "url",
        F.format_string(
            "https://Sub.Site%d.%s/p/%d", F.col("doc_id") % 50, sfx, F.col("doc_id")
        ),
    )
    psl = local_relation(
        spark,
        [(s,) for s in ("uk", "co.uk", "au", "com.au", "com", "net", "org")],
        "suffix string",
    )
    return with_registrable_domain(d, "url", psl_table=psl).select(
        "doc_id", "url", "domain"
    )


@query(
    "w07_url_dedup_tracking",
    oracle="""
    WITH u0 AS (
      SELECT doc_id, source,
             printf('https://%s.ex.com/p/%d?msclkid=%d&q=%d',
                    source, doc_id % 30, doc_id, doc_id % 7) AS url
      FROM documents
    ),
    keep AS (
      SELECT MIN(doc_id) AS doc_id FROM u0 GROUP BY source, doc_id % 210
    )
    SELECT u0.doc_id, u0.url FROM u0 JOIN keep USING (doc_id)
    """,
    tags=("web", "EXT", "url", "dedup"),
    doc="URL dedup under a WIDENED tracking-parameter set (operators.web.url_dedup with "
    "tracking_params= including msclkid/twclid/igshid — the r14 knob; real crawls carry "
    "far more than utm_*/fbclid/gclid, and every family missed is a duplicate page "
    "surviving w02): each synthesized URL carries a per-document msclkid value plus a "
    "REAL q= parameter, so after stripping the tracker the canonical key is "
    "(source, path, q) == (source, doc_id % 210 by CRT of %30 and %7) — under the "
    "DEFAULT frozen set every URL would stay unique and the oracle's MIN-per-group "
    "would hash-mismatch, so the entry discriminates widened-vs-default exactly.",
)
def w07_url_dedup_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.web import url_dedup

    d = _docs_with_url(
        spark,
        sf_dir,
        "https://%s.ex.com/p/%d?msclkid=%d&q=%d",
        F.col("source"),
        F.col("doc_id") % 30,
        F.col("doc_id"),
        F.col("doc_id") % 7,
    )
    return url_dedup(
        d,
        tracking_params=("utm_*", "fbclid", "gclid", "msclkid", "twclid", "igshid"),
    ).select("doc_id", "url")

"""operators.web: URL/domain curation — normalization rules, URL dedup,
per-domain caps (exact/approx twins + hash stability), blocklist matching,
and the zero-shuffle plan claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _one(spark, url: str):
    from healthcare_data_pipeline_spark.operators.web import (
        registrable_domain_col,
        url_normalize_col,
    )

    r = (
        spark.createDataFrame([(url,)], "url string")
        .select(
            url_normalize_col("url").alias("n"),
            registrable_domain_col("url").alias("d"),
        )
        .head()
    )
    return r.n, r.d


def test_url_normalize_rules(spark):
    cases = {
        # scheme case + WWW + default port + tracking + fragment + host case
        "HTTPS://WWW.Ex.COM:443/Path/?utm_source=a&id=1&utm_medium=b#f": (
            "ex.com/Path/?id=1",
            "ex.com",
        ),
        # http default port; tracking param first; trailing slash
        "http://ex.com:80/a/?utm_x=1&b=2/": ("ex.com/a/?b=2", "ex.com"),
        # non-default port KEPT in the norm; domain strips ANY port (r13
        # review fix: ':8443' must not evade a blocklist); path case kept
        "https://Ex.com:8080/A": ("ex.com:8080/A", "ex.com"),
        # path-less URL with a query/fragment right after the host (r13
        # review fix: '^[^/]*' ran the query into the host, bypassing the
        # blocklist and corrupting every domain key)
        "https://spam.net?ref=1": ("spam.net?ref=1", "spam.net"),
        "https://spam.net#f": ("spam.net", "spam.net"),
        "https://spam.net?utm_a=1": ("spam.net", "spam.net"),
        # userinfo stripped up to the '@'
        "https://user:pw@Ex.com/x": ("ex.com/x", "ex.com"),
        # FQDN trailing dot stripped (also before a port)
        "https://spam.net./x": ("spam.net/x", "spam.net"),
        "https://Ex.com.:443/x": ("ex.com/x", "ex.com"),
        # schemeless input; bare host; one trailing slash stripped
        "ex.com/": ("ex.com", "ex.com"),
        # fbclid/gclid dropped wherever they sit; '?&' tidied
        "https://a.b.ex.com/p?fbclid=x&q=1&gclid=y": ("a.b.ex.com/p?q=1", "ex.com"),
        # all params tracking -> bare path, trailing '?' stripped
        "https://ex.com/p?utm_a=1&utm_b=2": ("ex.com/p", "ex.com"),
        # no dot in host -> domain is the host itself
        "https://localhost/x": ("localhost/x", "localhost"),
        # BOUNDARY regression (r13 review): params whose NAME merely
        # CONTAINS a tracking token must survive untouched — the old
        # pattern matched mid-name and merged distinct pages
        "https://ex.com/p?myutm_x=1&a=2": ("ex.com/p?myutm_x=1&a=2", "ex.com"),
        "https://ex.com/p?xfbclid=5": ("ex.com/p?xfbclid=5", "ex.com"),
        "https://ex.com/p?registration_gclid=7&q=1": (
            "ex.com/p?registration_gclid=7&q=1",
            "ex.com",
        ),
        # consecutive tracking params all drop; separators tidy
        "https://ex.com/p?utm_a=1&utm_b=2&c=3": ("ex.com/p?c=3", "ex.com"),
        "https://ex.com/p?a=1&utm_x=2&b=3": ("ex.com/p?a=1&b=3", "ex.com"),
    }
    for url, (want_norm, want_dom) in cases.items():
        norm, dom = _one(spark, url)
        assert norm == want_norm, f"{url}: {norm!r} != {want_norm!r}"
        assert dom == want_dom, f"{url}: {dom!r} != {want_dom!r}"


def test_registrable_domain_levels(spark):
    from healthcare_data_pipeline_spark.operators.web import registrable_domain_col

    df = spark.createDataFrame([("https://a.b.co.uk/x",)], "url string")
    assert df.select(registrable_domain_col("url", levels=3).alias("d")).head().d == "b.co.uk"
    assert df.select(registrable_domain_col("url", levels=2).alias("d")).head().d == "co.uk"
    with pytest.raises(ValueError, match="levels"):
        registrable_domain_col("url", levels=0)


def test_url_dedup_keeps_min_id_across_scheme_variants(spark):
    from healthcare_data_pipeline_spark.operators.web import url_dedup

    rows = [
        (1, "https://WWW.ex.com/a"),
        (2, "HTTP://ex.com:80/a"),  # same canonical URL as 1 and 3
        (3, "ex.com/a"),
        (4, "https://ex.com/b"),
    ]
    out = url_dedup(spark.createDataFrame(rows, "doc_id long, url string"))
    assert sorted(r.doc_id for r in out.collect()) == [1, 4]


def _domain_corpus(spark, n=400, n_domains=8):
    return spark.createDataFrame(
        [(i, f"https://sub.d{i % n_domains}.net/x/{i}") for i in range(n)],
        "doc_id long, url string",
    )


def test_domain_cap_exact_is_capped_deterministic_and_growth_stable(spark):
    from healthcare_data_pipeline_spark.operators.web import domain_cap

    d = _domain_corpus(spark)
    out = domain_cap(d, max_docs=5)
    per = (
        out.withColumn("dom", F.regexp_extract("url", r"(d\d+\.net)", 1))
        .groupBy("dom")
        .count()
        .collect()
    )
    assert len(per) == 8 and all(r["count"] == 5 for r in per)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, domain_cap(d, max_docs=5).collect())
    )
    # under-cap domains keep everything
    assert domain_cap(d, max_docs=1000).count() == 400
    with pytest.raises(ValueError, match="max_docs"):
        domain_cap(d, max_docs=0)
    with pytest.raises(ValueError, match="method"):
        domain_cap(d, max_docs=5, method="nope")


def test_domain_cap_approx_expectation_and_stability(spark):
    from healthcare_data_pipeline_spark.operators.web import domain_cap

    d = _domain_corpus(spark, n=800, n_domains=4)  # 200 docs/domain
    out = domain_cap(d, max_docs=50, method="approx")
    per = (
        out.withColumn("dom", F.regexp_extract("url", r"(d\d+\.net)", 1))
        .groupBy("dom")
        .count()
        .collect()
    )
    # ~50 per domain in expectation; generous band (binomial sd ~6.6)
    assert len(per) == 4 and all(25 <= r["count"] <= 80 for r in per), per
    # under-cap domains keep everything (threshold caps at the hash space)
    assert domain_cap(d, max_docs=10_000, method="approx").count() == 800
    # hash stability: a doc kept from the subset stays kept in the superset
    # with the same per-domain keep-fraction (cap scaled with corpus size)
    half = d.filter(F.col("doc_id") < 400)  # 100 docs/domain
    kept_half = {r.doc_id for r in domain_cap(half, max_docs=25, method="approx").collect()}
    kept_full = {r.doc_id for r in domain_cap(d, max_docs=50, method="approx").collect()}
    assert kept_half <= kept_full


def test_domain_blocklist_matches_domain_and_host(spark):
    from healthcare_data_pipeline_spark.operators.web import domain_blocklist_filter

    rows = [
        (1, "https://www.spam.net/x"),  # domain match (spam.net)
        (2, "https://sub.spam.net/x"),  # domain match via levels=2
        (3, "https://Bad.Host.ex.com/x"),  # host match (case-folded)
        (4, "https://ok.ex.com/x"),
        (5, "https://fine.org/x"),
    ]
    out = domain_blocklist_filter(
        spark.createDataFrame(rows, "doc_id long, url string"),
        ("spam.net", "BAD.host.ex.com"),
    )
    assert sorted(r.doc_id for r in out.collect()) == [4, 5]


def test_blocklist_evasion_variants_all_match(spark):
    """r13 review fixes end-to-end: explicit non-default port, FQDN trailing
    dot, and a path-less ?query must NOT evade a 'spam.net' entry — in the
    batch anti join AND the streaming closure predicate identically."""
    from healthcare_data_pipeline_spark.operators.web import (
        domain_blocklist_filter,
        domain_blocklist_predicate,
    )

    rows = [
        (1, "https://spam.net:8443/x"),
        (2, "https://spam.net./x"),
        (3, "https://spam.net?ref=1"),
        (4, "https://user@spam.net/x"),
        (5, "https://sub.spam.net.:8080?a=1"),
        (6, "https://fine.org/x"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, url string")
    batch = {r.doc_id for r in domain_blocklist_filter(d, ("spam.net",)).collect()}
    stream = {
        r.doc_id for r in d.filter(domain_blocklist_predicate(("spam.net",))).collect()
    }
    assert batch == stream == {6}


def test_tracking_params_parameter_and_oracle_lockstep(spark):
    """tracking_params= widens the stripped set (default frozen at the r13
    three families); the DuckDB oracle built from the SAME
    tracking_param_regex builder produces identical norms, and the r13
    [?&]-boundary regression holds for custom names too."""
    import duckdb
    import pytest

    from healthcare_data_pipeline_spark.operators.web import (
        tracking_param_regex,
        url_normalize_col,
    )

    extra = ("utm_*", "fbclid", "gclid", "msclkid", "twclid", "igshid", "mc_eid", "ref_src")
    cases = [
        "https://ex.com/p?msclkid=1&q=2",
        "https://ex.com/p?q=2&twclid=x",
        "https://ex.com/p?igshid=a&mc_eid=b&ref_src=c",
        "https://ex.com/p?mymsclkid=1&q=2",  # boundary: name merely contains
        "https://ex.com/p?ref_srcx=1",  # no prefix wildcard -> kept
        "https://spam.net?msclkid=1",
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r.url: r.n
        for r in df.select("url", url_normalize_col("url", extra).alias("n")).collect()
    }
    # default params unchanged: msclkid survives the default set
    default = df.select(url_normalize_col("url").alias("n")).collect()
    assert any("msclkid" in r.n for r in default)
    assert got["https://ex.com/p?msclkid=1&q=2"] == "ex.com/p?q=2"
    assert got["https://ex.com/p?mymsclkid=1&q=2"] == "ex.com/p?mymsclkid=1&q=2"
    assert got["https://ex.com/p?ref_srcx=1"] == "ex.com/p?ref_srcx=1"
    assert got["https://spam.net?msclkid=1"] == "spam.net"
    # oracle lockstep: the same builder's pattern in DuckDB gives the same norm
    pat = tracking_param_regex(extra)
    con = duckdb.connect()
    for url, want in got.items():
        rest = con.execute(
            r"""
            WITH s1 AS (SELECT regexp_replace(?, '^[A-Za-z][A-Za-z0-9+.\-]*://', '') AS u),
            hp AS (
              SELECT regexp_replace(regexp_replace(regexp_replace(
                       lower(regexp_replace(regexp_extract(u, '^[^/?#]*'), '^.*@', '')),
                       '^www\.', ''), '\.+(:\d+)?$', '\1'), ':(80|443)$', '') AS host,
                     regexp_replace(u, '^[^/?#]*', '') AS rest
              FROM s1
            )
            SELECT host || regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(regexp_replace(rest, '#.*', ''), ?, '\1', 'g'),
                     '&&+', '&', 'g'), '\?&', '?'), '[?&]+$', ''), '/$', '')
            FROM hp
            """,
            [url, pat],
        ).fetchone()[0]
        assert rest == want, (url, rest, want)
    con.close()
    with pytest.raises(ValueError, match="tracking"):
        tracking_param_regex(())
    with pytest.raises(ValueError, match="bad tracking"):
        tracking_param_regex(("*",))


def _psl(spark):
    return spark.createDataFrame(
        [(s,) for s in ("uk", "co.uk", "com.au", "au", "com", "net")], "suffix string"
    )


def test_psl_registrable_domain_longest_match(spark):
    """with_registrable_domain(psl_table=): longest listed suffix + one label
    (Mozilla PSL algorithm); unlisted TLDs take the levels fallback; a host
    that IS a bare suffix degenerates to itself; ports/dots never leak in."""
    from healthcare_data_pipeline_spark.operators.web import with_registrable_domain

    cases = {
        "https://a.b.co.uk/x": "b.co.uk",
        "https://shop.example.co.uk/x": "example.co.uk",
        "https://WWW.site.com.au:8080/x": "site.com.au",
        "https://deep.sub.tree.host.co.uk/x": "host.co.uk",
        "https://ex.com/x": "ex.com",
        "https://co.uk/x": "co.uk",  # bare public suffix degenerates
        "https://a.b.example/x": "b.example",  # unlisted TLD -> levels=2 fallback
        "https://localhost/x": "localhost",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    out = with_registrable_domain(df, "url", psl_table=_psl(spark))
    got = {r.url: r.domain for r in out.collect()}
    assert got == cases
    # without psl_table the approximation is unchanged (w01-w05 oracles frozen)
    approx = with_registrable_domain(df, "url")
    assert {r.url: r.domain for r in approx.collect()}["https://a.b.co.uk/x"] == "co.uk"


def test_psl_domain_cap_and_blocklist_separate_cctld_sites(spark):
    """The r13 verdict hazard: under levels=2, every *.co.uk site shares one
    'co.uk' pseudo-domain — a cap squeezes unrelated sites against each
    other and a blocklist entry can't name one site.  psl_table= fixes both;
    the levels default still shows the merge (pinning WHY psl exists)."""
    from healthcare_data_pipeline_spark.operators.web import (
        domain_blocklist_filter,
        domain_cap,
        domain_stats,
    )

    rows = [
        (i, f"https://site{i % 4}.co.uk/p/{i}") for i in range(80)
    ]  # 4 distinct registrable domains, 20 docs each
    d = spark.createDataFrame(rows, "doc_id long, url string")
    psl = _psl(spark)
    # approx: ONE pseudo-domain 'co.uk' -> cap 10 keeps 10 total
    assert domain_cap(d, max_docs=10).count() == 10
    # psl: four real domains -> cap 10 keeps 40
    assert domain_cap(d, max_docs=10, psl_table=psl).count() == 40
    stats = {r.domain: r.n_docs for r in domain_stats(d, psl_table=psl).collect()}
    assert stats == {f"site{k}.co.uk": 20 for k in range(4)}
    # blocklist one site without nuking the suffix
    kept = domain_blocklist_filter(d, ("site0.co.uk",), psl_table=psl)
    assert kept.count() == 60
    assert not [r for r in kept.collect() if "site0" in r.url]


def test_psl_join_is_broadcast_no_shuffle(spark):
    """The PSL path must be FULLY exchange-free: the suffix list collects
    once through the size gate (dedup happens driver-side — a duplicate
    suffix row would otherwise fan out the left joins) and each depth
    broadcast-joins a LocalTableScan; the corpus side never shuffles.  An
    oversized 'psl' table raises instead of collecting."""
    import pytest

    from healthcare_data_pipeline_spark.operators import web
    from healthcare_data_pipeline_spark.operators.web import with_registrable_domain

    d = spark.createDataFrame(
        [(i, f"https://s{i}.co.uk/x") for i in range(50)], "doc_id long, url string"
    )
    out = with_registrable_domain(d, "url", psl_table=_psl(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    big = spark.range(web._MAX_PSL_SUFFIXES + 10).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("suffix")
    )
    with pytest.raises(ValueError, match="public-suffix"):
        with_registrable_domain(d, "url", psl_table=big)


def test_url_normalize_is_zero_shuffle(spark):
    from healthcare_data_pipeline_spark.operators.web import url_normalize

    d = _domain_corpus(spark, n=50)
    plan = url_normalize(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_prep_corpus_web_stages_compose(spark):
    """prep_corpus(url_col=...) runs blocklist + URL dedup FIRST and the
    per-domain cap after dedup: a blocked domain vanishes entirely, URL
    duplicates collapse to the min-id copy before content stages, remaining
    domains respect the cap, and the knobs demand url_col."""
    import pytest
    from pyspark.sql import functions as F

    from healthcare_data_pipeline_spark.operators.quality import prep_corpus

    rows = []
    for i in range(120):
        dom = f"d{i % 3}.net"
        # distinct natural text per doc (no content dups except via URL)
        text = " ".join(f"tok{i}x{j} the of and" for j in range(10))
        rows.append((i, text, "web", f"https://{dom}/p/{i % 60}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, url string")

    out = prep_corpus(
        docs,
        min_stopword_ratio=None,
        url_col="url",
        use_url_dedup=True,
        domain_blocklist=("d0.net",),
        max_docs_per_domain=10,
        domain_cap_method="exact",
    )
    got = out.withColumn(
        "dom", F.regexp_extract("url", r"(d\d+\.net)", 1)
    ).groupBy("dom").count().collect()
    doms = {r.dom: r["count"] for r in got}
    assert "d0.net" not in doms  # blocklisted domain gone entirely
    # URL dedup collapsed each /p/<i%60> to one doc BEFORE the cap; caps hold
    assert set(doms) == {"d1.net", "d2.net"} and all(c <= 10 for c in doms.values())
    # URL dedup kept min-id copies: every surviving doc_id is < 60
    assert out.agg(F.max("doc_id")).first()[0] < 60

    with pytest.raises(ValueError, match="url_col"):
        prep_corpus(docs, min_stopword_ratio=None, use_url_dedup=True)


def test_dedup_weights_modes(spark):
    """dedup_weights: survivor mode keeps min-id with dup_count; downweight
    mode keeps every copy with weight = 1/dup_count (token mass per unique
    doc equal in expectation); invalid mode raises."""
    import pytest

    from healthcare_data_pipeline_spark.operators.dedup_corpus import dedup_weights

    rows = [
        (1, "the   Quick brown fox"),
        (2, "the quick BROWN fox "),  # same normalized fingerprint as 1
        (3, "the quick brown fox"),   # and as 2
        (4, "something else entirely"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    surv = {r.doc_id: r for r in dedup_weights(d).collect()}
    assert set(surv) == {1, 4}
    assert surv[1].dup_count == 3 and surv[1].weight == 1.0
    assert surv[4].dup_count == 1

    down = {r.doc_id: r for r in dedup_weights(d, mode="downweight").collect()}
    assert set(down) == {1, 2, 3, 4}
    assert down[2].weight == down[1].weight == 1.0 / 3
    assert down[4].weight == 1.0
    with pytest.raises(ValueError, match="mode"):
        dedup_weights(d, mode="nope")


def test_null_urls_pass_through_every_web_op(spark):
    """NULL url = missing provenance, not duplication evidence (r13 review):
    url_dedup must not collapse all NULL-url docs into one survivor,
    domain_cap must not cap them as a pseudo-domain, and the streaming
    blocklist predicate must keep them exactly like the batch anti join."""
    from healthcare_data_pipeline_spark.operators.web import (
        domain_blocklist_filter,
        domain_blocklist_predicate,
        domain_cap,
        url_dedup,
    )

    rows = [(i, "https://d0.net/x" if i < 4 else None) for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id long, url string")

    # url_dedup: the 4 identical URLs collapse to doc 0; all 6 NULLs survive
    assert sorted(r.doc_id for r in url_dedup(d).collect()) == [0, 4, 5, 6, 7, 8, 9]
    # domain_cap: cap 2 applies to d0.net only; NULLs pass through uncapped
    for method in ("exact", "approx"):
        out = domain_cap(d, max_docs=2, method=method).collect()
        nulls = [r.doc_id for r in out if r.url is None]
        assert sorted(nulls) == [4, 5, 6, 7, 8, 9], (method, out)
        assert len([r for r in out if r.url is not None]) <= 2
    # blocklist: batch and stream forms agree — NULLs KEEP in both
    batch = {r.doc_id for r in domain_blocklist_filter(d, ("d0.net",)).collect()}
    stream = {
        r.doc_id
        for r in d.filter(domain_blocklist_predicate(("d0.net",))).collect()
    }
    assert batch == stream == {4, 5, 6, 7, 8, 9}


def test_prep_corpus_psl_and_tracking_knobs(spark):
    """r14 front-door threading: domain_psl_table keys the blocklist + cap
    on REAL registrable domains (one *.co.uk site blockable/cappable without
    nuking the suffix), and url_tracking_params widens what URL dedup
    strips (msclkid twins collapse)."""
    from pyspark.sql import functions as F

    from healthcare_data_pipeline_spark.operators.quality import prep_corpus

    rows = []
    for i in range(120):
        text = " ".join(f"tok{i}x{j} the of and" for j in range(10))
        # every odd doc is its even predecessor's msclkid twin (same page,
        # same site — site keyed on the PAGE so the pair shares its host)
        page = i - (i % 2)
        site = f"site{page % 3}.co.uk"
        url = f"https://{site}/p/{page}" + ("?msclkid=z" if i % 2 else "")
        rows.append((i, text, "web", url))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, url string")
    psl = _psl(spark)

    out = prep_corpus(
        docs,
        min_stopword_ratio=None,
        url_col="url",
        use_url_dedup=True,
        url_tracking_params=("utm_*", "fbclid", "gclid", "msclkid"),
        domain_blocklist=("site0.co.uk",),
        max_docs_per_domain=10,
        domain_cap_method="exact",
        domain_psl_table=psl,
    )
    got = (
        out.withColumn("dom", F.regexp_extract("url", r"(site\d+\.co\.uk)", 1))
        .groupBy("dom")
        .count()
        .collect()
    )
    doms = {r.dom: r["count"] for r in got}
    # psl blocklist kills ONE site, not the whole co.uk suffix
    assert "site0.co.uk" not in doms and set(doms) == {"site1.co.uk", "site2.co.uk"}
    # msclkid twins collapsed (min-id survivor is the even doc) BEFORE the cap
    assert out.filter(F.col("doc_id") % 2 == 1).count() == 0
    # psl cap applies per SITE (10 each), not one shared co.uk pseudo-domain
    assert all(c <= 10 for c in doms.values()) and sum(doms.values()) > 10


def test_registrable_domain_literal_matches_join_form(spark):
    """registrable_domain_literal_col (the streaming-closure PSL twin) must
    agree with with_registrable_domain(psl_table=) on every host shape:
    listed 2-label suffix, nested subdomains, bare suffix, unlisted TLD
    fallback, ports/dots/case."""
    from healthcare_data_pipeline_spark.operators.web import (
        registrable_domain_literal_col,
        with_registrable_domain,
    )

    urls = [
        "https://a.b.co.uk/x",
        "https://shop.example.co.uk/x",
        "https://WWW.site.com.au:8080/x",
        "https://deep.sub.tree.host.co.uk/x",
        "https://ex.com/x",
        "https://co.uk/x",
        "https://a.b.example/x",
        "https://localhost/x",
        "https://spam.net./x",
        "https://u@spam.net:8443?q=1",
    ]
    suffixes = ("uk", "co.uk", "com.au", "au", "com", "net")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    joined = with_registrable_domain(
        df,
        "url",
        psl_table=spark.createDataFrame([(s,) for s in suffixes], "suffix string"),
    )
    lit = df.withColumn(
        "domain", registrable_domain_literal_col("url", suffixes)
    )
    assert {(r.url, r.domain) for r in joined.collect()} == {
        (r.url, r.domain) for r in lit.collect()
    }
    with pytest.raises(ValueError, match="suffix"):
        registrable_domain_literal_col("url", ())


def test_prep_stream_psl_blocklist_equals_batch(spark, tmp_path):
    """PSL-keyed blocklist parity: the streaming literal-closure gate keeps
    doc-for-doc what the batch psl_table anti join keeps — one *.co.uk site
    blocked without nuking the suffix, NULL provenance passing both."""
    from healthcare_data_pipeline_spark.operators.web import (
        domain_blocklist_filter,
        domain_blocklist_predicate,
    )

    # subdomained hosts: the host match can't catch these (host != entry),
    # so only the PSL registrable-domain key blocks the site
    rows = [
        (i, f"https://sub{i}.site{i % 3}.co.uk/p/{i}" if i % 10 else None)
        for i in range(60)
    ]
    d = spark.createDataFrame(rows, "doc_id long, url string")
    suffixes = ("uk", "co.uk", "com", "net")
    psl = spark.createDataFrame([(s,) for s in suffixes], "suffix string")
    batch = {
        r.doc_id
        for r in domain_blocklist_filter(d, ("site0.co.uk",), psl_table=psl).collect()
    }
    stream_pred = {
        r.doc_id
        for r in d.filter(
            domain_blocklist_predicate(("site0.co.uk",), psl_suffixes=suffixes)
        ).collect()
    }
    assert batch == stream_pred
    # the block actually bit: site0 gone, site1/site2 + NULLs kept
    assert all(i % 3 != 0 or i % 10 == 0 for i in batch)
    assert {i for i in range(60) if i % 10 == 0} <= batch
    # WITHOUT psl the approx key ('co.uk') matches nothing on the blocklist
    # (the blocklist names a SITE) — documenting why the psl form exists
    no_psl = d.filter(domain_blocklist_predicate(("site0.co.uk",))).count()
    assert no_psl == 60

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
        # non-default port KEPT; path case preserved
        "https://Ex.com:8080/A": ("ex.com:8080/A", "ex.com:8080"),
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

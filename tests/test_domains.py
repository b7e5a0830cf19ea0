"""Domain-curation operators (operators/domains.py): eTLD+1 rule,
suffix-chain blocklist semantics, deterministic per-domain caps,
share accounting — plus plan pins for the map-only claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def urls(spark):
    rows = [
        (1, "https://www.news.example.co.uk/p/1?ref=rss", "one two three"),
        (2, "https://cdn.example.com:8443/assets/x.js", "four five"),
        (3, "https://example.com/p/3", "six"),
        (4, "https://bad.tracker.net/p/4", "seven eight nine ten"),
        (5, "https://sub.bad.tracker.net/p/5", "eleven"),
        (6, "https://goodtracker.net/p/6", "twelve thirteen"),
        (7, "https://api.data.gov.uk/p/7", "fourteen"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_registrable_domain_etld_plus_one(spark, urls):
    from etl_global_mobility_spark.operators.domains import extract_url_parts

    got = {r["doc_id"]: r for r in extract_url_parts(urls).collect()}
    assert got[1]["host"] == "www.news.example.co.uk"
    assert got[1]["domain"] == "example.co.uk"  # multi-part suffix
    assert got[1]["tld"] == "uk"
    assert got[1]["path"] == "/p/1"
    assert got[2]["host"] == "cdn.example.com"  # port stripped
    assert got[2]["domain"] == "example.com"
    assert got[2]["path"] == "/assets/x.js"
    assert got[3]["domain"] == "example.com"  # bare registrable domain
    assert got[7]["domain"] == "data.gov.uk"


def test_blocklist_subdomain_semantics_and_no_substring_leak(spark, urls):
    """`tracker.net` must block the host itself and every subdomain,
    but NOT `goodtracker.net` (suffix-chain matching is label-aligned,
    unlike a naive endswith)."""
    from etl_global_mobility_spark.operators.domains import (
        domain_blocklist_filter,
    )

    kept = {
        r["doc_id"]
        for r in domain_blocklist_filter(urls, ["tracker.net"]).collect()
    }
    assert kept == {1, 2, 3, 6, 7}
    blocked = {
        r["doc_id"]
        for r in domain_blocklist_filter(
            urls, ["tracker.net"], invert=True
        ).collect()
    }
    assert blocked == {4, 5}
    with pytest.raises(ValueError, match="empty blocklist"):
        domain_blocklist_filter(urls, [])


def test_blocklist_and_extract_plans_are_map_only(spark, urls):
    """The 100 TB claim: URL parsing and blocklist filtering add ZERO
    exchanges and ZERO joins — the blocklist rides as a literal."""
    from etl_global_mobility_spark.operators.domains import (
        domain_blocklist_filter,
        extract_url_parts,
    )

    for df in (
        extract_url_parts(urls),
        domain_blocklist_filter(urls, ["tracker.net", "x.org"]),
    ):
        plan = _plan(df)
        assert "Exchange" not in plan, plan
        assert "Join" not in plan, plan


def test_cap_per_domain_deterministic_and_bounded(spark):
    from etl_global_mobility_spark.operators.domains import cap_per_domain

    rows = [
        (i, f"https://{'www.' if i % 2 else ''}site{i % 3}.com/p/{i}", "t")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    capped = cap_per_domain(df, max_docs=4)
    out = capped.groupBy("domain").count().collect()
    assert {r["domain"] for r in out} == {"site0.com", "site1.com", "site2.com"}
    assert all(r["count"] == 4 for r in out)
    # deterministic + partition-layout-invariant
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(
        r["doc_id"] for r in cap_per_domain(df.repartition(7), 4).collect()
    )
    assert a == b
    # map-side group-limit prune before the exchange
    assert "WindowGroupLimit" in _plan(capped)


def test_domain_report_shares_sum_to_one(spark, urls):
    from etl_global_mobility_spark.operators.domains import domain_report

    rep = domain_report(urls).collect()
    assert abs(sum(r["doc_share"] for r in rep) - 1.0) < 1e-12
    assert abs(sum(r["token_share"] for r in rep) - 1.0) < 1e-12
    by_dom = {r["domain"]: r for r in rep}
    assert by_dom["example.com"]["n_docs"] == 2
    assert by_dom["example.com"]["sum_tokens"] == 3  # "four five" + "six"
    plan = _plan(domain_report(urls))
    assert "BroadcastExchange" in plan  # 1-row totals, never a sort-merge
    assert "CartesianProduct" not in plan


def test_host_suffix_chain_is_label_aligned(spark):
    from etl_global_mobility_spark.operators.domains import host_suffix_chain

    row = (
        spark.range(1)
        .select(host_suffix_chain(F.lit("a.b.example.com")).alias("c"))
        .first()
    )
    assert row["c"] == ["a.b.example.com", "b.example.com", "example.com", "com"]

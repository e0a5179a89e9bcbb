"""Web-corpus curation: URL canonicalization, URL dedup, domain stats.

Oracles are independent Python recomputations (urllib-based
canonicalizer) over the same rows.
"""

from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from quickwit_spark.datapipe.webpipe import (
    canonicalize_url,
    domain_stats,
    host_of,
    url_dedup,
)

MESSY = [
    (0, "https://site1.example/p/1", "aaaa"),
    (1, "HTTPS://SITE1.EXAMPLE/p/1", "bbbb"),
    (2, "https://site1.example:443/p/1", "cc"),
    (3, "https://site1.example/p/1?utm_source=feed&utm_campaign=c", "dd"),
    (4, "https://site1.example/p/1?utm_medium=rss", "e"),
    (5, "https://site1.example/p/1#frag", "f"),
    (6, "https://site1.example/p/1?real=1&utm_x=2", "gg"),
    (7, "https://site1.example/p/1?utm_x=2&real=1", "hh"),
    (8, "http://www.site2.example:80/q?a=1#x", "iii"),
    (9, "http://site3.example:8080/odd", "j"),
]


def py_canonical(u: str) -> str:
    """Independent oracle: urllib-decomposed canonicalization."""
    parts = urlsplit(u)
    scheme = parts.scheme.lower()
    host = parts.netloc.lower()
    if scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    q = "&".join(
        p for p in parts.query.split("&") if p and not p.startswith("utm_")
    )
    return scheme + "://" + host + parts.path + ("?" + q if q else "")


@pytest.fixture(scope="module")
def messy(spark):
    return spark.createDataFrame(MESSY, "k int, url string, text string")


def test_canonicalize_matches_urllib_oracle(messy):
    got = {
        r["url"]: r["canonical_url"]
        for r in canonicalize_url(messy).select("url", "canonical_url").collect()
    }
    for _, u, _ in MESSY:
        assert got[u] == py_canonical(u), u


def test_host_strips_www_port_case(messy):
    hosts = {
        r["k"]: r["host"] for r in host_of(messy).select("k", "host").collect()
    }
    assert hosts[1] == "site1.example"  # uppercased input
    assert hosts[8] == "site2.example"  # www. + :80 stripped
    assert hosts[9] == "site3.example"  # non-default port stripped from host


def test_url_dedup_groups_all_spellings(messy):
    rows = url_dedup(messy, "k").select("k", "url_group", "is_url_dup").collect()
    by_k = {r["k"]: r for r in rows}
    # k=0..5 are all spellings of the same page; 0 is the representative
    for k in range(6):
        assert by_k[k]["url_group"] == 0
        assert by_k[k]["is_url_dup"] == (k != 0)
    # ?real=1 spellings form their own group
    assert by_k[6]["url_group"] == 6 and not by_k[6]["is_url_dup"]
    assert by_k[7]["url_group"] == 6 and by_k[7]["is_url_dup"]
    # the non-default port survives canonicalization -> unique
    assert by_k[9]["url_group"] == 9 and not by_k[9]["is_url_dup"]


def test_domain_stats_counts_and_chars(messy):
    rows = {r["host"]: r for r in domain_stats(messy).collect()}
    assert rows["site1.example"]["doc_count"] == 8
    assert rows["site1.example"]["total_chars"] == sum(
        len(t) for _, u, t in MESSY if "site1" in u.lower()
    )
    assert rows["site2.example"]["doc_count"] == 1
    assert rows["site3.example"]["mean_chars"] == 1.0


def test_domain_stats_plan_is_hash_aggregate(messy):
    # partial/final hash agg, no window/collect on the stats path
    plan = domain_stats(messy)._sc is not None and domain_stats(
        messy
    )._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "Window" not in plan

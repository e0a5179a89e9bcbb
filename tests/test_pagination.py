"""search_after cursors: BM25 pages (kernel cutoff pushdown) and
field-sort pages; wildcard expansion caps + prefix pushdown."""

import pytest
from pyspark.sql import functions as F

from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.query.ast import FullText, Term, Wildcard
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.sources.corpus import web_corpus


@pytest.fixture(scope="module")
def idx(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pageidx"))
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("url", "lang", "n_chars"),
        time_column="warc_ts",
    )
    corpus = web_corpus(spark, sf_dir).withColumn("n_chars", F.length("text"))
    build_index(spark, corpus, d, cfg, job_id="p")
    return d


def _pages_equal_full_rank(s, q, mode):
    full = [
        (r["doc_key"], r["score"]) for r in s.search(q, k=30, mode=mode).collect()
    ]
    page1 = [(r["doc_key"], r["score"]) for r in s.search(q, k=10, mode=mode).collect()]
    assert page1 == full[:10]
    cursor = (page1[-1][1], page1[-1][0])
    page2 = [
        (r["doc_key"], r["score"])
        for r in s.search(q, k=10, mode=mode, search_after=cursor).collect()
    ]
    assert page2 == full[10:20], f"page2 mismatch ({mode})"
    cursor = (page2[-1][1], page2[-1][0])
    page3 = [
        (r["doc_key"], r["score"])
        for r in s.search(q, k=10, mode=mode, search_after=cursor).collect()
    ]
    assert page3 == full[20:30], f"page3 mismatch ({mode})"


def test_search_after_pages(spark, idx):
    s = IndexSearcher(spark, idx)
    for mode in ("parity", "oracle"):
        _pages_equal_full_rank(s, FullText("text", "spark data", "or"), mode)
    # hot term: many ties — cutoff keeps all cursor-score ties
    _pages_equal_full_rank(s, Term("text", "the"), "parity")


def test_sort_by_field_pages(spark, idx):
    s = IndexSearcher(spark, idx)
    q = Term("text", "spark")
    for desc in (True, False):
        full = [
            (r["doc_key"], r["sort_value"])
            for r in s.sort_by_field(
                q, "n_chars", k=30, descending=desc, tie_by_key=True
            ).collect()
        ]
        page1 = full[:10]
        cursor = (page1[-1][1], page1[-1][0])
        page2 = [
            (r["doc_key"], r["sort_value"])
            for r in s.sort_by_field(
                q, "n_chars", k=10, descending=desc, search_after=cursor
            ).collect()
        ]
        assert page2 == full[10:20], f"descending={desc}"


def test_wildcard_max_expansions(spark, idx):
    s = IndexSearcher(spark, idx)
    # uncapped vs capped: cap keeps the first N in term order
    all_terms = [r["term"] for r in s.list_terms("text", "s", "t", limit=10000).collect()]
    expanded = s._expand_patterns(Wildcard("text", "s*"), s.live_ids)
    assert list(expanded.values) == all_terms
    capped = s._expand_patterns(
        Wildcard("text", "s*", max_expansions=3), s.live_ids
    )
    assert list(capped.values) == all_terms[:3]
    # capped query still answers (subset semantics, reference behavior)
    hits = s.search(Wildcard("text", "spar?"), k=5).collect()
    assert len(hits) == 5


def test_regex_literal_prefix():
    from quickwit_spark.search.engine import _regex_literal_prefix as lp

    assert lp("spark.*") == "spark"
    assert lp("spa[rk]+") == "spa"
    assert lp("s|t") == ""  # alternation may bypass a leading literal
    assert lp(r"foo\.bar") == "foo.bar"
    assert lp(r"ab?c") == "a"
    assert lp(r"\d+") == ""
    assert lp("plain") == "plain"


def test_two_key_sort(spark, sf_dir, tmp_path_factory):
    import tempfile

    from pyspark.sql import functions as F

    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.corpus import web_corpus

    idx = tempfile.mkdtemp(prefix="qws_2key_")
    docs = (
        web_corpus(spark, sf_dir)
        .withColumn("grp", (F.col("doc_id") % 5))
        .withColumn("n_chars", F.length("text"))
    )
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("grp", "n_chars"),
    )
    build_index(spark, docs, idx, cfg)
    s = IndexSearcher(spark, idx)
    out = s.sort_by_field(
        "text:spark", [("grp", False), ("n_chars", True)], k=20, tie_by_key=True
    ).collect()
    assert out[0]["rank"] == 1
    # primary asc ⇒ doc_key tie-break asc
    keys = [(r["sort_value"], -r["sort_value2"], r["doc_key"]) for r in out]
    assert keys == sorted(keys)
    # third key would exceed the reference's collector limit
    import pytest as _pytest

    with _pytest.raises(ValueError):
        s.sort_by_field("text:spark", [("grp", False), ("n_chars", True), ("doc_id", True)], k=5)

def test_two_key_search_after(spark, sf_dir):
    """Two-key cursor pagination: pages concatenate to the full ranking
    (reference cursors over BOTH sort values, search.proto:240-243)."""
    import tempfile

    from pyspark.sql import functions as F

    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.corpus import web_corpus

    idx = tempfile.mkdtemp(prefix="qws_2key_sa_")
    docs = (
        web_corpus(spark, sf_dir)
        .withColumn("grp", (F.col("doc_id") % 5))
        .withColumn("n_chars", F.length("text"))
    )
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("grp", "n_chars"),
    )
    build_index(spark, docs, idx, cfg)
    s = IndexSearcher(spark, idx)
    specs = [("grp", False), ("n_chars", True)]
    full = s.sort_by_field("text:spark", specs, k=30, tie_by_key=True).collect()
    paged = []
    cursor = None
    while len(paged) < len(full):
        page = s.sort_by_field(
            "text:spark", specs, k=10,
            **({"search_after": cursor} if cursor else {"tie_by_key": True}),
        ).collect()
        if not page:
            break
        paged.extend(page)
        last = page[-1]
        cursor = (last["sort_value"], last["sort_value2"], last["doc_key"])
    got = [(r["sort_value"], r["sort_value2"], r["doc_key"]) for r in paged[:30]]
    exp = [(r["sort_value"], r["sort_value2"], r["doc_key"]) for r in full]
    assert got == exp
    # wrong cursor arity fails loudly (len == n_specs is VALID — the
    # ES values-only cursor; len == n_specs+1 adds the doc_key tiebreak)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        s.sort_by_field("text:spark", specs, k=5, search_after=(1,))
    with _pytest.raises(ValueError):
        s.sort_by_field("text:spark", specs, k=5, search_after=(1, 7, 3, 9))

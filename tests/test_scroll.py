"""Scroll contexts: batched deep pagination (scroll_context.rs analog)."""

import pytest

from quickwit_spark.search.scroll import delete_scroll, fetch_scroll


@pytest.fixture(scope="module")
def searcher(spark, sf_dir):
    import tempfile

    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.corpus import web_corpus

    from pyspark.sql import functions as F

    idx = tempfile.mkdtemp(prefix="qws_scroll_")
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=4,
        stored_columns=("n_chars",),
    )
    docs = web_corpus(spark, sf_dir).withColumn("n_chars", F.length("text"))
    build_index(spark, docs, idx, cfg)
    return IndexSearcher(spark, idx)


def test_scroll_bm25_covers_all_hits_in_order(searcher):
    total = searcher.count("spark")
    # one big page as ground truth
    truth = [
        (r["doc_key"], round(r["score"], 6))
        for r in searcher.search("spark", k=total, mode="oracle").collect()
    ]
    ctx = searcher.scroll("spark", page_size=7, mode="oracle", batch_len=20)
    got, ranks = [], []
    while True:
        page = ctx.next_page()
        if not page:
            break
        assert len(page) <= 7
        got.extend((r["doc_key"], round(r["score"], 6)) for r in page)
        ranks.extend(r["rank"] for r in page)
    assert got == truth
    # ranks continue across pages AND across refetched batches
    assert ranks == list(range(1, len(got) + 1))


def test_scroll_uses_few_batches(searcher):
    # pages served from the cached batch: fetches = ceil(hits/batch)
    ctx = searcher.scroll("spark", page_size=3, batch_len=1000)
    pages = 0
    while ctx.next_page():
        pages += 1
    assert pages >= 2
    assert ctx._exhausted  # a single 1000-batch covered everything


def test_scroll_sort_field_order(searcher):
    ctx = searcher.scroll(
        "spark", page_size=5, sort_field="n_chars", batch_len=8
    )
    seen = []
    while True:
        page = ctx.next_page()
        if not page:
            break
        seen.extend((r["sort_value"], r["doc_key"]) for r in page)
    total = searcher.count("spark")
    assert len(seen) == total
    assert seen == sorted(seen, key=lambda t: (-t[0], -t[1]))


def test_scroll_registry_roundtrip(searcher):
    ctx = searcher.scroll("spark", page_size=4)
    sid = ctx.scroll_id
    assert fetch_scroll(sid) is ctx
    first = fetch_scroll(sid).next_page()
    assert len(first) == 4
    delete_scroll(sid)
    with pytest.raises(KeyError):
        fetch_scroll(sid)


def test_scroll_durable_resume(searcher):
    """Serialized scroll context resumes in a 'fresh process' (registry
    cleared): pages continue from the last served hit with global ranks
    intact — the reference's KV-stored ScrollContext shape."""
    from quickwit_spark.query.ast import Term
    from quickwit_spark.search import scroll as sc

    ctx = searcher.scroll(Term("text", "spark"), page_size=5, mode="oracle")
    p1 = ctx.next_page()
    p2_expected = [r["doc_key"] for r in ctx.next_page()]
    # rewind a fresh context to just after page 1 and persist it
    ctx2 = searcher.scroll(Term("text", "spark"), page_size=5, mode="oracle")
    ctx2.next_page()
    fp = ctx2.save()
    sid = ctx2.scroll_id
    sc._REGISTRY.clear()  # simulate a new driver process
    with pytest.raises(KeyError):
        sc.fetch_scroll(sid)
    resumed = sc.fetch_scroll(sid, searcher)
    page = resumed.next_page()
    assert [r["doc_key"] for r in page] == p2_expected
    assert [r["rank"] for r in page] == [6, 7, 8, 9, 10]
    assert p1[0]["rank"] == 1
    sc.delete_scroll(sid, searcher)
    import os

    assert not os.path.exists(fp)
    with pytest.raises(KeyError):
        sc.fetch_scroll(sid, searcher)


def test_durable_state_round_trips_datetime_cursor(searcher, tmp_path):
    """A timestamp-sorted scroll's served cursor (datetime) and a
    datetime time_range must survive json save/resume — plain
    json.dump raises on datetime."""
    import datetime as dt
    import json

    from quickwit_spark.search.scroll import ScrollContext

    ctx = searcher.scroll("spark", page_size=3, sort_field="n_chars")
    assert ctx.next_page()
    when = dt.datetime(2024, 1, 2, 3, 4, 5)
    ctx._served_cursor = (when, "doc-9")
    ctx.time_range = (when, when + dt.timedelta(days=1))
    fp = ctx.save(str(tmp_path))
    state = json.load(open(fp))  # must be valid JSON on disk
    ctx2 = ScrollContext.resume(searcher, state)
    assert ctx2._cursor == (when, "doc-9")
    assert ctx2.time_range == (when, when + dt.timedelta(days=1))
    assert ctx2._served == ctx._served


@pytest.fixture(scope="module")
def fed_members(spark, sf_dir):
    """The corpus split over two indexes (even/odd doc ids)."""
    import tempfile

    from pyspark.sql import functions as F

    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.corpus import web_corpus

    root = tempfile.mkdtemp(prefix="qws_fedscroll_")
    docs = web_corpus(spark, sf_dir).withColumn("n_chars", F.length("text"))
    cfg = IndexConfig(
        fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=2,
        stored_columns=("n_chars",),
    )
    out = []
    for name, par in (("even", 0), ("odd", 1)):
        d = f"{root}/{name}"
        build_index(
            spark, docs.filter(F.col("doc_id") % 2 == par), d, cfg, job_id=name
        )
        out.append((name, IndexSearcher(spark, d)))
    return out


def _fed_ctx(fed_members, page_size=5):
    from quickwit_spark.query.ast import Term
    from quickwit_spark.search.scroll import (
        FederatedScrollContext,
        ScrollContext,
        create_scroll,
    )

    members = [
        (n, ScrollContext(s, Term("text", "spark"), page_size=page_size,
                          mode="oracle"))
        for n, s in fed_members
    ]
    ctx = FederatedScrollContext(members, page_size=page_size)
    create_scroll(ctx)
    return ctx


def test_federated_scroll_matches_single_stream(searcher, fed_members):
    """The k-way merge over two member streams yields every hit exactly
    once, globally score-ordered with continuing ranks."""
    from quickwit_spark.query.ast import Term

    single = searcher.scroll(Term("text", "spark"), page_size=1000,
                             mode="oracle")
    all_single = {r["doc_key"] for r in single.next_page()}
    fed = _fed_ctx(fed_members, page_size=7)
    seen, scores, ranks = [], [], []
    while True:
        page = fed.next_page()
        if not page:
            break
        seen += [r["doc_key"] for r in page]
        scores += [r["score"] for r in page]
        ranks += [r["rank"] for r in page]
    assert set(seen) == all_single and len(seen) == len(all_single)
    assert scores == sorted(scores, reverse=True)
    assert ranks == list(range(1, len(seen) + 1))


def test_federated_scroll_durable_resume(spark, fed_members, tmp_path):
    """A federated scroll saved after page 1 resumes in a 'fresh
    process' and serves the same page 2 with continuing ranks."""
    from quickwit_spark.search import scroll as sc

    ref = _fed_ctx(fed_members, page_size=5)
    ref.next_page()
    p2_expected = [(r["_index"], r["doc_key"]) for r in ref.next_page()]

    ctx = _fed_ctx(fed_members, page_size=5)
    ctx.next_page()
    state_path = str(tmp_path / "fedscroll")
    ctx.save(state_path)
    sid = ctx.scroll_id
    sc._REGISTRY.clear()  # simulate a new driver process
    import json
    import os

    with open(os.path.join(state_path, f"{sid}.json")) as f:
        resumed = sc.FederatedScrollContext.resume(spark, json.load(f))
    page = resumed.next_page()
    assert [(r["_index"], r["doc_key"]) for r in page] == p2_expected
    assert [r["rank"] for r in page] == [6, 7, 8, 9, 10]

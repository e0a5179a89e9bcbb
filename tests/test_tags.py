"""Tag pruning: query → tag predicate extraction, manifest evaluation,
and end-to-end segment skipping with partition_key-style routing.

Reference semantics: `quickwit-doc-mapper/src/tag_pruning.rs` (tests at
`:420-560`), `SplitMetadata.tags` in `split_metadata.rs:61-130`.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.index import manifest as mf
from quickwit_spark.query.ast import Bool, FullText, Term, TermSet, Wildcard
from quickwit_spark.query.tags import extract_tag_filter
from quickwit_spark.search.engine import IndexSearcher

RAW = lambda field, text: [text]  # noqa: E731  raw-tokenizer stand-in


def ev(flt, tags):
    return flt.evaluate(set(tags))


def test_term_predicate_and_unrecorded_field():
    f = extract_tag_filter(Term("lang", "en"), RAW)
    assert ev(f, ["lang!", "lang:en"])          # value present
    assert not ev(f, ["lang!", "lang:de"])      # exhaustive set, absent ⇒ prune
    assert ev(f, [])                            # field not recorded ⇒ keep


def test_conjunction_with_uninformative_fulltext():
    ast = Bool(
        must=(Term("lang", "de"), FullText("text", "spark join", "and"))
    )
    f = extract_tag_filter(ast, lambda fld, t: t.split())
    # text isn't a tag field ⇒ its conjunct is (¬text! ∨ ...) = true;
    # lang governs pruning
    assert not ev(f, ["lang!", "lang:en", "lang:fr"])
    assert ev(f, ["lang!", "lang:de", "lang:en"])


def test_must_not_and_wildcard_cannot_prune():
    assert extract_tag_filter(Bool(must_not=(Term("lang", "en"),)), RAW) is None
    assert extract_tag_filter(Wildcard("lang", "e*"), RAW) is None


def test_termset_or_and_should_or():
    f = extract_tag_filter(TermSet("lang", ("en", "de")), RAW)
    assert ev(f, ["lang!", "lang:de"])
    assert not ev(f, ["lang!", "lang:fr"])
    g = extract_tag_filter(
        Bool(should=(Term("lang", "en"), Term("lang", "de"))), RAW
    )
    assert ev(g, ["lang!", "lang:en"]) and not ev(g, ["lang!", "lang:fr"])


def test_should_next_to_must_is_dropped():
    ast = Bool(must=(Term("lang", "de"),), should=(Term("lang", "en"),))
    f = extract_tag_filter(ast, RAW)
    assert not ev(f, ["lang!", "lang:en"])  # the should-en doesn't rescue it


@pytest.fixture(scope="module")
def tagged_index(spark, sf_dir):
    from quickwit_spark.sources.corpus import web_corpus

    idx = tempfile.mkdtemp(prefix="qws_tags_")
    cfg = IndexConfig(
        fields=[FieldConfig("text"), FieldConfig("lang", tokenizer="raw")],
        doc_key="doc_id",
        num_partitions=4,
        stored_columns=("lang",),
        tag_fields=("lang",),
        routing_column="lang",  # co-locate languages → prunable segments
    )
    build_index(spark, web_corpus(spark, sf_dir), idx, cfg)
    return IndexSearcher(spark, idx)


def test_manifest_records_tags(tagged_index):
    for s in tagged_index.segments:
        assert "lang!" in s.tags
        assert any(t.startswith("lang:") for t in s.tags)


def test_pruning_skips_segments_and_preserves_results(tagged_index, spark, sf_dir):
    from quickwit_spark.sources.corpus import web_corpus

    langs = [
        r["lang"]
        for r in web_corpus(spark, sf_dir).select("lang").distinct().collect()
    ]
    target = sorted(langs)[0]
    ast = Bool(must=(Term("lang", target), FullText("text", "the", "or")))
    plan = tagged_index.search_plan(ast, k=5)
    assert plan["tag_filter"] is not None
    assert len(plan["segments_pruned"]) > 0, "routing by lang must make ≥1 segment prunable"
    # pruned answer == unpruned answer (pruning is evidence-only)
    got = {
        (r["doc_key"], round(r["score"], 6))
        for r in tagged_index.search(ast, k=100, mode="oracle").collect()
    }
    all_segs = [s.segment_id for s in tagged_index.segments]
    ast2, ff, _ = tagged_index._resolve(ast, None)
    # bypass pruning: evaluate every live segment
    unpruned = tagged_index._matches(ast2, all_segs, None, "oracle", ff)
    docs = tagged_index.docs().select("segment_id", "doc_id", "doc_key")
    expect = set()
    for r in (
        unpruned.join(docs, ["segment_id", "doc_id"]).select("doc_key", "score").collect()
    ):
        expect.add((r["doc_key"], round(r["score"], 6)))
    assert got <= expect and len(got) > 0


def test_merge_unions_tags(tagged_index, spark, sf_dir):
    from quickwit_spark.index.merge import MergeOp, execute_merge

    idx = tagged_index.index_dir
    segs = mf.live_segments(idx)
    pick = [s.segment_id for s in segs[:2]]
    op = MergeOp(op_id="tagmerge-0", segment_ids=pick, partition_id=0, merge_gen=1)
    rec = execute_merge(spark, idx, op)
    in_tags = {t for s in segs[:2] for t in s.tags}
    assert "lang!" in rec.tags
    assert {t for t in rec.tags if t.startswith("lang:")} == {
        t for t in in_tags if t.startswith("lang:")
    }

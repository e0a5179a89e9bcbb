"""Positional indexing (record: position) + phrase queries."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from quickwit_spark.codec.postings import decode_positions, encode_positions
from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.index.merge import MergePolicy, run_merges
from quickwit_spark.query.ast import Bool, Phrase, Term
from quickwit_spark.search.engine import IndexSearcher


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=20),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_positions_codec_roundtrip(doc_pos):
    # positions ascending within each doc
    doc_pos = [sorted(set(p)) for p in doc_pos]
    doc_pos = [p for p in doc_pos if p]
    flat = np.array([x for p in doc_pos for x in p], dtype=np.uint64)
    tfs = np.array([len(p) for p in doc_pos], dtype=np.uint64)
    got = decode_positions(encode_positions(flat, tfs), tfs)
    assert list(got) == list(flat)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown foxes are quick brown animals"),
    (2, "brown quick is not quick brown"),
    (3, "nothing relevant here at all"),
    (4, "a quick brown quick brown quick brown repetition"),
]


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("posidx"))
    cfg = IndexConfig(
        fields=[FieldConfig("text", record="position")],
        doc_key="doc_id",
        num_partitions=1,
    )
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, d, cfg)
    return d


def _phrase_oracle(phrase: str) -> dict[int, int]:
    toks = phrase.split()
    out = {}
    for did, text in DOCS:
        words = text.split()
        c = sum(
            1
            for i in range(len(words) - len(toks) + 1)
            if words[i : i + len(toks)] == toks
        )
        if c:
            out[did] = c
    return out


def test_phrase_matches_and_counts(spark, pos_index):
    s = IndexSearcher(spark, pos_index)
    for phrase in ("quick brown", "brown quick", "the lazy dog", "quick brown quick"):
        got = {
            r["doc_key"]
            for r in s.search_stream(Phrase("text", phrase), []).collect()
        }
        assert got == set(_phrase_oracle(phrase)), phrase
    # single-term phrase behaves like a term query
    got = {r["doc_key"] for r in s.search_stream(Phrase("text", "fox"), []).collect()}
    assert got == {0}
    # no match
    assert s.count(Phrase("text", "lazy fox")) == 0


def test_phrase_frequency_scoring(spark, pos_index):
    """Doc 4 has 'quick brown' 3×; higher phrase-tf ranks it first."""
    s = IndexSearcher(spark, pos_index)
    hits = s.search(Phrase("text", "quick brown"), k=10).collect()
    assert hits[0]["doc_key"] == 4


def test_phrase_in_bool_and_after_merge(spark, pos_index, tmp_path_factory):
    s = IndexSearcher(spark, pos_index)
    ast = Bool(must=[Phrase("text", "quick brown")], must_not=[Term("text", "fox")])
    got = {r["doc_key"] for r in s.search_stream(ast, []).collect()}
    assert got == set(_phrase_oracle("quick brown")) - {0}

    # positions survive a merge: two slices → merge → same phrase results
    d = str(tmp_path_factory.mktemp("posmerge"))
    cfg = IndexConfig(
        fields=[FieldConfig("text", record="position")],
        doc_key="doc_id",
        num_partitions=1,
    )
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df.filter(F.col("doc_id") < 2), d, cfg, job_id="a")
    build_index(spark, df.filter(F.col("doc_id") >= 2), d, cfg, job_id="b")
    recs = run_merges(spark, d, MergePolicy(merge_factor=2, max_merge_factor=2))
    assert len(recs) == 1
    sm = IndexSearcher(spark, d)
    for phrase in ("quick brown", "brown quick", "quick brown quick"):
        got = {
            r["doc_key"]
            for r in sm.search_stream(Phrase("text", phrase), []).collect()
        }
        assert got == set(_phrase_oracle(phrase)), phrase


def test_phrase_without_positions_errors(spark, sf_dir, tmp_path):
    d = str(tmp_path / "idx")
    cfg = IndexConfig(fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=1)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    build_index(spark, df, d, cfg)
    s = IndexSearcher(spark, d)
    with pytest.raises(Exception, match="position"):
        s.count(Phrase("text", "quick brown"))


def _slop_oracle(phrase: str, slop: int) -> dict[int, int]:
    """Brute-force sloppy-phrase count: forward DP over offset-adjusted
    positions, pairwise window ≤ slop (transposition costs 2)."""
    toks = phrase.split()
    out = {}
    for did, text in DOCS:
        words = text.split()
        pos = [[i for i, w in enumerate(words) if w == t] for t in toks]
        if any(not p for p in pos):
            continue
        cur = [p - 0 for p in pos[0]]
        for ti in range(1, len(toks)):
            cur = [
                q - ti
                for q in pos[ti]
                if any(abs((q - ti) - a) <= slop for a in cur)
            ]
            if not cur:
                break
        if cur:
            out[did] = len(cur)
    return out


def test_phrase_slop(spark, pos_index):
    s = IndexSearcher(spark, pos_index)
    cases = [
        ("quick fox", 1),     # one word between: "quick brown fox"
        ("quick fox", 0),     # not adjacent → no match
        ("fox quick", 2),     # transposition costs 2
        ("fox quick", 1),
        ("the dog", 2),       # "the lazy dog"
        ("quick animals", 2),
        ("brown repetition", 1),
    ]
    for phrase, slop in cases:
        got = {
            r["doc_key"]
            for r in s.search_stream(Phrase("text", phrase, slop=slop), []).collect()
        }
        assert got == set(_slop_oracle(phrase, slop)), (phrase, slop)
    # slop=0 equals the exact-adjacency oracle
    for phrase in ("quick brown", "quick brown quick"):
        assert _slop_oracle(phrase, 0) == _phrase_oracle(phrase)


def test_phrase_prefix(spark, pos_index):
    from quickwit_spark.query.ast import PhrasePrefix

    s = IndexSearcher(spark, pos_index)
    # "quick bro" prefix → expands to {brown} → same as phrase
    got = {
        r["doc_key"]
        for r in s.search_stream(PhrasePrefix("text", "quick bro"), []).collect()
    }
    assert got == set(_phrase_oracle("quick brown"))
    # prefix matching multiple dictionary terms: "the la" → lazy
    got = {
        r["doc_key"]
        for r in s.search_stream(PhrasePrefix("text", "the la"), []).collect()
    }
    assert got == {0}
    # no dictionary term with the prefix → no hits
    assert s.count(PhrasePrefix("text", "quick zz")) == 0
    # max_expansions truncates in term order
    got = {
        r["doc_key"]
        for r in s.search_stream(
            PhrasePrefix("text", "quick b", max_expansions=50), []
        ).collect()
    }
    assert got == set(_phrase_oracle("quick brown"))


def test_parser_emits_phrase_for_position_fields():
    from quickwit_spark.query.ast import FullText, Phrase as P, PhrasePrefix as PP
    from quickwit_spark.query.parser import parse_query

    pos = {"text"}
    assert parse_query('text:"quick brown"', ["text"], position_fields=pos) == P(
        "text", "quick brown", slop=0
    )
    assert parse_query('text:"quick brown"~2', ["text"], position_fields=pos) == P(
        "text", "quick brown", slop=2
    )
    assert parse_query('text:"quick bro"*', ["text"], position_fields=pos) == PP(
        "text", "quick bro"
    )
    # unfielded quoted clause resolves against default fields
    assert parse_query('"quick brown"', ["text"], position_fields=pos) == P(
        "text", "quick brown", slop=0
    )
    # freq-only field degrades to AND-conjunction (reference fallback)
    assert parse_query('text:"quick brown"', ["text"]) == FullText(
        "text", "quick brown", "and"
    )


def test_es_dsl_phrase_variants():
    from quickwit_spark.query.ast import FullText, Phrase as P, PhrasePrefix as PP
    from quickwit_spark.query.es_dsl import from_es_query

    pos = {"text"}
    q = {"match_phrase": {"text": {"query": "quick brown", "slop": 1}}}
    assert from_es_query(q, position_fields=pos) == P("text", "quick brown", slop=1)
    assert from_es_query(q) == FullText("text", "quick brown", "and")
    q = {"match_phrase_prefix": {"text": {"query": "quick bro", "max_expansions": 10}}}
    assert from_es_query(q, position_fields=pos) == PP(
        "text", "quick bro", max_expansions=10
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="position"):
        from_es_query(q)


def test_query_string_phrase_end_to_end(spark, pos_index):
    """Quoted query strings now execute true phrase semantics on
    position-indexed fields (regression: they degraded to AND)."""
    s = IndexSearcher(spark, pos_index)
    got = {r["doc_key"] for r in s.search_stream('text:"brown quick"', []).collect()}
    assert got == set(_phrase_oracle("brown quick")) == {2, 4}
    # AND degradation would also match docs 0 and 1 (both words, not adjacent)
    assert 1 not in got


def test_parser_delimiter_modes():
    """The reference maps each literal delimiter to a distinct full-text
    mode (`user_input_query.rs:251-255`): unquoted →
    PhraseFallbackToIntersection, single quotes → Bool(And), double
    quotes → Phrase{slop}."""
    from quickwit_spark.query.ast import FullText, PhrasePrefix as PP
    from quickwit_spark.query.parser import parse_query

    pos = {"text"}
    # single-quoted: AND of terms even on a position field, slop ignored
    assert parse_query("text:'quick brown'", ["text"], position_fields=pos) == FullText(
        "text", "quick brown", "and"
    )
    # unquoted literal carries the fallback flag for the engine
    assert parse_query("text:hello-world", ["text"], position_fields=pos) == FullText(
        "text", "hello-world", "and", phrase_fallback=True
    )
    # prefix check precedes the mode: `'a b'*` is still a phrase prefix
    assert parse_query("text:'quick bro'*", ["text"], position_fields=pos) == PP(
        "text", "quick bro"
    )
    # escaped delimiter inside a quoted literal
    assert parse_query('text:"a \\" b"', ["text"], position_fields=pos).text == 'a " b'
    assert parse_query("text:'a \\' b'", ["text"]).text == "a ' b"


@pytest.fixture(scope="module")
def hyphen_index(spark, tmp_path_factory):
    docs = [
        (0, "say hello-world loudly"),          # adjacent after tokenizing
        (1, "hello cruel world"),               # both words, not adjacent
        (2, "world of hello"),                  # both words, reversed
        (3, "nothing to see"),
    ]
    d = str(tmp_path_factory.mktemp("hyphidx"))
    cfg = IndexConfig(
        fields=[FieldConfig("text", record="position")],
        doc_key="doc_id",
        num_partitions=1,
    )
    build_index(spark, spark.createDataFrame(docs, "doc_id long, text string"), d, cfg)
    return d


def test_unquoted_phrase_fallback_end_to_end(spark, hyphen_index):
    """`text:hello-world` on a position field is a slop-0 phrase in the
    reference (PhraseFallbackToIntersection, `full_text_query.rs:151-161`);
    `text:'hello world'` (single quotes) is an intersection."""
    s = IndexSearcher(spark, hyphen_index)

    def hits(q):
        return {r["doc_key"] for r in s.search_stream(q, []).collect()}

    assert hits("text:hello-world") == {0}
    assert hits("text:'hello world'") == {0, 1, 2}
    assert hits('text:"hello world"') == {0}
    # three tokens out of one literal chain as a 3-term phrase
    assert hits("text:hello-cruel-world") == {1}
    # single-token unquoted literals stay on the term path (score- and
    # result-identical; no positions scan) — plan shows no Phrase node
    plan = s.search_plan("text:hello")
    assert "Phrase" not in plan["query_ast"]
    plan2 = s.search_plan("text:hello-world")
    assert "Phrase" in plan2["query_ast"]


def test_unquoted_fallback_without_positions(spark, tmp_path):
    """On a freq-only field the same literal degrades to an AND
    intersection instead of erroring (unlike an explicit phrase)."""
    docs = [(0, "say hello-world loudly"), (1, "hello cruel world"), (3, "nope")]
    d = str(tmp_path / "nopos")
    cfg = IndexConfig(fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=1)
    build_index(spark, spark.createDataFrame(docs, "doc_id long, text string"), d, cfg)
    s = IndexSearcher(spark, d)
    got = {r["doc_key"] for r in s.search_stream("text:hello-world", []).collect()}
    assert got == {0, 1}

"""Porter2 (Snowball English) stemmer vectors + en_stem analyzer."""

import pytest

from quickwit_spark.analysis import get_tokenizer
from quickwit_spark.analysis.stemmer import porter2_stem

VECTORS = [
    # step 0/1a
    ("caresses", "caress"),
    ("cats", "cat"),
    ("flies", "fli"),
    ("dies", "die"),
    ("ties", "tie"),
    ("gas", "gas"),
    ("this", "this"),
    # step 1b
    ("agreed", "agre"),
    ("owned", "own"),
    ("hopping", "hop"),
    ("hoping", "hope"),
    ("sized", "size"),
    ("falling", "fall"),
    ("meetings", "meet"),
    # step 1c
    ("happy", "happi"),
    ("cry", "cri"),
    ("by", "by"),
    ("say", "say"),
    # step 2
    ("generously", "generous"),
    ("conditional", "condit"),
    ("vietnamization", "vietnam"),
    ("predication", "predic"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensibiliti", "sensibl"),
    # step 3
    ("triplicate", "triplic"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    # step 4
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("adoption", "adopt"),
    ("adjustment", "adjust"),
    ("communism", "communism"),
    ("activate", "activ"),
    ("effective", "effect"),
    # exceptions + invariants
    ("skis", "ski"),
    ("skies", "sky"),
    ("dying", "die"),
    ("lying", "lie"),
    ("ugly", "ugli"),
    ("early", "earli"),
    ("only", "onli"),
    ("news", "news"),
    ("proceed", "proceed"),
    ("exceed", "exceed"),
    ("inning", "inning"),
    ("herring", "herring"),
    # short words untouched
    ("a", "a"),
    ("be", "be"),
    ("on", "on"),
]


@pytest.mark.parametrize("word,expected", VECTORS)
def test_porter2_vectors(word, expected):
    assert porter2_stem(word) == expected


def test_en_stem_tokenizer_pipeline():
    tok = get_tokenizer("en_stem")
    assert tok("The Cats were HOPPING happily") == [
        "the", "cat", "were", "hop", "happili",
    ]


def test_en_stem_index_and_query(spark, sf_dir, tmp_path):
    """Indexing with en_stem: 'tables' and 'table' collapse to one term;
    querying either surface form matches both docs."""
    from pyspark.sql import functions as F

    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.query.ast import FullText
    from quickwit_spark.search.engine import IndexSearcher

    df = spark.createDataFrame(
        [
            (0, "the tables are big"),
            (1, "one table is small"),
            (2, "nothing here"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(
        fields=[FieldConfig("text", tokenizer="en_stem")],
        doc_key="doc_id",
        num_partitions=1,
    )
    build_index(spark, df, idx, cfg)
    s = IndexSearcher(spark, idx)
    for q in ("table", "tables"):
        got = {
            r["doc_key"]
            for r in s.search_stream(FullText("text", q, "or"), []).collect()
        }
        assert got == {0, 1}, q
    # the term dictionary holds stems only
    terms = {r["term"] for r in s.list_terms("text", limit=100).collect()}
    assert "tabl" in terms and "tables" not in terms

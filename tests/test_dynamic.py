"""Dynamic JSON doc mapping: per-dot-path fields, arrays, presence.

Covers the reference's dynamic mode semantics
(`quickwit-doc-mapper/src/doc_mapping.rs:26-47`, `field_presence.rs`):
dot-path term/phrase search, typed term queries on numeric leaves, fast
ranges with lowercase normalization, datetime fast-precision truncation,
exists on leaves AND intermediate objects (empty objects absent), and
the multivalued position gap (phrases never span array elements).
"""

import json

import pytest

from quickwit_spark.index.builder import build_index
from quickwit_spark.query.ast import (
    Bool,
    Exists,
    FullText,
    Phrase,
    Range,
    Term,
)
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.sources.dynamic import (
    SOURCE_COLUMN,
    dynamic_index_config,
    flatten_dynamic,
)

DOCS = [
    {"user": {"name": "Ada Lovelace", "uid": 7, "vip": True},
     "tags": ["Alpha", "beta"],
     "commits": [{"msg": "fix the parser"}, {"msg": "add frame tests"}],
     "ts": "2021-03-01T00:00:00.001999Z", "size": 10},
    {"user": {"name": "Grace Hopper", "uid": 11, "vip": False},
     "commits": [{"msg": "the parser add"}],
     "ts": "2021-03-01T00:00:01Z", "size": 2},
    {"user": {"name": "ada again", "uid": 7},
     "payload": {},
     "ts": "2021-03-01T00:00:02Z"},
    {"user": {"name": None, "uid": 3},
     "commits": [{"msg": "x" * 300}],  # one giant token > 255 bytes
     "ts": "2021-03-01T00:00:03Z", "size": 5},
]


@pytest.fixture(scope="module")
def dyn_index(spark, tmp_path_factory):
    wrapped = [
        json.dumps({"_k": i, "_raw": json.dumps(d), "doc": d})
        for i, d in enumerate(DOCS)
    ]
    raw = spark.read.json(spark.sparkContext.parallelize(wrapped, 1))
    df = raw.select("_k", "_raw", "doc.*").withColumnRenamed(
        "_raw", SOURCE_COLUMN
    )
    flat, fields = flatten_dynamic(
        df,
        exclude=("_k", SOURCE_COLUMN),
        mapped={"ts": {"kind": "datetime", "precision": "milliseconds"}},
    )
    cfg = dynamic_index_config(
        fields, doc_key="_k", source_column=SOURCE_COLUMN,
        time_field="ts", num_partitions=1,
    )
    idx = str(tmp_path_factory.mktemp("dyn_idx"))
    build_index(spark, flat, idx, cfg)
    return IndexSearcher(spark, idx), fields


def test_leaf_inventory(dyn_index):
    _, fields = dyn_index
    by_path = {f.path: f for f in fields}
    assert by_path["user.name"].kind == "text"
    assert by_path["user.uid"].kind == "long"
    assert by_path["user.vip"].kind == "bool"
    assert by_path["commits.msg"].array
    assert by_path["ts"].kind == "datetime"
    # sanitized physical names never carry dots
    assert all("." not in f.column for f in fields)


def test_text_and_typed_terms(dyn_index):
    s, _ = dyn_index
    assert s.count(FullText("user.name", "Ada")) == 2  # analyzed, lowercased
    assert s.count(Term("user.name", "Ada")) == 0      # term = post-tokenization
    assert s.count(Term("user.name", "ada")) == 2
    assert s.count(Term("user.uid", "7")) == 2          # typed term, canonical str
    assert s.count(Term("user.vip", "true")) == 1
    assert s.count(Term("tags", "alpha")) == 1          # array of strings


def test_fast_ranges(dyn_index):
    s, _ = dyn_index
    assert s.count(Range("user.uid", gte=7)) == 3
    assert s.count(Range("user.uid", gt=7)) == 1
    assert s.count(Range("size", lt=6)) == 2            # missing → no match
    # lowercase normalizer: bounds case-fold like the stored fast value
    assert s.count(Range("user.name", gte="A", lte="B")) == 2
    # datetime: ms truncation makes the .001999 bound hit the .001 doc
    assert s.count(
        Range("ts", gte="2021-03-01T00:00:00.001999Z",
              lte="2021-03-01T00:00:00.001999Z")
    ) == 1
    # epoch-millis numeric bound
    assert s.count(Range("ts", gte=1614556801000)) == 3


def test_exists_presence(dyn_index):
    s, _ = dyn_index
    assert s.count(Exists("user.uid")) == 4
    assert s.count(Exists("user.vip")) == 2
    assert s.count(Exists("user")) == 4          # intermediate object
    assert s.count(Exists("payload")) == 0       # {} holds no values
    assert s.count(Exists("user.name")) == 3     # null leaf absent
    assert s.count(Exists("commits.msg")) == 2   # >255-byte token → no index
    assert s.count(Exists("nope")) == 0
    # presence works inside bool positions (must_not)
    assert s.count(Bool(must=[Exists("user.uid")],
                        must_not=[Exists("size")])) == 1


def test_phrases_and_element_gap(dyn_index):
    s, _ = dyn_index
    assert s.count(Phrase("commits.msg", "fix the parser")) == 1
    # "parser add" spans two array elements in doc 0 — the multivalue
    # position gap must keep it from matching there; doc 1 has it inline
    assert s.count(Phrase("commits.msg", "parser add")) == 1


def test_sort_and_fetch_dotted(dyn_index):
    s, _ = dyn_index
    rows = s.sort_by_field(
        Exists("user.uid"), [("user.uid", True)], k=2, fetch=["user.name"]
    ).collect()
    assert rows[0]["sort_value"] == 11
    assert rows[0]["user.name"] == "Grace Hopper"

"""Randomized engine-vs-DuckDB COUNT differential at the integration level.

The kernel fuzz (test_differential_fuzz.py) proves per-segment scoring;
this test aims one level up: the ENGINE's planning — query-string
resolution, wildcard expansion, metadata count fast paths, segment
pruning, fast-column ranges — against an independent DuckDB predicate
compiled from the same AST. The sf0.001 documents corpus is pure
``[a-z0-9 ]`` text, so ``string_split(text, ' ')`` reproduces the
``default`` tokenizer exactly and every boolean/range/wildcard count
has a closed-form SQL oracle.

Seeded (not hypothesis): each engine count is a Spark job, so the
query set must be deterministic and bounded.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from quickwit_spark.query.ast import (
    Bool,
    Boost,
    Exists,
    FullText,
    MatchAll,
    MatchNone,
    Range,
    Term,
    TermSet,
    Wildcard,
)

import os

_SF = os.environ.get("QWS_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = f"{_SF}/documents.parquet"


@pytest.fixture(scope="module")
def searcher(spark, sf_dir, tmp_path_factory):
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher

    idx = str(tmp_path_factory.mktemp("count_diff_idx"))
    cfg = IndexConfig(
        fields=[
            FieldConfig("text"),
            FieldConfig("lang", tokenizer="raw"),
        ],
        doc_key="doc_id",
        num_partitions=4,
        stored_columns=("lang", "source", "n_chars"),
        # tag pruning must be SOUND for every random query below — a
        # wrongly pruned segment would show up as a count mismatch
        tag_fields=("lang", "source"),
    )
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    build_index(spark, df, idx, cfg)
    return IndexSearcher(spark, idx)


@pytest.fixture(scope="module")
def vocab():
    rows = duckdb.sql(
        f"""SELECT term, COUNT(DISTINCT doc_id) AS df FROM (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM read_parquet('{DOCS}')
            ) WHERE term <> '' GROUP BY term ORDER BY df DESC"""
    ).fetchall()
    return [t for t, _ in rows]


LANGS = ["en", "de", "fr", "zz"]


def _gen_ast(rng: random.Random, vocab: list[str], depth: int = 0, allow_range=True):
    # the engine (like the reference) accepts Range only in must/filter
    # conjunction positions — the generator must respect that placement
    roll = rng.random()
    if depth < 2 and roll < 0.35:
        slots = {"must": [], "must_not": [], "should": [], "filter": []}
        for _ in range(rng.randint(1, 3)):
            slot = rng.choice(list(slots))
            slots[slot].append(
                _gen_ast(
                    rng,
                    vocab,
                    depth + 1,
                    allow_range=allow_range and slot in ("must", "filter"),
                )
            )
        msm = rng.choice([None, None, 1, 2]) if slots["should"] else None
        return Bool(
            must=slots["must"],
            must_not=slots["must_not"],
            should=slots["should"],
            filter=slots["filter"],
            minimum_should_match=msm,
        )
    if roll < 0.40 and depth > 0:
        return Boost(
            _gen_ast(rng, vocab, depth + 1, allow_range=False),
            rng.choice([0.5, 2.0]),
        )
    kind = rng.randint(0, 6)
    if kind == 4 and not allow_range:
        kind = 0
    if kind == 0:
        return Term("text", rng.choice(vocab + ["nosuchterm"]))
    if kind == 1:
        return TermSet("text", [rng.choice(vocab) for _ in range(rng.randint(1, 3))])
    if kind == 2:
        words = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
        return FullText("text", words, rng.choice(["or", "and"]))
    if kind == 3:
        w = rng.choice(vocab)
        return Wildcard("text", w[: rng.randint(1, max(1, len(w) - 1))] + "*")
    if kind == 4:
        lo = rng.randint(0, 400)
        hi = lo + rng.randint(0, 400)
        kw = {}
        if rng.random() < 0.8:
            kw["gte" if rng.random() < 0.5 else "gt"] = lo
        if rng.random() < 0.8 or not kw:
            kw["lte" if rng.random() < 0.5 else "lt"] = hi
        return Range("n_chars", **kw)
    if kind == 5:
        return Term("lang", rng.choice(LANGS))
    return rng.choice([Exists("text"), Exists("lang"), MatchAll(), MatchNone()])


def _tok_contains(term: str) -> str:
    t = term.replace("'", "''")
    return f"list_contains(string_split(text, ' '), '{t}')"


def _pred(node) -> str:
    """AST → DuckDB boolean expression with the engine's match rules."""
    if isinstance(node, MatchAll):
        return "TRUE"
    if isinstance(node, MatchNone):
        return "FALSE"
    if isinstance(node, Boost):
        return _pred(node.query)
    if isinstance(node, Term):
        if node.field == "lang":
            return f"lang = '{node.value}'"
        return _tok_contains(node.value)
    if isinstance(node, TermSet):
        return "(" + " OR ".join(_tok_contains(v) for v in node.values) + ")"
    if isinstance(node, FullText):
        toks = node.text.split()
        if not toks:
            return "TRUE" if node.zero_terms_match_all else "FALSE"
        op = " AND " if node.operator == "and" else " OR "
        return "(" + op.join(_tok_contains(t) for t in toks) + ")"
    if isinstance(node, Wildcard):
        prefix = node.pattern.rstrip("*").replace("'", "''")
        return (
            "len(list_filter(string_split(text, ' '),"
            f" t -> t LIKE '{prefix}%')) > 0"
        )
    if isinstance(node, Exists):
        if node.field == "lang":
            return "lang IS NOT NULL AND lang <> ''"
        return (
            "len(list_filter(string_split(text, ' '), t -> t <> '')) > 0"
        )
    if isinstance(node, Range):
        parts = []
        if node.gte is not None:
            parts.append(f"n_chars >= {node.gte}")
        if node.gt is not None:
            parts.append(f"n_chars > {node.gt}")
        if node.lte is not None:
            parts.append(f"n_chars <= {node.lte}")
        if node.lt is not None:
            parts.append(f"n_chars < {node.lt}")
        return "(" + " AND ".join(parts) + ")"
    if isinstance(node, Bool):
        clauses = []
        for cl in node.must:
            clauses.append(_pred(cl))
        for cl in node.filter:
            clauses.append(_pred(cl))
        if node.should:
            msm = node.minimum_should_match
            shoulds = [_pred(cl) for cl in node.should]
            if not (node.must or node.filter):
                need = msm if msm else 1
                counts = " + ".join(f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in shoulds)
                clauses.append(f"({counts}) >= {need}")
            elif msm:
                counts = " + ".join(f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in shoulds)
                clauses.append(f"({counts}) >= {msm}")
            # else: should is optional scoring only — no predicate
        if not clauses:
            if node.must_not:
                clauses.append("TRUE")  # must_not-only anchors on match-all
            else:
                clauses.append("FALSE")  # empty bool matches nothing
        for cl in node.must_not:
            clauses.append(f"NOT ({_pred(cl)})")
        return "(" + " AND ".join(clauses) + ")"
    raise AssertionError(node)


def test_random_counts_match_duckdb(searcher, vocab):
    rng = random.Random(20260819)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    mismatches = []
    for i in range(40):
        ast = _gen_ast(rng, vocab)
        want = con.execute(
            f"SELECT COUNT(*) FROM documents WHERE {_pred(ast)}"
        ).fetchone()[0]
        got = searcher.count(ast)
        if got != want:
            mismatches.append((i, ast, got, want))
    assert not mismatches, mismatches[:3]


def test_count_fast_paths_match_kernel(searcher, vocab):
    """The metadata fast paths (manifest match-all, doc_freq bare term)
    must agree with the kernel-counted equivalents."""
    total = searcher.count(MatchAll())
    assert total == searcher.count(Bool(must=[MatchAll()]))
    for t in vocab[:3] + ["nosuchterm"]:
        assert searcher.count(Term("text", t)) == searcher.count(
            Bool(filter=[Term("text", t)])
        )


# --------------------------------------------------------------------------
# randomized AGGREGATION differential — bucket values vs DuckDB GROUP BY
# --------------------------------------------------------------------------


def _approx(a, b):
    if a is None or b is None:
        return a == b
    return a == pytest.approx(b, rel=1e-9, abs=1e-9)


def test_random_aggs_match_duckdb(searcher, vocab):
    """Random terms/histogram/range/metric aggregations (optionally over
    a filtered match set) must reproduce DuckDB's GROUP BY exactly:
    bucket keys, tie order (doc_count desc, key asc), declared-range
    and histogram gap-fill conventions, metric values."""
    from quickwit_spark.search.es_aggs import shape_es_agg

    rng = random.Random(99)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    metrics = {"avg": "AVG", "min": "MIN", "max": "MAX", "sum": "SUM",
               "value_count": "COUNT"}
    failures = []
    for i in range(24):
        term = rng.choice(vocab)
        filtered = rng.random() < 0.5
        where = _tok_contains(term) if filtered else "TRUE"
        body: dict = {"size": 0}
        if filtered:
            body["query"] = {"term": {"text": {"value": term}}}
        kind = rng.randint(0, 3)
        if kind == 0:  # terms (+ optional metric sub)
            f = rng.choice(["lang", "source"])
            size = rng.randint(1, 4)
            clause: dict = {"terms": {"field": f, "size": size}}
            mk = rng.choice([None, *metrics])
            sql_m = ""
            if mk:
                clause["aggs"] = {"m": {mk: {"field": "n_chars"}}}
                sql_m = f", {metrics[mk]}(CAST(n_chars AS DOUBLE)) AS mv"
            rows = con.execute(
                f"""SELECT CAST({f} AS VARCHAR) AS key, COUNT(*) AS dc{sql_m}
                    FROM documents WHERE {where}
                    GROUP BY {f} ORDER BY dc DESC, key ASC LIMIT {size}"""
            ).fetchall()
            shaped = shape_es_agg(
                clause, searcher.es_search({**body, "aggs": {"a": clause}})
                ["aggregations"]["a"]
            )
            got = shaped["buckets"]
            ok = len(got) == len(rows) and all(
                b["key"] == r[0] and b["doc_count"] == r[1]
                and (not mk or _approx(b["m"]["value"], r[2]))
                for b, r in zip(got, rows)
            )
        elif kind == 1:  # histogram with gap fill
            interval = rng.choice([37, 64, 100])
            clause = {"histogram": {"field": "n_chars", "interval": interval}}
            rows = con.execute(
                f"""SELECT FLOOR(n_chars / {interval}) * {interval} AS key,
                           COUNT(*) AS dc
                    FROM documents WHERE {where} GROUP BY 1 ORDER BY 1"""
            ).fetchall()
            expected = []
            if rows:
                lo, hi = rows[0][0], rows[-1][0]
                counts = {k: c for k, c in rows}
                k = lo
                while k <= hi:
                    expected.append((float(k), counts.get(k, 0)))
                    k += interval
            shaped = shape_es_agg(
                clause, searcher.es_search({**body, "aggs": {"a": clause}})
                ["aggregations"]["a"]
            )
            got = shaped["buckets"]
            ok = len(got) == len(expected) and all(
                float(b["key"]) == k and b["doc_count"] == c
                for b, (k, c) in zip(got, expected)
            )
        elif kind == 2:  # range — declared order, zero buckets included
            cut1 = rng.randint(50, 200)
            cut2 = cut1 + rng.randint(50, 300)
            ranges = [{"to": cut1}, {"from": cut1, "to": cut2}, {"from": cut2}]
            clause = {"range": {"field": "n_chars", "ranges": ranges}}
            rows = con.execute(
                f"""SELECT
                      COUNT(*) FILTER (n_chars < {cut1}),
                      COUNT(*) FILTER (n_chars >= {cut1} AND n_chars < {cut2}),
                      COUNT(*) FILTER (n_chars >= {cut2})
                    FROM documents WHERE {where}"""
            ).fetchone()
            shaped = shape_es_agg(
                clause, searcher.es_search({**body, "aggs": {"a": clause}})
                ["aggregations"]["a"]
            )
            got = shaped["buckets"]
            ok = len(got) == 3 and all(
                b["doc_count"] == r for b, r in zip(got, rows)
            )
        else:  # top-level metric / stats
            mk = rng.choice([*metrics, "stats"])
            clause = {mk: {"field": "n_chars"}}
            shaped = shape_es_agg(
                clause, searcher.es_search({**body, "aggs": {"a": clause}})
                ["aggregations"]["a"]
            )
            if mk == "stats":
                r = con.execute(
                    f"""SELECT COUNT(n_chars), MIN(CAST(n_chars AS DOUBLE)),
                               MAX(CAST(n_chars AS DOUBLE)),
                               SUM(CAST(n_chars AS DOUBLE)),
                               AVG(CAST(n_chars AS DOUBLE))
                        FROM documents WHERE {where}"""
                ).fetchone()
                ok = (
                    shaped["count"] == r[0]
                    and _approx(shaped["min"], r[1])
                    and _approx(shaped["max"], r[2])
                    and _approx(shaped["sum"], r[3])
                    and _approx(shaped["avg"], r[4])
                )
            else:
                r = con.execute(
                    f"""SELECT {metrics[mk]}(CAST(n_chars AS DOUBLE))
                        FROM documents WHERE {where}"""
                ).fetchone()
                ok = _approx(shaped["value"], r[0])
        if not ok:
            failures.append((i, clause, filtered, shaped))
    assert not failures, failures[:2]


def test_search_early_equals_search(searcher, vocab):
    """Split-order early termination is an optimization, not a
    semantics change: hits must equal plain search() and count_all
    num_hits must equal count() on random queries (the fixed gate pins
    one query; demotion decisions vary with the query's term stats)."""
    rng = random.Random(55)
    for _ in range(8):
        ast = _gen_ast(rng, vocab, depth=2, allow_range=False)
        plain = [
            (r["doc_key"], r["score"], r["rank"])
            for r in searcher.search(ast, k=10).collect()
        ]
        early = searcher.search_early(ast, k=10, count_hits="count_all")
        got = [
            (r["doc_key"], r["score"], r["rank"])
            for r in early["hits"].collect()
        ]
        assert got == plain, ast
        assert early["num_hits"] == searcher.count(ast), ast
        under = searcher.search_early(ast, k=10, count_hits="underestimate")
        got_u = [
            (r["doc_key"], r["score"], r["rank"])
            for r in under["hits"].collect()
        ]
        assert got_u == plain, ast
        if under["num_hits"] is not None:
            assert under["num_hits"] <= early["num_hits"], ast


def test_random_bm25_topk_match_duckdb(searcher, vocab):
    """Randomized ORACLE-MODE top-k: seeded (must, should+boost,
    must_not, filter) combinations through the engine must reproduce
    the generated BM25 SQL — global stats, exact doc lengths, boost
    multipliers, (score desc, doc_key desc) rank — to 6 decimals (the
    gate convention). The fixed gates pin ~10 such queries; this
    generates 10 more per run from the same SQL generator."""
    import __spark_entry__ as entry

    from quickwit_spark.query.ast import Bool, Boost, Term

    rng = random.Random(2718)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    failures = []
    for i in range(10):
        pool = rng.sample(vocab[:30], 6)
        n_must = rng.randint(0, 2)
        n_should = rng.randint(1 if n_must == 0 else 0, 2)
        n_not = rng.randint(0, 1)
        musts = pool[:n_must]
        shoulds = [
            (t, rng.choice([1.0, 0.5, 2.0]))
            for t in pool[n_must : n_must + n_should]
        ]
        must_nots = pool[n_must + n_should : n_must + n_should + n_not]
        use_filter = rng.random() < 0.4
        ast = Bool(
            must=[Term("text", t) for t in musts],
            should=[
                Boost(Term("text", t), b) if b != 1.0 else Term("text", t)
                for t, b in shoulds
            ],
            must_not=[Term("text", t) for t in must_nots],
            filter=[Term("lang", "en")] if use_filter else [],
        )
        sql = entry._bm25_sql(
            [(t, 1.0) for t in musts] + shoulds,
            must=musts,
            must_not=must_nots,
            filter_sql="lang = 'en'" if use_filter else None,
        )
        want = [tuple(r) for r in con.execute(sql).fetchall()]
        got = [
            (r["doc_key"], round(r["score"], 6), r["rank"])
            for r in searcher.search(ast, k=10, mode="oracle").collect()
        ]
        if got != want:
            failures.append((i, ast, got[:3], want[:3]))
    assert not failures, failures[:2]


def test_list_terms_and_stream_match_duckdb(searcher, vocab):
    """list_terms dictionary ranges and search_stream exports against
    direct SQL over the corpus — random [start, end) windows and random
    stream queries."""
    rng = random.Random(606)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    for _ in range(6):
        a, b = sorted(rng.sample(vocab, 2))
        got = [r["term"] for r in searcher.list_terms("text", a, b, limit=50).collect()]
        want = [
            r[0]
            for r in con.execute(
                f"""SELECT DISTINCT term FROM (
                      SELECT unnest(string_split(text, ' ')) AS term FROM documents
                    ) WHERE term <> '' AND term >= '{a}' AND term < '{b}'
                    ORDER BY term LIMIT 50"""
            ).fetchall()
        ]
        assert got == want, (a, b)
    for _ in range(5):
        ast = _gen_ast(rng, vocab, depth=2, allow_range=False)
        got = sorted(
            (r["doc_key"], r["n_chars"])
            for r in searcher.search_stream(ast, ["n_chars"]).collect()
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                f"SELECT doc_id, n_chars FROM documents WHERE {_pred(ast)}"
            ).fetchall()
        )
        assert got == want, ast


# --------------------------------------------------------------------------
# randomized QUERY-STRING delimiter differential — unquoted (phrase
# fallback), single-quoted (AND), double-quoted (phrase, ~slop) literals
# through the PARSER and a position-record index, counts vs DuckDB
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pos_searcher(spark, sf_dir, tmp_path_factory):
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher

    idx = str(tmp_path_factory.mktemp("count_diff_pos_idx"))
    cfg = IndexConfig(
        fields=[FieldConfig("text", record="position")],
        doc_key="doc_id",
        num_partitions=4,
    )
    build_index(
        spark, spark.read.parquet(f"{sf_dir}/documents.parquet"), idx, cfg
    )
    return IndexSearcher(spark, idx)


def _sq(t: str) -> str:
    return t.replace("'", "''")


def _phrase_pred(toks: list[str], slop: int = 0) -> str:
    """DuckDB adjacency / slop predicate on the space-split token list
    (the engine's sloppy-DP semantics for two terms: position distance
    |(j-1) - i| ≤ slop; slop=0 is exact adjacency)."""
    if len(toks) == 1:
        return f"list_contains(string_split(text, ' '), '{_sq(toks[0])}')"
    assert len(toks) == 2
    a, b = _sq(toks[0]), _sq(toks[1])
    if slop == 0:
        return (
            "len(list_filter(range(1, greatest(len(string_split(text,' ')),1)),"
            f" i -> string_split(text,' ')[i] = '{a}'"
            f" AND string_split(text,' ')[i+1] = '{b}')) > 0"
        )
    return (
        "len(list_filter(range(1, len(string_split(text,' ')) + 1), j ->"
        f" string_split(text,' ')[j] = '{b}' AND len(list_filter("
        "range(1, len(string_split(text,' ')) + 1), i ->"
        f" string_split(text,' ')[i] = '{a}'"
        f" AND abs((j - 1) - i) <= {slop})) > 0)) > 0"
    )


def test_random_delimiter_literals_match_duckdb(pos_searcher, vocab):
    """Random two-word literals in each delimiter form: `text:a-b`
    (unquoted → slop-0 phrase on a position field), `text:'a b'`
    (single-quoted → AND), `text:"a b"` and `text:"a b"~N` — engine
    counts vs DuckDB predicates (reference mode table,
    user_input_query.rs:251-255)."""
    rng = random.Random(20260819)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    mismatches = []
    for i in range(24):
        a = rng.choice(vocab[:60])
        b = rng.choice(vocab[:60])
        form = i % 4
        if form == 0:
            q, pred = f"text:{a}-{b}", _phrase_pred([a, b])
        elif form == 1:
            q = f"text:'{a} {b}'"
            pred = f"({_phrase_pred([a])} AND {_phrase_pred([b])})"
        elif form == 2:
            q, pred = f'text:"{a} {b}"', _phrase_pred([a, b])
        else:
            slop = rng.randint(1, 3)
            q, pred = f'text:"{a} {b}"~{slop}', _phrase_pred([a, b], slop)
        want = con.execute(
            f"SELECT COUNT(*) FROM documents WHERE {pred}"
        ).fetchone()[0]
        got = pos_searcher.count(q)
        if got != want:
            mismatches.append((i, q, got, want))
    assert not mismatches, mismatches[:4]

"""Differential fuzz: the segment kernel vs an independent per-doc model.

Hypothesis generates random corpora and random QueryAst trees (nested
bools with minimum_should_match, boosts, full-text and/or, term sets,
phrases with slop, phrase-prefix expansion, exists, match-all/none);
every case is evaluated twice:

  * engine path — ``_build_field_rows`` → codec round-trip →
    ``SegmentData`` → ``evaluate_segment`` (dense-mask algebra,
    block-max WAND when it applies);
  * model path — a from-the-formula reimplementation over the RAW
    texts: per-doc python dict counting, scalar float32 arithmetic in
    the documented op order (`search/bm25.py` formulas, reference
    `quickwit-search/src/tests.rs:616-700` semantics). It shares only
    the tokenizer and the fieldnorm quantization table with the engine
    — postings codecs, boolean algebra, WAND pruning, phrase chaining
    and top-k are all re-derived independently.

Asserted: identical match sets, bitwise-equal f32 scores, and
rank-identical (score desc, docid desc) top-k — the north rule's
"rank-identical BM25 scores" criterion, stress-tested instead of
spot-checked. Duplicate query tokens, absent terms, empty documents,
msm > |should|, filter-only bools and zero-expansion prefixes are all
reachable by the strategies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from quickwit_spark.analysis import get_tokenizer
from quickwit_spark.codec.norms import fieldnorm_to_id, id_to_fieldnorm
from quickwit_spark.index.builder import FieldConfig, _build_field_rows
from quickwit_spark.query.ast import (
    Bool,
    Boost,
    Exists,
    FullText,
    MatchAll,
    MatchNone,
    Phrase,
    PhrasePrefix,
    Term,
    TermSet,
)
from quickwit_spark.search.kernel import SegmentData, evaluate_segment

F32 = np.float32
TOKENIZE = get_tokenizer("default")
TOK = lambda f: TOKENIZE  # noqa: E731

# small vocabulary so collisions, duplicates and absent terms all occur;
# the z-words share prefixes for PhrasePrefix expansion
VOCAB = [f"t{i}" for i in range(8)] + ["zeal", "zebra", "zoo"]
FIELDS = {"body": "position", "title": "freq", "flags": "basic"}


# --------------------------------------------------------------------------
# independent model
# --------------------------------------------------------------------------


class NaiveSegment:
    """Raw-text view of the corpus: token lists per (field, doc)."""

    def __init__(self, docs: dict[str, list[str]]):
        self.toks = {f: [TOKENIZE(t) for t in texts] for f, texts in docs.items()}
        self.n_docs = max(len(v) for v in self.toks.values())

    def stats(self, field):
        """(N, avgdl_f32) — same scope/order as kernel field_stats."""
        toks = self.toks.get(field)
        if toks is None:
            return self.n_docs, F32(0)
        total = sum(len(t) for t in toks)
        return len(toks), F32(total) / F32(max(len(toks), 1))

    def dl(self, field, d):
        """Quantized doc length (the kernel's parity-mode doc_lens)."""
        exact = np.array([len(self.toks[field][d])], np.int64)
        return F32(id_to_fieldnorm(fieldnorm_to_id(exact))[0])

    def df(self, field, term):
        return sum(1 for t in self.toks.get(field, ()) if term in t)

    def tf(self, field, d, term):
        c = self.toks[field][d].count(term)
        return min(c, 1) if FIELDS.get(field) == "basic" else c

    def positions(self, field, d, term):
        return [i for i, t in enumerate(self.toks[field][d]) if t == term]


def _weight(df, n, boost):
    """idf * (k1+1) * boost in f32, mirroring bm25_weight's op order."""
    x = (F32(n) - F32(df) + F32(0.5)) / (F32(df) + F32(0.5))
    return F32(F32(np.log1p(x)) * F32(1.0 + 1.2) * F32(boost))


def _tf_comp(tf, dl, avgdl):
    """tf / (tf + k1*(1-b+b*dl/avgdl)) in f32 (k1=1.2, b=0.75)."""
    tf = F32(tf)
    norm = F32(1.2) * (F32(1.0 - 0.75) + F32(0.75) * dl / F32(avgdl))
    return tf / (tf + norm)


def _term_score(seg: NaiveSegment, field, term, d, boost):
    df = seg.df(field, term)
    tf = seg.tf(field, d, term)
    if df == 0 or tf == 0:
        return None
    n, avgdl = seg.stats(field)
    return F32(_weight(df, n, boost) * _tf_comp(tf, seg.dl(field, d), avgdl))


def _phrase_count(pos_lists: list[list[int]], slop: int) -> int:
    """#chain-surviving last-term positions (the tantivy convention the
    kernel vectorizes): consecutive terms' positions must satisfy
    prev+1-slop <= next <= prev+1+slop; count distinct final positions."""
    reachable = pos_lists[0]
    for nxt in pos_lists[1:]:
        reachable = [
            q for q in nxt if any(p + 1 - slop <= q <= p + 1 + slop for p in reachable)
        ]
        if not reachable:
            return 0
    return len(reachable)


def _doc_phrase_count(seg: NaiveSegment, field, fixed, last_terms, slop, dd):
    """Phrase frequency of one doc (0 when any chain link is missing)."""
    pos_lists = [seg.positions(field, dd, t) for t in fixed]
    pos_lists.append(
        sorted({p for t in last_terms for p in seg.positions(field, dd, t)})
    )
    if any(not p for p in pos_lists):
        return 0
    return _phrase_count(pos_lists, slop)


def _model_phrase(seg: NaiveSegment, node, d, boost):
    """(match, score) of a Phrase/PhrasePrefix for one doc."""
    toks = TOKENIZE(node.text)
    if not toks:
        return False, F32(0)
    is_prefix = isinstance(node, PhrasePrefix)
    slop = 0 if is_prefix else node.slop
    fixed = toks[:-1]
    last_terms = list(node.expansions or ()) if is_prefix else toks[-1:]
    field = node.field
    # a fixed term absent from the whole segment, or no expansions → no match
    if any(seg.df(field, t) == 0 for t in fixed) or not any(
        seg.df(field, t) for t in last_terms
    ):
        return False, F32(0)
    if len(fixed) == 0 and len(last_terms) == 1 and not is_prefix:
        s = _term_score(seg, field, last_terms[0], d, boost)
        return (s is not None), (s if s is not None else F32(0))
    count = _doc_phrase_count(seg, field, fixed, last_terms, slop, d)
    if count == 0:
        return False, F32(0)
    # parity phrase-df = #matching docs in the segment
    df = sum(
        1
        for dd in range(seg.n_docs)
        if _doc_phrase_count(seg, field, fixed, last_terms, slop, dd) > 0
    )
    n, avgdl = seg.stats(field)
    return True, F32(_weight(df, n, boost) * _tf_comp(count, seg.dl(field, d), avgdl))


def model_eval(seg: NaiveSegment, node, d: int, boost: float = 1.0):
    """(match, score_f32) for one doc — the kernel's _eval, per-doc."""
    if isinstance(node, MatchAll):
        return True, F32(0)
    if isinstance(node, MatchNone):
        return False, F32(0)
    if isinstance(node, Boost):
        return model_eval(seg, node.query, d, boost * node.boost)
    if isinstance(node, (Term, TermSet, FullText)):
        if isinstance(node, Term):
            terms, op = [(node.field, node.value)], "or"
        elif isinstance(node, TermSet):
            terms, op = [(node.field, v) for v in node.values], "or"
        else:
            toks = TOKENIZE(node.text)
            if not toks:
                return (True, F32(0)) if node.zero_terms_match_all else (False, F32(0))
            terms, op = [(node.field, t) for t in toks], node.operator
        score = F32(0)
        count = 0
        for f, t in terms:
            s = _term_score(seg, f, t, d, boost)
            if s is not None:
                score = F32(score + s)
                count += 1
        match = count >= (len(terms) if op == "and" else 1)
        return match, score
    if isinstance(node, (Phrase, PhrasePrefix)):
        return _model_phrase(seg, node, d, boost)
    if isinstance(node, Exists):
        toks = seg.toks.get(node.field)
        return (toks is not None and len(toks[d]) > 0), F32(0)
    if isinstance(node, Bool):
        match = None
        score = F32(0)
        for cl in node.must:
            m, s = model_eval(seg, cl, d, boost)
            score = F32(score + s)  # kernel adds must scores unconditionally
            match = m if match is None else (match and m)
        for cl in node.filter:
            m, _ = model_eval(seg, cl, d, boost)
            match = m if match is None else (match and m)
        if node.should:
            scount = 0
            for cl in node.should:
                m, s = model_eval(seg, cl, d, boost)
                if m:
                    score = F32(score + s)
                    scount += 1
            msm = node.minimum_should_match
            if match is None:
                match = (scount >= msm) if msm else (scount > 0)
            elif msm:
                match = match and scount >= msm
        if match is None:
            match = bool(node.must_not)  # must_not-only anchors on match-all
        for cl in node.must_not:
            m, _ = model_eval(seg, cl, d, 0.0)
            match = match and not m
        return match, score
    raise AssertionError(node)


def model_topk(seg: NaiveSegment, ast, k):
    hits = []
    for d in range(seg.n_docs):
        m, s = model_eval(seg, ast, d)
        if m:
            hits.append((d, s))
    hits.sort(key=lambda ds: (-float(ds[1]), -ds[0]))
    if k is not None:
        hits = hits[:k]
    return [d for d, _ in hits], np.array([s for _, s in hits], F32)


# --------------------------------------------------------------------------
# strategies
# --------------------------------------------------------------------------

word = st.sampled_from(VOCAB)
# fieldnorms are stored EXACTLY up to 40 tokens and quantized above
# (tantivy's table) — long docs must be reachable or quantization is
# never exercised; short docs keep phrase chains dense
text = st.one_of(
    st.lists(word, min_size=0, max_size=10),
    st.lists(word, min_size=41, max_size=55),
).map(" ".join)
corpus_st = st.integers(min_value=2, max_value=18).flatmap(
    lambda n: st.fixed_dictionaries(
        {f: st.lists(text, min_size=n, max_size=n) for f in FIELDS}
    )
)

fields_st = st.sampled_from(list(FIELDS))
leaf = st.one_of(
    st.builds(Term, fields_st, word),
    st.builds(TermSet, fields_st, st.lists(word, min_size=1, max_size=3)),
    st.builds(
        FullText,
        fields_st,
        st.lists(word, min_size=0, max_size=3).map(" ".join),
        st.sampled_from(["or", "and"]),
        st.booleans(),
    ),
    st.builds(
        Phrase,
        st.just("body"),
        st.lists(word, min_size=1, max_size=3).map(" ".join),
        st.integers(min_value=0, max_value=2),
    ),
    st.builds(
        PhrasePrefix,
        st.just("body"),
        st.lists(word, min_size=1, max_size=2).map(" ".join).map(lambda t: t or "z"),
    ),
    st.builds(Exists, fields_st),
    st.just(MatchAll()),
    st.just(MatchNone()),
)


def _extend(children):
    return st.one_of(
        st.builds(
            Bool,
            st.lists(children, max_size=2),  # must
            st.lists(children, max_size=2),  # must_not
            st.lists(children, max_size=3),  # should
            st.lists(children, max_size=1),  # filter
            st.sampled_from([None, 1, 2]),
        ),
        st.builds(Boost, children, st.sampled_from([0.0, 0.5, 2.0, 4.0])),
    )


query_st = st.recursive(leaf, _extend, max_leaves=6)


def _resolve_prefixes(node, dictionary: list[str]):
    """Fill PhrasePrefix.expansions from the segment dictionary, the
    engine's planning step (sorted order, capped at max_expansions)."""
    if isinstance(node, PhrasePrefix):
        toks = TOKENIZE(node.text)
        prefix = toks[-1] if toks else ""
        exp = tuple(t for t in dictionary if t.startswith(prefix))
        return PhrasePrefix(node.field, node.text, node.max_expansions,
                            exp[: node.max_expansions])
    if isinstance(node, Bool):
        return Bool(
            [_resolve_prefixes(c, dictionary) for c in node.must],
            [_resolve_prefixes(c, dictionary) for c in node.must_not],
            [_resolve_prefixes(c, dictionary) for c in node.should],
            [_resolve_prefixes(c, dictionary) for c in node.filter],
            node.minimum_should_match,
        )
    if isinstance(node, Boost):
        return Boost(_resolve_prefixes(node.query, dictionary), node.boost)
    return node


def build_segment(docs: dict[str, list[str]]) -> SegmentData:
    rows = []
    for fld_name, texts in docs.items():
        fld = FieldConfig(name=fld_name, record=FIELDS[fld_name])
        r, _ = _build_field_rows("seg0", fld, pd.Series(texts), 1.2, 0.75)
        rows.extend(r)
    return SegmentData.from_rows("seg0", rows)


# --------------------------------------------------------------------------
# the differential property
# --------------------------------------------------------------------------


@settings(max_examples=150, deadline=None)
@given(corpus=corpus_st, query=query_st, k=st.sampled_from([None, 1, 3, 10]))
def test_kernel_matches_naive_model(corpus, query, k):
    seg = build_segment(corpus)
    body_dict = sorted({t for toks in corpus["body"] for t in TOKENIZE(toks)})
    ast = _resolve_prefixes(query, body_dict)
    naive = NaiveSegment(corpus)

    d_m, s_m = model_topk(naive, ast, k)
    for use_wand in (True, False):
        d_k, s_k = evaluate_segment(seg, ast, TOK, k=k, use_wand=use_wand)
        assert list(d_k) == d_m, (ast, k, use_wand)
        assert np.array_equal(np.asarray(s_k, F32), s_m), (ast, k, use_wand)


@settings(max_examples=60, deadline=None)
@given(
    corpus=corpus_st,
    query=query_st,
    k=st.sampled_from([None, 1, 3]),
    rank=st.integers(min_value=0, max_value=4),
    allow=st.one_of(st.none(), st.sets(st.integers(min_value=0, max_value=25))),
)
def test_kernel_cutoff_and_allowed(corpus, query, k, rank, allow):
    """The search_after pushdown (`score_cutoff`) and the docid filter
    (`allowed`) against the model: the kernel must return the filtered
    ranking truncated at k + #ties-at-cutoff (the driver re-applies the
    exact cursor predicate, so ties at the cutoff must all survive)."""
    seg = build_segment(corpus)
    ast = _resolve_prefixes(
        query, sorted({t for toks in corpus["body"] for t in TOKENIZE(toks)})
    )
    naive = NaiveSegment(corpus)
    d_all, s_all = model_topk(naive, ast, None)

    allowed = None
    if allow is not None:
        # include out-of-range ids on purpose: the kernel must ignore them
        allowed = np.array(sorted(allow), np.int64)
        hits = [(d, s) for d, s in zip(d_all, s_all) if d in allow]
        d_all = [d for d, _ in hits]
        s_all = np.array([s for _, s in hits], F32)

    cutoff = None
    if rank < len(d_all):
        cutoff = float(s_all[rank])
        kept = [(d, s) for d, s in zip(d_all, s_all) if s <= F32(cutoff)]
        ties = sum(1 for _, s in kept if s >= F32(cutoff))
        kk = (k + ties) if k is not None else None
        d_all = [d for d, _ in kept][:kk]
        s_all = np.array([s for _, s in kept], F32)[:kk]
    elif k is not None:
        d_all, s_all = d_all[:k], s_all[:k]

    d_k, s_k = evaluate_segment(
        seg, ast, TOK, k=k, allowed=allowed, score_cutoff=cutoff
    )
    assert list(d_k) == list(d_all), (ast, k, cutoff, allowed)
    assert np.array_equal(np.asarray(s_k, F32), s_all), (ast, k, cutoff, allowed)


@settings(max_examples=40, deadline=None)
@given(corpus=corpus_st, query=query_st)
def test_kernel_partition_union(corpus, query):
    """Splitting the corpus into two segments and merging per-segment
    MATCH SETS equals the single-segment match set (BM25 *scores* are
    segment-statistics-dependent by design — the reference's per-split
    Searcher — so only membership is partition-invariant)."""
    n = len(corpus["body"])
    cut = n // 2
    if cut == 0:
        return
    ast = _resolve_prefixes(
        query, sorted({t for toks in corpus["body"] for t in TOKENIZE(toks)})
    )
    whole = build_segment(corpus)
    left = build_segment({f: v[:cut] for f, v in corpus.items()})
    right = build_segment({f: v[cut:] for f, v in corpus.items()})
    dw, _ = evaluate_segment(whole, ast, TOK, k=None)
    dl_, _ = evaluate_segment(left, ast, TOK, k=None)
    dr, _ = evaluate_segment(right, ast, TOK, k=None)
    union = sorted(set(dl_.tolist()) | {d + cut for d in dr.tolist()})
    assert sorted(dw.tolist()) == union, ast


# --------------------------------------------------------------------------
# query-string parser robustness
# --------------------------------------------------------------------------

_QS_ATOMS = [
    "(", ")", '"', ":", "[", "]", "{", "}", "TO", "AND", "OR", "NOT",
    "*", "-", "+", "~1", "^2", "body:", "title:", "zeb*", "t1", "zoo",
    "IN", " ", "\t", "\\", "'", ">=", "<", "2021-01-01", "*:*", "_exists_:",
]


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.text(max_size=40),
        st.lists(st.sampled_from(_QS_ATOMS), max_size=12).map("".join),
        st.lists(st.sampled_from(_QS_ATOMS), max_size=12).map(" ".join),
    )
)
def test_parser_never_crashes(q):
    """parse_query on arbitrary input either yields a QueryAst or raises
    ValueError — never IndexError/KeyError/AttributeError (the engine
    surfaces ValueError as a 400; anything else would be a 500)."""
    from quickwit_spark.query.parser import parse_query
    from quickwit_spark.query.ast import QueryAst

    try:
        ast = parse_query(q, default_fields=["body"], position_fields={"body"})
    except ValueError:
        return
    assert isinstance(ast, QueryAst), q


# --------------------------------------------------------------------------
# oracle mode (f64, global statistics) — the scoring mode every DuckDB
# gate depends on; its defining property is PARTITION INVARIANCE
# --------------------------------------------------------------------------

F64 = float  # python floats are IEEE f64 — same ops as the kernel's np.float64


def _global_stats(corpus):
    fields, terms = {}, {}
    for f, texts in corpus.items():
        toklists = [TOKENIZE(t) for t in texts]
        fields[f] = {
            "doc_count": len(toklists),
            "total_tokens": sum(map(len, toklists)),
        }
        for t in {t for tl in toklists for t in tl}:
            terms[(f, t)] = sum(1 for tl in toklists if t in tl)
    return {"fields": fields, "terms": terms}


def _oracle_term_score(seg, gs, field, term, d, boost):
    df = gs["terms"].get((field, term), 0)
    tf = seg.tf(field, d, term) if df else 0
    if df == 0 or tf == 0:
        return None
    fs = gs["fields"][field]
    n = fs["doc_count"]
    avgdl = fs["total_tokens"] / max(n, 1)
    dl = float(len(seg.toks[field][d]))  # oracle uses EXACT lengths
    w = np.log1p((n - df + 0.5) / (df + 0.5)) * (1.0 + 1.2) * boost
    tc = tf / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    return w * tc


def model_eval_oracle(seg, gs, node, d, boost=1.0):
    """f64 per-doc (match, score) with global stats — mirrors the
    kernel's mode='oracle' semantics (phrase df = rarest component's
    global df, partition-invariant by construction)."""
    if isinstance(node, MatchAll):
        return True, 0.0
    if isinstance(node, MatchNone):
        return False, 0.0
    if isinstance(node, Boost):
        return model_eval_oracle(seg, gs, node.query, d, boost * node.boost)
    if isinstance(node, (Term, TermSet, FullText)):
        if isinstance(node, Term):
            terms, op = [(node.field, node.value)], "or"
        elif isinstance(node, TermSet):
            terms, op = [(node.field, v) for v in node.values], "or"
        else:
            toks = TOKENIZE(node.text)
            if not toks:
                return (True, 0.0) if node.zero_terms_match_all else (False, 0.0)
            terms, op = [(node.field, t) for t in toks], node.operator
        score, count = 0.0, 0
        for f, t in terms:
            s = _oracle_term_score(seg, gs, f, t, d, boost)
            if s is not None:
                score += s
                count += 1
        return count >= (len(terms) if op == "and" else 1), score
    if isinstance(node, Phrase):
        toks = TOKENIZE(node.text)
        if not toks:
            return False, 0.0
        field, slop = node.field, node.slop
        fixed, last = toks[:-1], toks[-1:]
        if len(toks) == 1:
            s = _oracle_term_score(seg, gs, field, toks[0], d, boost)
            return (s is not None), (s or 0.0)
        cnt = _doc_phrase_count(seg, field, fixed, last, slop, d)
        if cnt == 0:
            return False, 0.0
        dfs = [gs["terms"].get((field, t), 0) for t in toks]
        df = min(dfs)
        fs = gs["fields"][field]
        n = fs["doc_count"]
        avgdl = fs["total_tokens"] / max(n, 1)
        dl = float(len(seg.toks[field][d]))
        w = np.log1p((n - df + 0.5) / (df + 0.5)) * (1.0 + 1.2) * boost
        return True, w * (cnt / (cnt + 1.2 * (0.25 + 0.75 * dl / avgdl)))
    if isinstance(node, Exists):
        toks = seg.toks.get(node.field)
        return (toks is not None and len(toks[d]) > 0), 0.0
    if isinstance(node, Bool):
        match, score = None, 0.0
        for cl in node.must:
            m, s = model_eval_oracle(seg, gs, cl, d, boost)
            score += s
            match = m if match is None else (match and m)
        for cl in node.filter:
            m, _ = model_eval_oracle(seg, gs, cl, d, boost)
            match = m if match is None else (match and m)
        if node.should:
            scount = 0
            for cl in node.should:
                m, s = model_eval_oracle(seg, gs, cl, d, boost)
                if m:
                    score += s
                    scount += 1
            msm = node.minimum_should_match
            if match is None:
                match = (scount >= msm) if msm else (scount > 0)
            elif msm:
                match = match and scount >= msm
        if match is None:
            match = bool(node.must_not)
        for cl in node.must_not:
            m, _ = model_eval_oracle(seg, gs, cl, d, 0.0)
            match = match and not m
        return match, score
    raise AssertionError(node)


# PhrasePrefix is excluded: its oracle df depends on which expansion
# terms a segment happens to contain, so it is not partition-invariant
# (the engine resolves expansions globally before the kernel runs).
oracle_query_st = st.recursive(
    leaf.filter(lambda n: not isinstance(n, PhrasePrefix)), _extend, max_leaves=6
)


@settings(max_examples=80, deadline=None)
@given(corpus=corpus_st, query=oracle_query_st, cut_frac=st.floats(0.2, 0.8))
def test_oracle_mode_partition_invariant(corpus, query, cut_frac):
    """mode='oracle' scores must be bitwise identical whether the corpus
    is one segment or two — and must equal the independent f64 model.
    This is what lets the DuckDB gates compare Spark output to ANSI-SQL
    replays regardless of how the build partitioned the docs."""
    gs = _global_stats(corpus)
    naive = NaiveSegment(corpus)
    ast = query
    n = len(corpus["body"])
    expected = {}
    for d in range(n):
        m, s = model_eval_oracle(naive, gs, ast, d)
        if m:
            expected[d] = s

    whole = build_segment(corpus)
    dw, sw = evaluate_segment(whole, ast, TOK, k=None, mode="oracle", global_stats=gs)
    got_whole = dict(zip(dw.tolist(), sw.tolist()))
    assert got_whole == expected, (ast, "whole")

    cut = max(1, min(n - 1, int(n * cut_frac)))
    left = build_segment({f: v[:cut] for f, v in corpus.items()})
    right = build_segment({f: v[cut:] for f, v in corpus.items()})
    got_split = {}
    for seg, off in ((left, 0), (right, cut)):
        d_s, s_s = evaluate_segment(seg, ast, TOK, k=None, mode="oracle", global_stats=gs)
        got_split.update({d + off: s for d, s in zip(d_s.tolist(), s_s.tolist())})
    assert got_split == expected, (ast, "split")


# --------------------------------------------------------------------------
# ES DSL lowering robustness
# --------------------------------------------------------------------------

_ES_KINDS = [
    "term", "terms", "range", "match", "match_phrase", "match_phrase_prefix",
    "match_bool_prefix", "multi_match", "query_string", "bool", "wildcard",
    "regexp", "exists", "match_all", "match_none", "nope",
]
_es_scalar = st.one_of(
    st.none(), st.booleans(), st.integers(-5, 5), st.text(max_size=8),
    st.sampled_from(["t1", "zoo", "50%", "-25%", "*", "a b", "[", "now"]),
)
_es_val = st.recursive(
    _es_scalar,
    lambda v: st.one_of(
        st.lists(v, max_size=3),
        st.dictionaries(
            st.sampled_from(
                ["body", "title", "value", "query", "gte", "lte", "gt", "lt",
                 "boost", "operator", "fields", "minimum_should_match", "slop",
                 "analyzer", "must", "should", "must_not", "filter", "format"]
            ),
            v,
            max_size=4,
        ),
    ),
    max_leaves=8,
)
_es_query = st.dictionaries(st.sampled_from(_ES_KINDS), _es_val, min_size=0, max_size=2)


@settings(max_examples=300, deadline=None)
@given(q=_es_query)
def test_es_dsl_never_crashes(q):
    """from_es_query on arbitrary body shapes either lowers to a
    QueryAst or raises within the tuple the wire layer converts to ES
    error envelopes — anything else would surface as a 500."""
    from quickwit_spark.query.es_dsl import from_es_query
    from quickwit_spark.query.ast import QueryAst

    try:
        ast = from_es_query(q, default_fields=["body"])
    except (ValueError, TypeError, KeyError, NotImplementedError):
        return
    assert isinstance(ast, QueryAst), q


@settings(max_examples=200, deadline=None)
@given(
    body=st.dictionaries(
        st.sampled_from(["query", "sort", "size", "from", "aggs", "x"]),
        _es_val,
        max_size=3,
    )
)
def test_es_body_query_never_crashes(body):
    """Same property through the full `_search` body entry point."""
    from quickwit_spark.query.es_dsl import from_es_body
    from quickwit_spark.query.ast import QueryAst

    try:
        ast = from_es_body(body, default_fields=["body"])
    except (ValueError, TypeError, KeyError, NotImplementedError):
        return
    assert isinstance(ast, QueryAst), body


# --------------------------------------------------------------------------
# ES sort-spec parsing robustness (driver-side pure functions)
# --------------------------------------------------------------------------

_sort_params = st.one_of(
    st.none(),
    st.sampled_from(["asc", "desc", "ascending", 3]),
    st.dictionaries(
        st.sampled_from(["order", "format", "missing", "mode"]),
        st.sampled_from(["asc", "desc", "epoch_nanos_int", "epoch_millis", 1]),
        max_size=2,
    ),
)
_sort_entry = st.one_of(
    st.sampled_from(["_score", "_doc", "_shard_doc", "ts", "n"]),
    st.dictionaries(
        st.sampled_from(["_score", "_doc", "ts", "n"]), _sort_params,
        min_size=0, max_size=2,
    ),
)
_sort_spec = st.one_of(
    _sort_entry,
    st.lists(_sort_entry, max_size=3),
    st.dictionaries(
        st.sampled_from(["_score", "_doc", "ts", "n"]), _sort_params,
        min_size=0, max_size=3,
    ),
)


@settings(max_examples=400, deadline=None)
@given(spec=_sort_spec)
def test_es_sort_parsing_never_crashes(spec):
    """Every accepted sort spec parses to [(str, bool)] pairs with any
    post-`_doc` keys dropped; every rejected one raises within the
    tuple the wire converts to a 400 — the reference deserializer
    (FieldSortVecVisitor + FieldSortParams deny_unknown_fields) never
    500s either."""
    from quickwit_spark.search.engine import IndexSearcher

    try:
        specs = IndexSearcher._parse_es_sort(spec)
        IndexSearcher._is_score_sort(spec)
    except (ValueError, TypeError, KeyError, NotImplementedError):
        return
    assert all(
        isinstance(f, str) and isinstance(d, bool) for f, d in specs
    ), spec
    # take_while_inclusive: nothing after a doc key
    if "doc_key" in [f for f, _ in specs]:
        assert [f for f, _ in specs].index("doc_key") == len(specs) - 1

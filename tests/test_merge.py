"""Merge policy + executor tests.

Policy properties mirror the reference's merge-policy proptests
(`quickwit-indexing/src/merge_policy/mod.rs:222-336`); executor tests
assert search-result invariance under merging (including the salted /
chunked hot-term path) and mid-merge resume.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from quickwit_spark.index import manifest as mf
from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.index.merge import MergeOp, MergePolicy, plan_merges, run_merges
from quickwit_spark.query.ast import FullText, Term
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.sources.corpus import web_corpus

SMALL_POLICY = MergePolicy(
    merge_factor=3, max_merge_factor=4, min_level_num_docs=50, split_num_docs_target=10_000
)


def _seg(i, docs, pid=0, gen=0):
    return mf.SegmentRecord(
        segment_id=f"s{i:04d}", num_docs=docs, partition_id=pid, merge_gen=gen
    )


def test_levels():
    p = MergePolicy()
    assert p.level_of(0) == 0
    assert p.level_of(299_999) == 0
    assert p.level_of(300_000) == 1
    assert p.level_of(899_999) == 1
    assert p.level_of(900_000) == 2


def test_plan_groups_same_level_and_partition():
    segs = [_seg(i, 100) for i in range(6)] + [_seg(10 + i, 100, pid=1) for i in range(3)]
    ops = plan_merges(segs, SMALL_POLICY)
    assert len(ops) == 2  # 6 in p0 → one op of 4; 3 in p1 → one op of 3
    sizes = sorted(len(o.segment_ids) for o in ops)
    assert sizes == [3, 4]
    for op in ops:
        pids = {s.partition_id for s in segs if s.segment_id in op.segment_ids}
        assert len(pids) == 1


def test_mature_segments_never_merged():
    segs = [_seg(i, 20_000) for i in range(10)]
    assert plan_merges(segs, SMALL_POLICY) == []


@given(
    st.lists(st.integers(min_value=1, max_value=30_000), min_size=0, max_size=60)
)
@settings(max_examples=100, deadline=None)
def test_plan_properties(doc_counts):
    segs = [_seg(i, d) for i, d in enumerate(doc_counts)]
    ops = plan_merges(segs, SMALL_POLICY)
    seen = set()
    for op in ops:
        assert SMALL_POLICY.merge_factor <= len(op.segment_ids) <= SMALL_POLICY.max_merge_factor
        # disjoint
        assert not (seen & set(op.segment_ids))
        seen |= set(op.segment_ids)
        # same level, immature only
        by_id = {s.segment_id: s for s in segs}
        lvls = {SMALL_POLICY.level_of(by_id[sid].num_docs) for sid in op.segment_ids}
        assert len(lvls) == 1
        assert all(
            by_id[sid].num_docs < SMALL_POLICY.split_num_docs_target
            for sid in op.segment_ids
        )


@pytest.fixture(scope="module")
def merged_index(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idxm"))
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("url",),
        time_column="warc_ts",
    )
    # 4 incremental ingest jobs into the same index → 4 young segments
    # per routing partition (merges only group within a partition, like
    # the reference's MergePlanner)
    corpus = web_corpus(spark, sf_dir)
    for j in range(4):
        chunk = corpus.filter((corpus.doc_id % 4) == j)
        build_index(spark, chunk, d, cfg, job_id=f"m{j}")
    searcher_before = IndexSearcher(spark, d)
    q = FullText("text", "spark join merge", "or")
    before = {
        "matches": {r["doc_key"] for r in searcher_before.search_stream(Term("text", "spark"), []).collect()},
        "topk": [
            (r["doc_key"], r["score"])
            for r in searcher_before.search(q, k=15, mode="oracle").collect()
        ],
        "count": searcher_before.count("*"),
    }
    # aggressive policy (8 segments of ~60 docs each → merges down)
    # tiny chunk target forces the multi-chunk hot-term path
    merged = run_merges(
        spark,
        d,
        MergePolicy(merge_factor=2, max_merge_factor=4, min_level_num_docs=10, split_num_docs_target=100_000),
        num_salt_buckets=2,
        chunk_target_docs=64,
    )
    assert merged  # something actually merged
    return d, before


def test_merge_reduces_segments(spark, merged_index):
    d, _ = merged_index
    segs = mf.live_segments(d)
    assert len(segs) < 8  # 2 partitions × 4 jobs merged down
    assert sum(s.num_docs for s in segs) == 500
    assert any(s.merge_gen > 0 for s in segs)


def test_search_invariant_under_merge(spark, merged_index):
    d, before = merged_index
    s = IndexSearcher(spark, d)
    assert s.count("*") == before["count"]
    got = {r["doc_key"] for r in s.search_stream(Term("text", "spark"), []).collect()}
    assert got == before["matches"]
    q = FullText("text", "spark join merge", "or")
    topk = [(r["doc_key"], r["score"]) for r in s.search(q, k=15, mode="oracle").collect()]
    assert topk == before["topk"]  # oracle mode: global stats ⇒ identical


def test_wand_on_merged_chunked_postings(spark, merged_index):
    d, _ = merged_index
    s = IndexSearcher(spark, d)
    q = FullText("text", "the spark data", "or")  # hot terms → chunked
    with_wand = [(r["doc_key"], r["score"]) for r in s.search(q, k=10, use_wand=True).collect()]
    without = [(r["doc_key"], r["score"]) for r in s.search(q, k=10, use_wand=False).collect()]
    assert with_wand == without


def test_merge_resume_idempotent(spark, merged_index):
    d, _ = merged_index
    # rerunning the same policy plans nothing new (checkpointed ops)
    again = run_merges(
        spark,
        d,
        MergePolicy(merge_factor=2, max_merge_factor=4, min_level_num_docs=10, split_num_docs_target=100_000),
        num_salt_buckets=2,
        chunk_target_docs=64,
    )
    assert again == [] or all(r.merge_gen > 0 for r in again)
    segs = mf.live_segments(d)
    assert sum(s.num_docs for s in segs) == 500


def test_const_write_amplification_policy():
    from quickwit_spark.index.merge import ConstWriteAmplificationMergePolicy

    from quickwit_spark.index import manifest as mf

    def seg(i, gen, docs=1000, pid=0):
        return mf.SegmentRecord(
            segment_id=f"s{i:03d}", partition_id=pid, num_docs=docs, merge_gen=gen
        )

    pol = ConstWriteAmplificationMergePolicy(merge_factor=3, max_merge_factor=3)
    # 4 young gen-0 segments → one op of 3; gen mismatch never merged
    ops = pol.plan([seg(i, 0) for i in range(4)] + [seg(9, 1)])
    assert len(ops) == 1 and len(ops[0].segment_ids) == 3
    assert ops[0].merge_gen == 1
    # segments at max_merge_ops are final
    ops = pol.plan([seg(i, 4) for i in range(6)])
    assert ops == []
    # different partitions don't merge together
    ops = pol.plan([seg(i, 0, pid=i % 2) for i in range(6)])
    assert all(
        len(op.segment_ids) == 3 for op in ops
    ) and len(ops) == 2 or len(ops) == 0  # 3 per partition


def test_multi_generation_merge_chunked_positions_norms(
    spark, sf_dir, tmp_path_factory
):
    """Regression: re-merging already-merged segments whose terms have
    MULTIPLE chunk rows (postings, positions, norms) must pair position
    chunks with their posting chunks and rebase norms chunk starts —
    results invariant across two merge generations."""
    from pyspark.sql import functions as F

    from quickwit_spark.query.ast import Phrase
    from quickwit_spark.sources.corpus import web_corpus

    d = str(tmp_path_factory.mktemp("idxgen2"))
    cfg = IndexConfig(
        fields=[FieldConfig("text", record="position")],
        doc_key="doc_id",
        num_partitions=1,
    )
    corpus = web_corpus(spark, sf_dir)
    for j in range(4):
        build_index(
            spark, corpus.filter((corpus.doc_id % 4) == j), d, cfg, job_id=f"g{j}"
        )
    s0 = IndexSearcher(spark, d)
    pdf = corpus.toPandas()
    toks = {int(k): t for k, t in zip(pdf["doc_id"], pdf["text"].str.split())}
    # pick the corpus's most common bigram as the phrase under test
    from collections import Counter

    big = Counter()
    for t in toks.values():
        big.update(zip(t, t[1:]))
    (w1, w2), _ = big.most_common(1)[0]
    phrase = f"{w1} {w2}"
    q = FullText("text", f"{w1} {w2} spark", "or")
    before = {
        "phrase": {
            r["doc_key"] for r in s0.search_stream(Phrase("text", phrase), []).collect()
        },
        "topk": [
            (r["doc_key"], r["score"])
            for r in s0.search(q, k=15, mode="oracle").collect()
        ],
        "count": s0.count("*"),
    }
    exp_phrase = {
        k
        for k, t in toks.items()
        if any(a == w1 and b == w2 for a, b in zip(t, t[1:]))
    }
    assert before["phrase"] == exp_phrase and exp_phrase

    # round 1: 4 → 2 (factor 2, tiny chunks force the multi-chunk path);
    # round 2 inside the same run_merges loop: 2 merged → 1 (gen 2) —
    # its inputs' hot terms now arrive as SEVERAL chunk rows per segment
    run_merges(
        spark,
        d,
        MergePolicy(merge_factor=2, max_merge_factor=2, min_level_num_docs=10,
                    split_num_docs_target=100_000),
        num_salt_buckets=2,
        chunk_target_docs=32,
    )
    segs = mf.live_segments(d)
    assert len(segs) == 1 and segs[0].merge_gen >= 2

    s = IndexSearcher(spark, d)
    assert s.count("*") == before["count"]
    got_phrase = {
        r["doc_key"] for r in s.search_stream(Phrase("text", phrase), []).collect()
    }
    assert got_phrase == before["phrase"]
    topk = [
        (r["doc_key"], r["score"]) for r in s.search(q, k=15, mode="oracle").collect()
    ]
    assert topk == before["topk"]


def test_norms_marker_term_collision(spark, tmp_path):
    """A text term that equals a chunked-norms start marker (20-digit
    zero-padded number) must not be confused with the norms row when a
    merged segment is merged again."""
    from quickwit_spark.index.merge import execute_merge

    marker = f"{32:020d}"  # the start marker of the 2nd 32-doc chunk
    rows = [(i, f"{marker} w{i} filler common") for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=1)
    build_index(spark, df.filter("doc_id < 32"), idx, cfg, job_id="a")
    build_index(spark, df.filter("doc_id >= 32"), idx, cfg, job_id="b")
    segs = [s.segment_id for s in mf.live_segments(idx)]
    # first merge with small chunks → chunked norms rows whose term
    # column is the docid start marker ('...032' among them)
    execute_merge(
        spark,
        idx,
        MergeOp(op_id="m0", segment_ids=segs, partition_id=0, merge_gen=1),
        chunk_target_docs=32,
    )
    # add one more segment and merge AGAIN: the (text, marker) group now
    # holds both the marker TERM's postings and the norms chunk row
    extra = spark.createDataFrame(
        [(100 + i, f"{marker} extra") for i in range(4)], "doc_id long, text string"
    )
    build_index(spark, extra, idx, cfg, job_id="c")
    segs2 = [s.segment_id for s in mf.live_segments(idx)]
    execute_merge(
        spark,
        idx,
        MergeOp(op_id="m1", segment_ids=segs2, partition_id=0, merge_gen=2),
        chunk_target_docs=32,
    )
    s = IndexSearcher(spark, idx)
    assert s.count("*") == 68
    assert s.count(Term("text", marker)) == 68  # marker term survives
    assert s.count(Term("text", "common")) == 64
    # norms intact: BM25 scoring over the remerged segment works and
    # doc lengths differ between 4-token and 2-token docs
    hits = s.search(Term("text", marker), k=68, mode="oracle").collect()
    assert len(hits) == 68
    scores = {r["doc_key"]: r["score"] for r in hits}
    assert scores[100] > scores[0]  # shorter doc scores higher


def test_merge_preserves_doc_key_order_for_tied_topk(spark, tmp_path):
    """Regression: inputs whose key ranges interleave (always true
    under hash routing) must still rank tied-score/match-all top-k by
    doc_key after a merge — the permutation rebasing, not the old
    concat-shift, guarantees doc_id asc == doc_key asc."""
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher

    idx = str(tmp_path / "interleaved")
    cfg = IndexConfig(
        fields=[FieldConfig("text", record="position")],
        doc_key="doc_id", num_partitions=1,
    )
    # batch 1 holds the HIGH keys, batch 2 the LOW keys
    b1 = spark.createDataFrame(
        [(i, f"alpha beta doc{i} gamma") for i in range(100, 200)],
        ["doc_id", "text"])
    b2 = spark.createDataFrame(
        [(i, f"alpha beta doc{i} gamma") for i in range(0, 100)],
        ["doc_id", "text"])
    build_index(spark, b1, idx, cfg, job_id="j1")
    build_index(spark, b2, idx, cfg, job_id="j2")
    merged = run_merges(
        spark, idx, MergePolicy(merge_factor=2, min_level_num_docs=10)
    )
    assert len(merged) == 1
    s = IndexSearcher(spark, idx)
    # match-all fast path truncates per segment by doc_id — only valid
    # because the merged segment is key-ascending again
    assert [r["doc_key"] for r in s.search("*", k=5).collect()] == [
        199, 198, 197, 196, 195]
    # every doc scores identically for 'alpha' → pure tie-break order
    assert [r["doc_key"] for r in s.search("alpha", k=5).collect()] == [
        199, 198, 197, 196, 195]
    assert s.count("alpha") == 200
    # positions survived the permutation gather
    assert s.count('"alpha beta"') == 200
    assert [r["doc_key"] for r in s.search('"beta doc150"', k=3).collect()] == [150]


# ---------------------------------------------------------------- policy config


def test_merge_policy_from_config():
    from quickwit_spark.index.merge import (
        ConstWriteAmplificationMergePolicy,
        NopMergePolicy,
        merge_policy_from_config,
    )

    # default + empty → stable_log with reference defaults
    p = merge_policy_from_config(None)
    assert isinstance(p, MergePolicy) and p.merge_factor == 10
    p = merge_policy_from_config({})
    assert isinstance(p, MergePolicy)

    p = merge_policy_from_config(
        {"type": "stable_log", "merge_factor": 8, "max_merge_factor": 11,
         "min_level_num_docs": 50_000, "maturation_period": "2 days"}
    )
    assert isinstance(p, MergePolicy)
    assert (p.merge_factor, p.max_merge_factor, p.min_level_num_docs) == (8, 11, 50_000)
    assert p.maturation_period_secs == 2 * 86400

    p = merge_policy_from_config({"type": "limit_merge", "merge_factor": 5})
    assert isinstance(p, ConstWriteAmplificationMergePolicy)
    assert p.merge_factor == 5

    p = merge_policy_from_config({"type": "no_merge"})
    assert isinstance(p, NopMergePolicy)
    assert p.plan([_seg(0, 10), _seg(1, 10)]) == []

    with pytest.raises(ValueError):
        merge_policy_from_config({"type": "tiered"})
    with pytest.raises(ValueError):
        merge_policy_from_config({"type": "stable_log", "max_merge_ops": 3})
    with pytest.raises(ValueError):
        merge_policy_from_config({"type": "no_merge", "maturation_period": "1h"})


def test_duration_parse():
    from quickwit_spark.index.merge import _parse_duration_secs

    assert _parse_duration_secs("48h") == 48 * 3600
    assert _parse_duration_secs("30 days") == 30 * 86400
    assert _parse_duration_secs("1w 2d") == 9 * 86400
    assert _parse_duration_secs("90s") == 90
    assert _parse_duration_secs("5m") == 300  # minutes
    assert _parse_duration_secs("1M") == 30 * 86400  # months
    for bad in ("", "h", "12", "1 parsec", "0s"):
        with pytest.raises(ValueError):
            _parse_duration_secs(bad)


def test_age_maturity_excludes_old_segments():
    now = 1_000_000.0
    young = mf.SegmentRecord(segment_id="sy", num_docs=100, create_timestamp=int(now) - 100)
    old = mf.SegmentRecord(segment_id="so", num_docs=100, create_timestamp=int(now) - 7200)
    unknown = mf.SegmentRecord(segment_id="su", num_docs=100)  # ts=0 → stays immature
    pol = MergePolicy(
        merge_factor=2, max_merge_factor=3, min_level_num_docs=50,
        maturation_period_secs=3600,
    )
    ops = plan_merges([young, old, unknown], pol, now=now)
    assert len(ops) == 1
    assert sorted(ops[0].segment_ids) == ["su", "sy"]
    # limit_merge honors the same rule
    from quickwit_spark.index.merge import ConstWriteAmplificationMergePolicy

    cpol = ConstWriteAmplificationMergePolicy(
        merge_factor=2, max_merge_factor=3, maturation_period_secs=3600
    )
    cops = cpol.plan([young, old, unknown], now=now)
    assert len(cops) == 1 and sorted(cops[0].segment_ids) == ["su", "sy"]


def test_plan_never_mixes_doc_mapping_uids():
    """Reference MergePartition = (partition_id, doc_mapping_uid)
    (`merge_planner.rs:41-53` + its test_simple_merge_planner_with_
    multiple_doc_mappings): splits built under different doc mappings
    are planned separately, same partition or not."""
    segs = [
        mf.SegmentRecord(segment_id=f"a{i}", num_docs=100) for i in range(3)
    ] + [
        mf.SegmentRecord(segment_id=f"b{i}", num_docs=100, doc_mapping_uid=1)
        for i in range(3)
    ]
    ops = plan_merges(segs, SMALL_POLICY)
    assert len(ops) == 2
    by_uid = {op.doc_mapping_uid: op for op in ops}
    assert sorted(by_uid) == [0, 1]
    assert sorted(by_uid[0].segment_ids) == ["a0", "a1", "a2"]
    assert sorted(by_uid[1].segment_ids) == ["b0", "b1", "b2"]
    # a mixed group below merge_factor per uid produces NO op
    mixed = segs[:2] + segs[3:5]  # 2 of each uid
    assert plan_merges(mixed, SMALL_POLICY) == []


def test_const_write_amp_groups_by_doc_mapping_uid():
    from quickwit_spark.index.merge import ConstWriteAmplificationMergePolicy

    pol = ConstWriteAmplificationMergePolicy(merge_factor=2, max_merge_factor=2)
    segs = [
        mf.SegmentRecord(segment_id="x0", num_docs=10),
        mf.SegmentRecord(segment_id="x1", num_docs=10, doc_mapping_uid=2),
    ]
    assert pol.plan(segs) == []
    segs.append(mf.SegmentRecord(segment_id="x2", num_docs=10, doc_mapping_uid=2))
    ops = pol.plan(segs)
    assert len(ops) == 1 and ops[0].doc_mapping_uid == 2
    assert sorted(ops[0].segment_ids) == ["x1", "x2"]


def test_merged_block_max_respects_configured_k1_b(
    spark, sf_dir, tmp_path_factory
):
    """The merged block-max bound must use the INDEX's k1/b, not the
    defaults: with k1*(1-b) below the default's 0.3 a hardcoded bound
    under-estimates short docs' tf-component and WAND can prune blocks
    holding true top-k hits. WAND top-k on the merged index must equal
    the exhaustive (use_wand=False) ranking."""
    d = str(tmp_path_factory.mktemp("k1b") / "idx")
    cfg = IndexConfig(
        fields=[FieldConfig("text")], doc_key="doc_id",
        num_partitions=1, k1=0.5, b=0.9,
    )
    corpus = web_corpus(spark, sf_dir)
    half = corpus.count() // 2
    build_index(spark, corpus.filter(f"doc_id < {half}"), d, cfg, job_id="a")
    build_index(spark, corpus.filter(f"doc_id >= {half}"), d, cfg, job_id="b")
    recs = run_merges(
        spark, d, policy=MergePolicy(merge_factor=2, max_merge_factor=2,
                                     min_level_num_docs=10)
    )
    assert recs  # a merge actually ran
    s = IndexSearcher(spark, d)
    for q in (Term("text", "table"), FullText("text", "spark join", "or")):
        wand = [(r["doc_key"], round(r["score"], 5))
                for r in s.search(q, k=10, use_wand=True).collect()]
        full = [(r["doc_key"], round(r["score"], 5))
                for r in s.search(q, k=10, use_wand=False).collect()]
        assert wand == full

    # bound VALIDITY under a short-doc skew (the sharp check: WAND
    # equality above rarely tickles the gap): a dl=1 doc's true
    # tf-component 1/(1 + k1*(1-b) + k1*b*dl/avgdl) exceeds the
    # default-constants bound 1/(1 + 0.3), so a merged block_max
    # computed with hardcoded k1/b would UNDER-estimate it
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from quickwit_spark.codec.postings import decode_block_metadata
    from quickwit_spark.index.builder import KIND_POSTINGS

    d2 = str(tmp_path_factory.mktemp("k1b2") / "idx")
    filler = " ".join(f"w{i}" for i in range(99))
    rows = [Row(doc_id=0, text="zebra")] + [
        Row(doc_id=i, text=f"zebra {filler}") for i in range(1, 51)
    ]
    df2 = spark.createDataFrame(rows)
    build_index(spark, df2.filter("doc_id < 25"), d2, cfg, job_id="a")
    build_index(spark, df2.filter("doc_id >= 25"), d2, cfg, job_id="b")
    recs2 = run_merges(
        spark, d2, policy=MergePolicy(merge_factor=2, max_merge_factor=2,
                                      min_level_num_docs=2)
    )
    assert recs2
    st = recs2[0].field_stats["text"]
    avgdl = np.float32(st["total_tokens"]) / np.float32(st["doc_count"])
    true_comp = 1.0 / (1.0 + 0.5 * (1 - 0.9) + 0.5 * 0.9 * 1.0 / float(avgdl))
    zrows = (
        spark.read.parquet(f"{d2}/inv")
        .filter(
            (F.col("kind") == KIND_POSTINGS)
            & (F.col("term") == "zebra")
            & (F.col("segment_id") == recs2[0].segment_id)
        )
        .select("block_max")
        .collect()
    )
    assert zrows
    bound = max(
        float(decode_block_metadata(b"", r["block_max"])[1].max())
        for r in zrows
    )
    assert bound >= true_comp - 1e-6, (bound, true_comp)

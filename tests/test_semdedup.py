"""SemDeDup semantic dedup (datapipe/semdedup.py): hand-built vector
sets with known cluster structure, keep-order semantics, the
upper-triangular drop rule, and the learned-centroid path."""

import numpy as np
import pytest

from quickwit_spark.datapipe.semdedup import semdedup

# two orthogonal directions -> two obvious clusters
E1 = [1.0, 0.0, 0.0, 0.0]
E2 = [0.0, 1.0, 0.0, 0.0]


def _vec(base, eps, at):
    v = list(base)
    v[at] += eps
    return v


def _df(spark):
    rows = [
        (0, E1),                      # cluster A, exact
        (1, E1),                      # duplicate of 0
        (2, _vec(E1, 0.05, 1)),       # near-dup of 0 (cos ~0.9988)
        (3, _vec(E1, 2.0, 2)),        # same cluster, far (cos ~0.45)
        (4, E2),                      # cluster B
        (5, _vec(E2, 0.03, 2)),       # near-dup of 4
        (6, _vec(E2, 3.0, 3)),        # far member of B
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


CENTROIDS = np.array([E1, E2])


def test_marks_with_fixed_centroids(spark):
    out = {
        r["vec_id"]: r
        for r in semdedup(
            _df(spark), threshold=0.95, centroids=CENTROIDS
        ).collect()
    }
    assert {v["cluster"] for k, v in out.items() if k in (0, 1, 2, 3)} == {0}
    assert {v["cluster"] for k, v in out.items() if k in (4, 5, 6)} == {1}
    # keep="far": ranks ascend by cent_sim, so the exact-match items
    # (cent_sim 1.0) rank LAST and get dropped against earlier members
    dups = {k for k, v in out.items() if v["is_semdup"]}
    # 0,1,2 are mutual near-dups: exactly two of them are dropped
    assert len(dups & {0, 1, 2}) == 2
    assert 3 not in dups and 6 not in dups
    assert len(dups & {4, 5}) == 1


def test_keep_near_flips_survivor(spark):
    far = {
        r["vec_id"]: r["is_semdup"]
        for r in semdedup(
            _df(spark), threshold=0.95, centroids=CENTROIDS, keep="far"
        ).collect()
    }
    near = {
        r["vec_id"]: r["is_semdup"]
        for r in semdedup(
            _df(spark), threshold=0.95, centroids=CENTROIDS, keep="near"
        ).collect()
    }
    # far-first keeps 2 (lowest cent_sim of the 0/1/2 group);
    # near-first keeps 0 (exact match, key tie-break beats 1)
    assert far[2] is False and near[2] is True
    assert near[0] is False
    with pytest.raises(ValueError, match="far"):
        semdedup(_df(spark), centroids=CENTROIDS, keep="nope")


def test_threshold_one_keeps_everything(spark):
    out = semdedup(_df(spark), threshold=1.01, centroids=CENTROIDS).collect()
    assert not any(r["is_semdup"] for r in out)


def test_learned_centroids_path(spark):
    df = _df(spark)
    out = {
        r["vec_id"]: r
        for r in semdedup(df, k=2, threshold=0.95, seed=1).collect()
    }
    # same grouping discovered by k-means: A-items share a cluster id,
    # B-items the other; dedup behavior matches the fixed-centroid run
    a = {out[i]["cluster"] for i in (0, 1, 2)}
    b = {out[i]["cluster"] for i in (4, 5)}
    assert len(a) == 1 and len(b) == 1 and a != b
    assert len({k for k, v in out.items() if v["is_semdup"]} & {0, 1, 2}) == 2
    with pytest.raises(ValueError, match="k= or centroids="):
        semdedup(df)

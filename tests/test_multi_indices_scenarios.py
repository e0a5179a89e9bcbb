"""Replay of the reference's multi-indices REST scenario corpus
(`rest-api-tests/scenarii/es_compatibility/multi-indices/*.yaml`):
index-pattern federation through the wire layer — comma lists
(URL-encoded too), `-pattern` negation, 404 only for missing CONCRETE
names, zero-match patterns as valid empty searches, cross-index hit
merge with `_index` per hit and no score renormalization, federated
field sort, federated scroll, and aggregations over the union
(reference root fan-out, `root.rs:162-168,561`).

The corpus runs on a server that already holds the parent 100-doc
`gharchive` index from the es_compatibility setup (its final step
asserts `gharchive*` totals 104), so the env is that index plus the
corpus' own `gharchive-1`/`gharchive-2`.
"""

from __future__ import annotations

import os

import pytest

from tests.scenario_utils import (
    SCEN_ROOT,
    QwScenarioEnv,
    build_gharchive_searcher,
    load_steps,
    run_corpus_steps,
)

MULTI_DIR = os.path.join(SCEN_ROOT, "es_compatibility", "multi-indices")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MULTI_DIR), reason="reference scenario corpus not present"
)


def corpus_files() -> list[str]:
    if not os.path.isdir(MULTI_DIR):
        return []
    return sorted(
        f for f in os.listdir(MULTI_DIR) if f.endswith(".yaml") and f[0] == "0"
    )


@pytest.fixture(scope="module")
def multi_env(spark, tmp_path_factory):
    work = tmp_path_factory.mktemp("multi_indices")
    env = QwScenarioEnv(spark, MULTI_DIR, str(work))
    env.searchers["gharchive"] = build_gharchive_searcher(
        spark, str(work / "gharchive")
    )
    env._wire = None  # rebuild the wire over all three indexes
    return env


@pytest.mark.parametrize("fname", corpus_files())
def test_multi_indices_scenario(multi_env, fname):
    ctx_steps = load_steps(os.path.join(MULTI_DIR, "_ctx.yaml"))
    ctx = ctx_steps[0] if ctx_steps else {}
    steps = load_steps(os.path.join(MULTI_DIR, fname))
    run_corpus_steps(multi_env, fname, steps, ctx, skip_steps={})

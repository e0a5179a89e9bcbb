"""Replay of the reference's non-ES scenario corpora (native search
API, tag fields, sort orders, aggregations, concat fields, default
search fields, multi-split optimizations, search_after edge cases).

Same golden-fragment checker as `test_es_scenarios` (see
`scenario_utils`); each corpus directory builds its own indexes from
`_setup.quickwit.yaml` through the reference-config translator
(`sources.qw_config`) and replays every step. Steps exercising
engine-specific sketch artifacts (tantivy's HLL/percentile
approximation errors) are skipped explicitly with reasons.
"""

from __future__ import annotations

import os

import pytest

from scenario_utils import (
    SCEN_ROOT,
    QwScenarioEnv,
    load_steps,
    run_corpus_steps,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SCEN_ROOT), reason="reference scenario corpus not present"
)

CORPORA = [
    "qw_search_api",
    "tag_fields",
    "sort_orders",
    "default_search_fields",
    "concat_fields",
    "aggregations",
    "multi_splits",
    "search_after",
    "es_field_capabilities",
]

# (corpus, file, step) → reason
SKIP_STEPS: dict[tuple[str, str, int], str] = {
    ("aggregations", "0001-aggregations.yaml", 13): (
        "expected cardinality 5.0 encodes tantivy's HLL++ collision "
        "error — the scenario itself comments 'the correct number is "
        "6'; our sketch returns the true count"
    ),
}


def corpus_files():
    out = []
    if not os.path.isdir(SCEN_ROOT):
        return out
    for c in CORPORA:
        d = os.path.join(SCEN_ROOT, c)
        for f in sorted(os.listdir(d)):
            if f.endswith(".yaml") and f[0] == "0":
                out.append((c, f))
    return out


_envs: dict[str, QwScenarioEnv] = {}


@pytest.fixture
def env_for(spark, tmp_path_factory):
    def get(corpus: str) -> QwScenarioEnv:
        if corpus not in _envs:
            _envs[corpus] = QwScenarioEnv(
                spark,
                os.path.join(SCEN_ROOT, corpus),
                str(tmp_path_factory.mktemp(f"qw_{corpus}")),
            )
        return _envs[corpus]

    return get


@pytest.mark.parametrize("corpus,fname", corpus_files())
def test_corpus_scenario(env_for, corpus, fname):
    import yaml

    env = env_for(corpus)
    ctx_path = os.path.join(SCEN_ROOT, corpus, "_ctx.yaml")
    ctx = {}
    if os.path.exists(ctx_path):
        with open(ctx_path) as f:
            ctx = yaml.safe_load(f) or {}
    ctx.pop("api_root", None)
    ctx.pop("headers", None)
    steps = load_steps(os.path.join(SCEN_ROOT, corpus, fname))
    skips = {
        (f, i): why
        for (c, f, i), why in SKIP_STEPS.items()
        if c == corpus
    }
    run_corpus_steps(env, fname, steps, ctx, skips)

"""Replay of the reference's REST golden scenarios (parity harness).

The reference ships an end-to-end ES-compatibility corpus:
`rest-api-tests/scenarii/es_compatibility/*.yaml` — ~150 request steps
with expected-JSON fragments, run against a 100-doc gharchive index
built with DYNAMIC doc mapping (`_setup.quickwit.yaml`: mode dynamic,
expand_dots, positional dynamic tokenizer, lowercase fast normalizer,
`index_field_presence`). This module rebuilds that index through
`sources.dynamic` + `index.builder` and replays every step through the
wire layer (`search.es_wire`), asserting the reference's own expected
values — the strongest rank/count parity evidence available without a
network.

Checker semantics mirror the reference's `run_tests.py:156-199`:
expected dicts are FRAGMENTS (only listed keys checked), expected lists
match length + elementwise, `$expect` entries are Python predicates over
`val`. Steps marked `engines: [elasticsearch]` are skipped exactly like
the reference runner does for quickwit. A small explicit skip table
covers steps exercising surface this engine does not claim (exact
on-disk byte sizes in `_cat`, admin index deletion mid-suite).

Scenario YAML + fixture data are read from /root/reference at test time
(skipped wholesale when absent); nothing is copied into this repo.
"""

from __future__ import annotations

import gzip
import json
import os

import pytest

SCEN_DIR = "/root/reference/quickwit/rest-api-tests/scenarii/es_compatibility"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SCEN_DIR), reason="reference scenario corpus not present"
)

# (file, step index) → reason; steps whose expectations are inherently
# host/engine-specific. Everything else must pass.
SKIP_STEPS: dict[tuple[str, int], str] = {
    ("0021-cat-indices.yaml", 0): "expects otel-* indexes + exact kb sizes",
    ("0021-cat-indices.yaml", 1): "expects exact on-disk kb sizes",
    ("0021-cat-indices.yaml", 3): "expects exact on-disk kb sizes",
    ("0021-cat-indices.yaml", 4): "expects exact on-disk kb sizes",
    ("0021-cat-indices.yaml", 5): "expects exact on-disk kb sizes",
    ("0021-cat-indices.yaml", 6): "expects exact on-disk kb sizes",
    ("0021-cat-indices.yaml", 7): "expects exact on-disk kb sizes",
}

# whole files exercising surface out of scope for the replay
SKIP_FILES: dict[str, str] = {
    "0024-delete_indices.yaml": "deletes/recreates indexes mid-suite (admin)",
}


def scenario_files() -> list[str]:
    if not os.path.isdir(SCEN_DIR):
        return []
    return sorted(
        f
        for f in os.listdir(SCEN_DIR)
        if f.endswith(".yaml") and f[0] == "0" and f not in SKIP_FILES
    )


def load_steps(path: str) -> list[dict]:
    import yaml

    with open(path) as f:
        data = f.read()
    steps = []
    for chunk in data.split("\n---"):
        chunk = chunk.strip()
        if not chunk:
            continue
        d = yaml.safe_load(chunk)
        if isinstance(d, dict):
            steps.append(d)
    return steps


# ------------------------------------------------------------- checker
# faithful port of the reference run_tests.py check_result semantics


def check_result(result, expected, path=""):
    if isinstance(expected, dict) and "$expect" in expected:
        exps = expected["$expect"]
        exps = [exps] if isinstance(exps, str) else exps
        for e in exps:
            assert eval(e, None, {"val": result}), (
                f"$expect failed at {path}: {e!r} on {result!r}"
            )
        return
    assert type(result) is type(expected) or (
        isinstance(result, type(expected))
    ), f"type mismatch at {path}: {type(result)} vs {type(expected)}"
    if isinstance(expected, dict):
        for k, v in expected.items():
            assert k in result, f"missing key {k!r} at {path} in {result!r}"
            check_result(result[k], v, f"{path}.{k}")
    elif isinstance(expected, list):
        assert len(result) == len(expected), (
            f"length mismatch at {path}: {len(result)} vs {len(expected)}"
        )
        for i, (left, right) in enumerate(zip(result, expected)):
            check_result(left, right, f"{path}[{i}]")
    else:
        assert result == expected, (
            f"value mismatch at {path}: got {result!r}, want {expected!r}"
        )


# ------------------------------------------------------------- fixture


@pytest.fixture(scope="module")
def gharchive_wire(spark, tmp_path_factory):
    from quickwit_spark.index.builder import build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.search.es_wire import EsWireHandler
    from quickwit_spark.sources.dynamic import (
        SOURCE_COLUMN,
        dynamic_index_config,
        flatten_dynamic,
    )

    bulk = os.path.join(SCEN_DIR, "gharchive-bulk.json.gz")
    lines = []
    with gzip.open(bulk, "rt") as f:
        for i, line in enumerate(f):
            if i % 2 == 1:  # skip the `{"index": ...}` action lines
                lines.append(line.strip())
    wrapped = [
        json.dumps({"_qw_key": i, "_qw_raw": l, "doc": json.loads(l)})
        for i, l in enumerate(lines)
    ]
    raw = spark.read.json(spark.sparkContext.parallelize(wrapped, 1))
    df = raw.select("_qw_key", "_qw_raw", "doc.*").withColumnRenamed(
        "_qw_raw", SOURCE_COLUMN
    )
    # the setup's explicit field_mappings layered over dynamic mode
    # (`_setup.quickwit.yaml`): created_at datetime fast at millisecond
    # precision (timestamp_field), repo.name text with RAW fast
    # normalizer, everything else dynamic (lowercase fast normalizer)
    flat, fields = flatten_dynamic(
        df,
        exclude=("_qw_key", SOURCE_COLUMN),
        mapped={
            "created_at": {"kind": "datetime", "precision": "milliseconds"},
            "repo.name": {"normalizer": "raw"},
        },
    )
    cfg = dynamic_index_config(
        fields,
        doc_key="_qw_key",
        source_column=SOURCE_COLUMN,
        time_field="created_at",
        num_partitions=1,
    )
    idx = str(tmp_path_factory.mktemp("gharchive_idx"))
    build_index(spark, flat, idx, cfg)
    # the setup also creates `empty_index` (a datetime mapping, no docs)
    from quickwit_spark.index.builder import FieldConfig, IndexConfig

    empty_df = spark.createDataFrame(
        [], "doc_id long, body string, created_at timestamp"
    )
    empty_idx = str(tmp_path_factory.mktemp("empty_idx"))
    build_index(
        spark,
        empty_df,
        empty_idx,
        IndexConfig(
            fields=[FieldConfig("body")],
            doc_key="doc_id",
            num_partitions=1,
            time_column="created_at",
        ),
    )
    return EsWireHandler(
        {
            "gharchive": IndexSearcher(spark, idx),
            "empty_index": IndexSearcher(spark, empty_idx),
        }
    )


# -------------------------------------------------------------- runner


def _resolve_previous(node, previous):
    """`{"$previous": "<expr over val>"}` placeholders (scroll ids)."""
    if isinstance(node, dict):
        if "$previous" in node:
            return eval(node["$previous"], None, {"val": previous})
        return {k: _resolve_previous(v, previous) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_previous(x, previous) for x in node]
    return node


@pytest.mark.parametrize("fname", scenario_files())
def test_scenario(gharchive_wire, fname):
    from quickwit_spark.search.es_wire import EsApiError

    steps = load_steps(os.path.join(SCEN_DIR, fname))
    previous = None
    ran = 0
    for i, step in enumerate(steps):
        if (fname, i) in SKIP_STEPS:
            continue
        engines = step.get("engines")
        if engines and "quickwit" not in engines:
            continue  # elasticsearch-only quirk, like the reference runner
        endpoint = step.get("endpoint", "gharchive/_search")
        method = step.get("method", "GET")
        method = method[0] if isinstance(method, list) else method
        params = step.get("params") or {}
        body = _resolve_previous(step.get("json"), previous)
        ndjson = step.get("ndjson")
        expected_status = step.get("status_code", 200)
        try:
            result = gharchive_wire.request(
                method, endpoint, params=params, body=body, ndjson=ndjson
            )
        except EsApiError as e:
            assert expected_status is None or expected_status == e.status, (
                f"{fname} step {i}: unexpected status {e.status} "
                f"({e.reason!r}), wanted {expected_status}"
            )
            result = e.response()
        else:
            assert expected_status in (None, 200), (
                f"{fname} step {i}: expected HTTP {expected_status} error, "
                f"request succeeded"
            )
        if step.get("expected") is not None:
            check_result(result, step["expected"], path=f"{fname}[{i}]")
        previous = result
        ran += 1
    assert ran > 0 or all(
        (fname, i) in SKIP_STEPS
        or (steps[i].get("engines") and "quickwit" not in steps[i]["engines"])
        for i in range(len(steps))
    )


def test_msearch_header_must_name_an_index(gharchive_wire):
    """The reference fails the WHOLE _msearch request when a header has
    no index (`rest_handler.rs:822-824`), and accepts a JSON array of
    indices in the header (`MultiSearchHeader.index: Vec<String>`)."""
    from quickwit_spark.search.es_wire import EsApiError

    with pytest.raises(EsApiError) as ei:
        gharchive_wire.request(
            "POST",
            "_msearch",
            ndjson=[{}, {"query": {"match_all": {}}, "size": 0}],
        )
    assert ei.value.status == 400
    assert "at least one index" in ei.value.reason

    res = gharchive_wire.request(
        "POST",
        "_msearch",
        ndjson=[
            {"index": ["gharchive", "empty_index"]},
            {"query": {"match_all": {}}, "size": 0},
        ],
    )
    assert res["responses"][0]["hits"]["total"]["value"] == 100

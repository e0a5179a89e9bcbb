"""Replay of the reference's `_bulk` + cluster-info REST corpora through
the index-management facade.

The bulk corpus (`rest-api-tests/scenarii/es_compatibility/bulk/*.yaml`)
exercises the ingest-v2 handler end-to-end: happy-path item envelopes,
malformed-action and missing-index request 400s, per-doc
`document_parsing_exception` items, per-item `index_not_found_exception`
404s, and index-template auto-creation (`bulk_v2.rs:83-280`,
`index_template/mod.rs:55-99`). Its `_setup.quickwit.yaml` drives the
native admin API (index + template creation), so the env here is a
`QuickwitSpark` facade, with `_bulk` steps routed through the ES wire
handler exactly like a server would.

The info corpus (`scenarii/es_compatibility_info/0001-info.yaml`)
checks the `GET /` banner (`rest_handler.rs:70-93`).
"""

from __future__ import annotations

import os

import pytest

from tests.scenario_utils import check_result, load_steps

BULK_DIR = (
    "/root/reference/quickwit/rest-api-tests/scenarii/es_compatibility/bulk"
)
INFO_DIR = (
    "/root/reference/quickwit/rest-api-tests/scenarii/es_compatibility_info"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BULK_DIR), reason="reference scenario corpus not present"
)


class FacadeEnv:
    """Interpret setup/teardown admin steps + `_elastic` data steps
    against one QuickwitSpark root."""

    def __init__(self, spark, root: str):
        from quickwit_spark.api import QuickwitSpark

        self.qw = QuickwitSpark(spark, root)

    def admin(self, method: str, endpoint: str, body: dict | None):
        parts = [p for p in endpoint.strip("/").split("/") if p]
        if method == "DELETE" and parts[0] == "indexes":
            return self.qw.delete_index(parts[1])
        if method == "DELETE" and parts[0] == "templates":
            return self.qw.delete_template(parts[1])
        if method == "POST" and parts == ["indexes"]:
            return self.qw.create_index(body or {})
        if method == "POST" and parts == ["templates"]:
            return self.qw.create_template(body or {})
        raise AssertionError(f"unhandled admin step {method} {endpoint}")

    def run_setup(self, corpus_dir: str):
        for step in load_steps(
            os.path.join(corpus_dir, "_setup.quickwit.yaml")
        ):
            method = step.get("method", "GET")
            method = method[0] if isinstance(method, list) else method
            try:
                self.admin(method, step.get("endpoint", ""), step.get("json"))
            except ValueError:
                # the reference setup DELETEs possibly-absent state with
                # `status_code: null` (ignore-errors)
                if step.get("status_code", 200) is not None:
                    raise

    def request(self, method, endpoint, params=None, body=None, ndjson=None):
        # data steps run against api_root .../_elastic — a live view, so
        # indexes auto-created by a previous bulk are visible
        return self.qw.es().request(
            method, endpoint, params=params, body=body, ndjson=ndjson
        )


def bulk_files() -> list[str]:
    if not os.path.isdir(BULK_DIR):
        return []
    return sorted(
        f for f in os.listdir(BULK_DIR) if f.endswith(".yaml") and f[0] == "0"
    )


@pytest.mark.parametrize("fname", bulk_files())
def test_bulk_scenario(spark, tmp_path, fname):
    from tests.scenario_utils import run_corpus_steps

    env = FacadeEnv(spark, str(tmp_path / "root"))
    env.run_setup(BULK_DIR)
    ctx_steps = load_steps(os.path.join(BULK_DIR, "_ctx.yaml"))
    ctx = ctx_steps[0] if ctx_steps else {}
    steps = load_steps(os.path.join(BULK_DIR, fname))
    run_corpus_steps(env, fname, steps, ctx, skip_steps={})


def test_cluster_info_scenario(spark, tmp_path):
    env = FacadeEnv(spark, str(tmp_path / "root"))
    steps = load_steps(os.path.join(INFO_DIR, "0001-info.yaml"))
    assert steps
    for step in steps:
        result = env.request("GET", "/")
        check_result(result, step["expected"], path="info")


def test_delete_indices_scenario(spark, tmp_path):
    """Replay `es_compatibility/0024-delete_indices.yaml` (skipped by
    the static-index replay because it mutates indexes mid-suite): ES
    DELETE with comma patterns, 404 on missing concrete names,
    `ignore_unavailable`, 404 on double-delete."""
    from quickwit_spark.search.es_wire import EsApiError

    es_compat = os.path.join(BULK_DIR, "..")
    steps = load_steps(os.path.join(es_compat, "0024-delete_indices.yaml"))
    assert steps
    env = FacadeEnv(spark, str(tmp_path / "root"))
    for i, step in enumerate(steps):
        engines = step.get("engines")
        if engines and "quickwit" not in engines:
            continue
        method = step.get("method", "GET")
        method = method[0] if isinstance(method, list) else method
        api_root = step.get("api_root", "")
        expected_status = step.get("status_code", 200)
        try:
            if api_root.rstrip("/").endswith("api/v1"):
                env.admin(method, step.get("endpoint", ""), step.get("json"))
            else:
                env.request(
                    method,
                    step.get("endpoint", ""),
                    params=step.get("params"),
                    body=step.get("json"),
                )
        except EsApiError as e:
            assert expected_status == e.status, (
                f"step {i}: got {e.status} ({e.reason!r}), "
                f"wanted {expected_status}"
            )
        else:
            assert expected_status in (None, 200), (
                f"step {i}: expected {expected_status}, request succeeded"
            )
    assert env.qw.list_indexes() == []


def test_template_auto_creation_end_to_end(spark, tmp_path):
    """A bulk write to a template-matching missing index auto-creates it
    and the docs are immediately searchable through the wire layer."""
    env = FacadeEnv(spark, str(tmp_path / "root"))
    env.qw.create_template(
        {
            "template_id": "logs-template",
            "index_id_patterns": ["logs-*", "-logs-secret*"],
            "priority": 5,
            "doc_mapping": {"mode": "dynamic"},
        }
    )
    resp = env.request(
        "POST",
        "_bulk",
        ndjson=[
            {"index": {"_index": "logs-2024"}},
            {"message": "hello world"},
            {"index": {"_index": "logs-secret-x"}},
            {"message": "nope"},
        ],
    )
    assert resp["errors"] is True
    assert resp["items"][0]["index"]["status"] == 201
    assert resp["items"][1]["index"]["status"] == 404
    assert (
        resp["items"][1]["index"]["error"]["type"]
        == "index_not_found_exception"
    )
    assert "logs-2024" in env.qw.list_indexes()
    hits = env.request(
        "GET",
        "logs-2024/_search",
        body={"query": {"match": {"message": {"query": "hello"}}}},
    )
    assert hits["hits"]["total"]["value"] == 1


def test_federated_agg_mixed_resolution(spark, tmp_path):
    """An agg field that resolves differently per member (absent in one,
    dynamic in another) must still aggregate the member that HAS it —
    alignment is by reference position, not column name."""
    env = FacadeEnv(spark, str(tmp_path / "root"))
    env.qw.create_index({"index_id": "a-empty", "doc_mapping": {"mode": "dynamic"}})
    env.qw.create_index({"index_id": "b-data", "doc_mapping": {"mode": "dynamic"}})
    env.qw.ingest("b-data", [{"tag": "x"}, {"tag": "x"}, {"tag": "y"}])
    r = env.request(
        "POST",
        "a-empty,b-data/_search",
        body={
            "query": {"match_all": {}},
            "size": 0,
            "aggs": {"tags": {"terms": {"field": "tag"}}},
        },
    )
    buckets = r["aggregations"]["tags"]["buckets"]
    assert {b["key"]: b["doc_count"] for b in buckets} == {"x": 2, "y": 1}


def test_federated_tie_break_numeric(spark, tmp_path):
    """Score ties across digit-count boundaries order by NUMERIC doc id
    (engine tie order), not lexicographically."""
    env = FacadeEnv(spark, str(tmp_path / "root"))
    env.qw.create_index({"index_id": "tie1", "doc_mapping": {"mode": "dynamic"}})
    env.qw.create_index({"index_id": "tie2", "doc_mapping": {"mode": "dynamic"}})
    # identical docs → identical BM25 within each index
    env.qw.ingest("tie1", [{"m": "same text"} for _ in range(12)])
    env.qw.ingest("tie2", [{"m": "other words"}])
    r = env.request(
        "GET",
        "tie1,tie2/_search",
        body={"query": {"match": {"m": {"query": "same"}}}, "size": 12},
    )
    ids = [int(h["_id"]) for h in r["hits"]["hits"]]
    assert ids == sorted(ids)  # 2 before 10, numerically


def test_bulk_handler_stays_live_view(spark, tmp_path):
    """A long-lived es() handler sees indexes auto-created by its own
    bulk request and fresh data for ingested ones."""
    env = FacadeEnv(spark, str(tmp_path / "root"))
    env.qw.create_template(
        {
            "template_id": "tpl",
            "index_id_patterns": ["live-*"],
            "doc_mapping": {"mode": "dynamic"},
        }
    )
    handler = env.qw.es()  # ONE handler for the whole exchange
    handler.request(
        "POST",
        "_bulk",
        ndjson=[{"index": {"_index": "live-1"}}, {"m": "first doc"}],
    )
    r = handler.request(
        "GET", "live-1/_search", body={"query": {"match_all": {}}}
    )
    assert r["hits"]["total"]["value"] == 1
    handler.request(
        "POST",
        "_bulk",
        ndjson=[{"index": {"_index": "live-1"}}, {"m": "second doc"}],
    )
    r = handler.request(
        "GET", "live-1/_search", body={"query": {"match_all": {}}}
    )
    assert r["hits"]["total"]["value"] == 2


def test_delete_encoded_comma_ignore_unavailable(spark, tmp_path):
    env = FacadeEnv(spark, str(tmp_path / "root"))
    env.qw.create_index({"index_id": "keepme", "doc_mapping": {"mode": "dynamic"}})
    r = env.request(
        "DELETE", "keepme%2Cghost", params={"ignore_unavailable": "true"}
    )
    assert r == {"acknowledged": True}
    assert env.qw.list_indexes() == []


def test_bulk_method_gating(spark, tmp_path):
    from quickwit_spark.search.es_wire import EsApiError

    env = FacadeEnv(spark, str(tmp_path / "root"))
    with pytest.raises(EsApiError) as e:
        env.request("GET", "_bulk", ndjson=[{"index": {"_index": "x"}}, {}])
    assert e.value.status == 405
    with pytest.raises(EsApiError) as e:
        env.request("DELETE", "/")
    assert e.value.status == 405

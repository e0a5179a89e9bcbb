"""Shared machinery for replaying the reference's rest-api-tests
scenario corpora (`/root/reference/quickwit/rest-api-tests/scenarii`).

`load_steps` / `check_result` / `resolve_previous` mirror the reference
runner's semantics (`run_tests.py:156-199`): expected dicts are
fragments, lists match length+elementwise, `$expect` entries are Python
predicates over `val`.

`QwScenarioEnv` interprets a corpus' `_setup.quickwit.yaml` — index
creation through `sources.qw_config.parse_doc_mapping` (validation
errors = the setup's own expected 400s) and per-force-commit ingest
batches as separate index builds (one split per batch, like the
reference) — then routes scenario steps to the ES wire handler
(`_elastic/...`) or the native search adapter (`{index}/search`).
"""

from __future__ import annotations

import json
import os

SCEN_ROOT = "/root/reference/quickwit/rest-api-tests/scenarii"


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


def resolve_previous(node, previous):
    """`{"$previous": "<expr over val>"}` placeholders (scroll ids)."""
    if isinstance(node, dict):
        if "$previous" in node:
            return eval(node["$previous"], None, {"val": previous})
        return {k: resolve_previous(v, previous) for k, v in node.items()}
    if isinstance(node, list):
        return [resolve_previous(x, previous) for x in node]
    return node


def build_gharchive_searcher(spark, idx_dir: str):
    """Build the es_compatibility corpus' 100-doc gharchive index (its
    `_setup.quickwit.yaml` mapping: dynamic mode, created_at datetime
    fast-ms timestamp field, repo.name raw) and return a searcher —
    shared by corpora whose scenarios assume that parent index exists
    on the server (multi-indices)."""
    import gzip

    from quickwit_spark.index.builder import build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.dynamic import (
        SOURCE_COLUMN,
        dynamic_index_config,
        flatten_dynamic,
    )

    bulk = os.path.join(SCEN_ROOT, "es_compatibility", "gharchive-bulk.json.gz")
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
    build_index(spark, flat, idx_dir, cfg)
    return IndexSearcher(spark, idx_dir)


# ---------------------------------------------------------------- setup


class QwScenarioEnv:
    """Indexes + routers for one scenario corpus directory."""

    def __init__(self, spark, corpus_dir: str, workdir: str):
        self.spark = spark
        self.corpus_dir = corpus_dir
        self.workdir = workdir
        self.searchers: dict = {}
        self._wire = None
        self._build_from_setup()

    # -- setup interpretation

    def _build_from_setup(self):
        setup = os.path.join(self.corpus_dir, "_setup.quickwit.yaml")
        defs: dict[str, dict] = {}     # index_id -> creation json
        batches: dict[str, list] = {}  # index_id -> [list of doc dicts]
        for step in load_steps(setup):
            method = step.get("method", "GET")
            method = method[0] if isinstance(method, list) else method
            endpoint = step.get("endpoint", "")
            if method == "DELETE":
                continue
            if method == "POST" and endpoint.rstrip("/") == "indexes":
                body = step["json"]
                expected_status = step.get("status_code", 200)
                if expected_status == 400:
                    self._expect_invalid(body)
                    continue
                defs[body["index_id"]] = body
                batches.setdefault(body["index_id"], [])
            elif method == "POST" and endpoint.endswith("/ingest"):
                name = endpoint.rsplit("/", 1)[0]
                docs = step.get("ndjson") or step.get("shuffle_ndjson") or []
                batches.setdefault(name, []).append(list(docs))
        for name, body in defs.items():
            self._build_index(name, body, batches.get(name) or [])

    def _expect_invalid(self, body: dict):
        from quickwit_spark.sources.qw_config import parse_doc_mapping

        try:
            parse_doc_mapping(body.get("doc_mapping") or {})
        except ValueError:
            return
        raise AssertionError(
            f"setup expected 400 creating {body.get('index_id')!r}, "
            "but the doc mapping validated"
        )

    def _build_index(self, name: str, body: dict, doc_batches: list):
        from pyspark.sql import functions as F

        from quickwit_spark.index.builder import build_index
        from quickwit_spark.search.engine import IndexSearcher
        from quickwit_spark.sources.dynamic import (
            SOURCE_COLUMN,
            flatten_dynamic,
        )
        from quickwit_spark.sources.qw_config import (
            parse_doc_mapping,
            reference_index_config,
        )

        dm = body.get("doc_mapping") or {}
        specs = parse_doc_mapping(dm)
        dyn = dm.get("dynamic_mapping") or {}
        fast_opt = dyn.get("fast")
        dynamic_normalizer = (
            fast_opt.get("normalizer", "raw")
            if isinstance(fast_opt, dict)
            else "raw"
        )
        record = dyn.get("record", "freq")

        # global schema over ALL batches so every per-batch build
        # flattens to the identical column set (config identity)
        all_docs = [d for b in doc_batches for d in b]
        key0 = 0
        wrapped_batches: list[list[str]] = []
        for b in doc_batches:
            wrapped_batches.append(
                [
                    json.dumps(
                        {
                            "_qw_key": key0 + i,
                            "_qw_raw": json.dumps(d),
                            "doc": d,
                        }
                    )
                    for i, d in enumerate(b)
                ]
            )
            key0 += len(b)
        spark = self.spark
        if all_docs:
            full = spark.read.json(
                spark.sparkContext.parallelize(
                    [l for b in wrapped_batches for l in b], 1
                )
            )
            schema = full.schema
        else:
            # empty index: synthesize the schema from the explicit
            # mappings (timestamp columns type-checked by the engine)
            from pyspark.sql import types as T

            doc_fields = []
            for path, spec in specs.mapped.items():
                if "." in path:
                    continue  # keep the empty-schema synth flat
                t = {
                    "datetime": T.StringType(),
                    "long": T.LongType(),
                    "double": T.DoubleType(),
                    "bool": T.BooleanType(),
                }.get(spec.get("kind", "text"), T.StringType())
                doc_fields.append(T.StructField(path, t))
            if not doc_fields:
                doc_fields = [T.StructField("body", T.StringType())]
            schema = T.StructType(
                [
                    T.StructField("_qw_key", T.LongType()),
                    T.StructField("_qw_raw", T.StringType()),
                    T.StructField("doc", T.StructType(doc_fields)),
                ]
            )

        from quickwit_spark.sources.dynamic import detect_mixed_paths
        from quickwit_spark.sources.qw_config import add_document_size

        def nested_of(lines: list[str]):
            raw = spark.read.json(
                spark.sparkContext.parallelize(lines or [], 1), schema=schema
            )
            return raw.select("_qw_key", "_qw_raw", "doc.*").withColumnRenamed(
                "_qw_raw", SOURCE_COLUMN
            )

        # classify heterogeneous-typed dynamic paths ONCE over the full
        # corpus so every batch flattens to the identical column set
        mixed = detect_mixed_paths(
            nested_of([l for b in wrapped_batches for l in b] or []),
            exclude=("_qw_key", SOURCE_COLUMN),
            mapped=specs.mapped,
        )

        def flat_of(lines: list[str]):
            flat, flds = flatten_dynamic(
                nested_of(lines),
                exclude=("_qw_key", SOURCE_COLUMN),
                mapped=specs.mapped,
                dynamic_normalizer=dynamic_normalizer,
                mixed_paths=mixed,
            )
            if dm.get("store_document_size"):
                flat, flds = add_document_size(flat, flds, SOURCE_COLUMN)
            return flat, flds

        _, fields = flat_of([l for b in wrapped_batches for l in b] or [])
        cfg = reference_index_config(
            dm,
            fields,
            doc_key="_qw_key",
            source_column=SOURCE_COLUMN,
            num_partitions=1,
            record=record,
        )
        idx_dir = os.path.join(self.workdir, name)
        if not wrapped_batches:
            build_index(
                spark, flat_of([])[0], idx_dir, cfg, job_id="empty"
            )
        for bi, lines in enumerate(wrapped_batches):
            flat, _ = flat_of(lines)
            build_index(spark, flat, idx_dir, cfg, job_id=f"ing{bi:03d}")
        self.searchers[name] = IndexSearcher(spark, idx_dir)

    # -- routing

    @property
    def wire(self):
        if self._wire is None:
            from quickwit_spark.search.es_wire import EsWireHandler

            self._wire = EsWireHandler(self.searchers)
        return self._wire

    def request(self, method, endpoint, params=None, body=None, ndjson=None):
        from quickwit_spark.search.es_wire import EsApiError
        from quickwit_spark.search.native_api import native_search

        endpoint = endpoint.strip("/")
        if endpoint == "indexes" and method == "POST":
            # admin index creation — config validation only (the
            # tag_fields corpus asserts the reference's 400s)
            from quickwit_spark.sources.qw_config import (
                parse_doc_mapping,
                validate_search_settings,
            )

            try:
                dm = (body or {}).get("doc_mapping") or {}
                parse_doc_mapping(dm)
                validate_search_settings(dm, (body or {}).get("search_settings"))
            except ValueError as e:
                raise EsApiError(400, str(e)) from e
            return {"index_id": (body or {}).get("index_id")}
        if endpoint.startswith("_elastic/"):
            endpoint = endpoint[len("_elastic/"):]
            return self.wire.request(
                method, endpoint, params=params, body=body, ndjson=ndjson
            )
        parts = endpoint.split("/")
        if len(parts) == 2 and parts[1] == "search":
            s = self.searchers.get(parts[0])
            if s is None:
                raise EsApiError(404, f"index {parts[0]!r} not found")
            try:
                return native_search(s, params or {})
            except EsApiError:
                raise
            except (ValueError, TypeError, KeyError, NotImplementedError) as e:
                raise EsApiError(400, str(e)) from e
        # ES-shaped endpoints without the _elastic prefix (search_after
        # corpus ctx uses api_root .../_elastic/ with bare endpoints)
        return self.wire.request(
            method, endpoint, params=params, body=body, ndjson=ndjson
        )


def run_corpus_steps(env, fname: str, steps: list[dict], ctx: dict,
                     skip_steps: dict):
    """Replay one scenario file's steps against an env; asserts the
    reference's expected fragments."""
    from quickwit_spark.search.es_wire import EsApiError

    previous = None
    for i, step in enumerate(steps):
        if (fname, i) in skip_steps:
            continue
        merged = {**ctx, **step}
        engines = merged.get("engines")
        if engines and "quickwit" not in engines:
            continue
        endpoint = merged.get("endpoint", "")
        method = merged.get("method", "GET")
        method = method[0] if isinstance(method, list) else method
        params = merged.get("params") or {}
        body = resolve_previous(merged.get("json"), previous)
        ndjson = merged.get("ndjson")
        expected_status = merged.get("status_code", 200)
        try:
            result = env.request(
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
                "request succeeded"
            )
        if merged.get("expected") is not None:
            check_result(result, merged["expected"], path=f"{fname}[{i}]")
        previous = result

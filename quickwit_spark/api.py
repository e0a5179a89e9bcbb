"""Index-management facade — the reference's index REST API as a
library surface.

A user of the reference manages indexes through `POST /indexes`
(an index-config document), `POST /{index}/ingest` (NDJSON), and the
search endpoints. `QuickwitSpark` is that lifecycle over a shared
root directory (reference `index_management` handlers +
`quickwit-metastore` index lifecycle):

    qw = QuickwitSpark(spark, "/data/indexes")
    qw.create_index({"index_id": "logs", "doc_mapping": {...},
                     "search_settings": {...}})
    qw.ingest("logs", [{"level": "error", "ts": ...}, ...])
    qw.search("logs", {"query": {"match": {"level": {"query": "error"}}}})
    qw.es().request("GET", "logs/_search", body={...})   # full ES wire

Doc-mapping semantics match the reference's dynamic mode:

  - the corpus schema is inferred per ingest batch and MERGED with the
    index's cumulative schema (numeric widening, scalar conflicts →
    token strings), so later batches may ADD fields — older splits
    simply hold no postings/columns for them (additive doc-mapping
    evolution, enforced by the builder's config check),
  - previously-typed paths are PINNED: a later batch whose values no
    longer fit coerces to null (the reference's lenient coercion)
    instead of mutating the mapping under existing splits,
  - heterogeneous-typed paths (mixed int/float/bool JSON tokens) are
    classified on first sight and stay mixed (`sources.dynamic`
    per-type columns); docs missing a declared timestamp field are
    rejected at ingest.

Everything stays schema-first Column work — ingest is one read.json +
one flatten projection + the single-shuffle segment build.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import types as T

STATE_FILE = "_dynamic_state.json"


def merge_schemas(a: T.DataType, b: T.DataType) -> T.DataType:
    """Recursive schema union with the dynamic mapper's widening rules:
    long+double → double, null yields to anything, arrays merge
    element-wise, scalar conflicts → string (token form — mixed-type
    classification takes it from there)."""
    if a == b:
        return a
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        merged: dict[str, T.DataType] = {}
        order: list[str] = []
        for f in list(a.fields) + list(b.fields):
            if f.name not in merged:
                merged[f.name] = f.dataType
                order.append(f.name)
            else:
                merged[f.name] = merge_schemas(merged[f.name], f.dataType)
        return T.StructType([T.StructField(n, merged[n]) for n in order])
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(merge_schemas(a.elementType, b.elementType))
    if isinstance(a, T.ArrayType) or isinstance(b, T.ArrayType):
        arr, other = (a, b) if isinstance(a, T.ArrayType) else (b, a)
        return T.ArrayType(merge_schemas(arr.elementType, other))
    numeric = (
        T.LongType, T.IntegerType, T.ShortType, T.ByteType,
        T.DoubleType, T.FloatType,
    )
    if isinstance(a, numeric) and isinstance(b, numeric):
        return T.DoubleType()
    return T.StringType()


class QuickwitSpark:
    """Index lifecycle over one root directory."""

    def __init__(self, spark: SparkSession, root: str):
        from quickwit_spark.session import ship_package

        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        ship_package(spark)
        self._searchers: dict[str, object] = {}

    # ----------------------------------------------------------- admin

    def index_dir(self, index_id: str) -> str:
        if not index_id or "/" in index_id or index_id.startswith("."):
            raise ValueError(f"invalid index_id {index_id!r}")
        return os.path.join(self.root, index_id)

    def list_indexes(self) -> list[str]:
        return sorted(
            n
            for n in os.listdir(self.root)
            if os.path.exists(os.path.join(self.root, n, STATE_FILE))
        )

    def create_index(self, config: dict, exist_ok: bool = False) -> dict:
        """Validate + register an index from a reference index-config
        document ({index_id, doc_mapping, search_settings}); publishes
        an empty (zero-segment) index so it is immediately
        searchable."""
        from quickwit_spark.sources.qw_config import (
            parse_doc_mapping,
            validate_search_settings,
        )

        index_id = config["index_id"]
        dm = config.get("doc_mapping") or {}
        parse_doc_mapping(dm)
        validate_search_settings(dm, config.get("search_settings"))
        d = self.index_dir(index_id)
        state_path = os.path.join(d, STATE_FILE)
        if os.path.exists(state_path):
            if exist_ok:
                return {"index_id": index_id, "created": False}
            raise ValueError(f"index {index_id!r} already exists")
        os.makedirs(d, exist_ok=True)
        state = {
            "doc_mapping": dm,
            "search_settings": config.get("search_settings") or {},
            "schema": None,
            "mixed": [],
            "doc_count": 0,
            "batches": 0,
        }
        with open(state_path, "w") as f:
            json.dump(state, f)
        self._build(index_id, state, lines=None)  # empty publish
        return {"index_id": index_id, "created": True}

    def delete_index(self, index_id: str) -> None:
        d = self.index_dir(index_id)
        if not os.path.exists(os.path.join(d, STATE_FILE)):
            raise ValueError(f"index {index_id!r} not found")
        self._searchers.pop(index_id, None)
        shutil.rmtree(d)

    def describe_index(self, index_id: str) -> dict:
        return self.searcher(index_id).describe_index()

    # ---------------------------------------------------------- ingest

    def ingest(self, index_id: str, docs: list) -> dict:
        """One NDJSON batch → one committed split set. `docs` are dicts
        or JSON strings."""
        state = self._state(index_id)
        lines = [d if isinstance(d, str) else json.dumps(d) for d in docs]
        n = self._build(index_id, state, lines)
        self._searchers.pop(index_id, None)  # config may have grown
        return {"index_id": index_id, "num_docs": n}

    def _state(self, index_id: str) -> dict:
        path = os.path.join(self.index_dir(index_id), STATE_FILE)
        if not os.path.exists(path):
            raise ValueError(f"index {index_id!r} not found")
        with open(path) as f:
            return json.load(f)

    def _build(self, index_id: str, state: dict, lines: list | None) -> int:
        from quickwit_spark.index.builder import build_index
        from quickwit_spark.search.engine import IndexSearcher
        from quickwit_spark.sources.dynamic import (
            SOURCE_COLUMN,
            detect_mixed_paths,
            flatten_dynamic,
            scan_dynamic,
        )
        from quickwit_spark.sources.qw_config import (
            add_document_size,
            parse_doc_mapping,
            reference_index_config,
        )

        spark = self.spark
        dm = state["doc_mapping"]
        specs = parse_doc_mapping(dm)
        dyn = dm.get("dynamic_mapping") or {}
        fast_opt = dyn.get("fast")
        dynamic_normalizer = (
            fast_opt.get("normalizer", "raw")
            if isinstance(fast_opt, dict)
            else "raw"
        )
        record = dyn.get("record", "freq")

        key0 = int(state["doc_count"])
        wrapped = [
            json.dumps({"_qw_key": key0 + i, "_qw_raw": l, "doc": json.loads(l)})
            for i, l in enumerate(lines or [])
        ]

        # cumulative schema: stored ∪ this batch (additive evolution)
        if wrapped:
            batch_schema = spark.read.json(
                spark.sparkContext.parallelize(wrapped, 1)
            ).schema
        else:
            batch_schema = self._empty_schema(specs)
        if state.get("schema"):
            prev = T.StructType.fromJson(json.loads(state["schema"]))
            schema = merge_schemas(prev, batch_schema)
        else:
            schema = batch_schema

        nested = spark.read.json(
            spark.sparkContext.parallelize(wrapped or [], 1), schema=schema
        ).select("_qw_key", "_qw_raw", "doc.*").withColumnRenamed(
            "_qw_raw", SOURCE_COLUMN
        )

        # pin previously-seen paths: typed kinds stay typed (later
        # misfits coerce to null), mixed stays mixed, text stays text
        pinned = dict(state.get("pinned_kinds") or {})
        mapped = dict(specs.mapped)
        for path, kind in pinned.items():
            if path not in mapped and kind not in ("text", "mixed"):
                mapped[path] = {"kind": kind}
        prev_mixed = set(state.get("mixed") or [])
        seen = set(pinned)
        new_mixed = {
            p
            for p in detect_mixed_paths(
                nested, exclude=("_qw_key", SOURCE_COLUMN), mapped=mapped
            )
            if p not in seen
        }
        mixed = prev_mixed | new_mixed

        flat, fields = flatten_dynamic(
            nested,
            exclude=("_qw_key", SOURCE_COLUMN),
            mapped=mapped,
            dynamic_normalizer=dynamic_normalizer,
            mixed_paths=mixed,
        )
        if dm.get("store_document_size"):
            flat, fields = add_document_size(flat, fields, SOURCE_COLUMN)
        cfg = reference_index_config(
            dm,
            fields,
            doc_key="_qw_key",
            source_column=SOURCE_COLUMN,
            num_partitions=int(dm.get("num_partitions", 1)),
            record=record,
        )
        d = self.index_dir(index_id)
        build_index(
            spark, flat, d, cfg, job_id=f"ing{int(state['batches']):05d}"
        )

        state["schema"] = json.dumps(schema.jsonValue())
        state["mixed"] = sorted(mixed)
        state["pinned_kinds"] = {
            **pinned,
            **{f.path: f.kind for f in fields if f.path not in pinned},
        }
        n = len(wrapped)
        state["doc_count"] = key0 + n
        state["batches"] = int(state["batches"]) + 1
        with open(os.path.join(d, STATE_FILE), "w") as f:
            json.dump(state, f)
        return n

    def _empty_schema(self, specs) -> T.StructType:
        doc_fields = []
        for path, spec in specs.mapped.items():
            if "." in path:
                continue
            t = {
                "datetime": T.StringType(),
                "long": T.LongType(),
                "u64": T.LongType(),
                "double": T.DoubleType(),
                "bool": T.BooleanType(),
            }.get(spec.get("kind", "text"), T.StringType())
            doc_fields.append(T.StructField(path, t))
        if not doc_fields:
            doc_fields = [T.StructField("body", T.StringType())]
        return T.StructType(
            [
                T.StructField("_qw_key", T.LongType()),
                T.StructField("_qw_raw", T.StringType()),
                T.StructField("doc", T.StructType(doc_fields)),
            ]
        )

    # ---------------------------------------------------------- search

    def searcher(self, index_id: str):
        from quickwit_spark.search.engine import IndexSearcher

        self._state(index_id)  # existence check
        if index_id not in self._searchers:
            self._searchers[index_id] = IndexSearcher(
                self.spark, self.index_dir(index_id)
            )
        return self._searchers[index_id]

    def es(self):
        """ES wire handler over every index (live view)."""
        from quickwit_spark.search.es_wire import EsWireHandler

        return EsWireHandler(
            {n: self.searcher(n) for n in self.list_indexes()}
        )

    def search(self, index_id: str, body: dict) -> dict:
        """One `_search` request → the full ES wire envelope."""
        return self.es().request("GET", f"{index_id}/_search", body=body)

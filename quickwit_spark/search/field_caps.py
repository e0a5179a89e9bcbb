"""`_field_caps` — per-field type capabilities across indexes.

Reference surface: `quickwit-serve/src/elasticsearch_api/` field-caps
handler over the doc mapper's per-split field lists; exercised by
`rest-api-tests/scenarii/es_field_capabilities/0001`. Semantics:

  - caps are computed from the SPLITS that survive the request's
    time-range pruning (a field living only in pruned-out splits is
    absent from the response),
  - a dynamic text path reports BOTH `keyword` (raw fast column) and
    `text` (tokenized postings); typed leaves report their single type
    (`long`/`double`/`boolean`); datetime reports `date_nanos`; an
    explicit `ip` mapping reports `ip`,
  - heterogeneous (mixed-typed) paths report one entry per OBSERVED
    token type; when integers coexist with floats the columnar side is
    coerced to f64, so `long` is searchable but NOT aggregatable while
    `double` is (the reference's own scenario documents this quirk),
  - in a multi-index request a type entry carried by only a subset of
    the indexes lists them under `indices`.

One aggregate job per index per call — every probe rides a single
`df.agg(...)` over the time-pruned docmap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_INT_RE = r"^[+-]?\d+$"
_FLOAT_RE = r"^[+-]?((\d+\.\d*)|(\.\d+)|(\d+))([eE][+-]?\d+)?$"


def _cap(agg=True):
    return {"metadata_field": False, "searchable": True, "aggregatable": agg}


def index_field_caps(searcher, time_range=None) -> dict[str, dict]:
    """{dot path: {type name: caps dict}} for one index."""
    opts = searcher.config.field_options or {}
    docs = searcher.docs()
    if time_range is not None:
        keep = searcher._prune_segments(time_range)
        docs = docs.filter(F.col("segment_id").isin(list(keep)))
    dtypes = dict(docs.dtypes)

    probes = []
    metas = []  # (path, opt, col)
    for path, o in sorted(opts.items()):
        col = (o or {}).get("column", path)
        if col not in dtypes:
            continue
        i = len(metas)
        c = F.col(f"`{col}`")
        present = (
            F.exists(c, lambda x: x.isNotNull())
            if dtypes[col].startswith("array")
            else c.isNotNull()
        )
        probes.append(
            F.max(F.when(present, 1).otherwise(0)).alias(f"p{i}")
        )
        if (o or {}).get("mixed") and o.get("orig_column"):
            t = F.col(f"`{o['orig_column']}`")
            probes.append(
                F.max(F.when(t.rlike(_INT_RE), 1).otherwise(0)).alias(f"i{i}")
            )
            probes.append(
                F.max(
                    F.when(
                        t.rlike(_FLOAT_RE) & ~t.rlike(_INT_RE), 1
                    ).otherwise(0)
                ).alias(f"f{i}")
            )
            probes.append(
                F.max(
                    F.when(F.lower(t).isin("true", "false"), 1).otherwise(0)
                ).alias(f"b{i}")
            )
        elif dtypes[col] in ("double", "float"):
            # int+float JSON mixtures collapse to one f64 column at
            # schema inference; integral values stand in for the
            # original int tokens (the reference types JSON `5` as i64
            # per split — `id`'s cross-split case)
            probes.append(
                F.max(F.when(c == F.floor(c), 1).otherwise(0)).alias(f"i{i}")
            )
            probes.append(
                F.max(F.when(c != F.floor(c), 1).otherwise(0)).alias(f"f{i}")
            )
        metas.append((path, o or {}, col))
    if not metas:
        return {}
    # per-SPLIT probes: the columnar type is decided split-locally (a
    # split whose numeric tokens are all ints keeps an aggregatable i64
    # column even when another split holds floats — the reference's
    # cross-split vs intra-split mixed cases differ exactly here)
    rows = docs.groupBy("segment_id").agg(*probes).collect()

    def anyof(name):
        return any(r[name] for r in rows)

    out: dict[str, dict] = {}
    for i, (path, o, col) in enumerate(metas):
        if not anyof(f"p{i}"):
            continue  # absent from every surviving split
        dtype = dtypes[col]
        entry: dict[str, dict] = {}
        if o.get("caps") == "ip":
            entry["ip"] = _cap()
        elif o.get("mixed"):
            has_i = anyof(f"i{i}")
            has_f = anyof(f"f{i}")
            # long is aggregatable iff SOME split's column is pure-int
            long_agg = any(r[f"i{i}"] and not r[f"f{i}"] for r in rows)
            if has_i:
                entry["long"] = _cap(agg=long_agg)
            if has_f:
                entry["double"] = _cap()
            if anyof(f"b{i}"):
                entry["boolean"] = _cap()
        elif dtype.startswith("timestamp"):
            entry["date_nanos"] = {**_cap(), "type": "date_nanos"}
        elif dtype in ("string", "array<string>"):
            entry["keyword"] = {**_cap(), "type": "keyword"}
            entry["text"] = {**_cap(), "type": "text"}
        elif dtype in ("bigint", "int", "array<bigint>", "array<int>") or (
            dtype.startswith("decimal")
        ):
            entry["long"] = {**_cap(), "type": "long"}
        elif dtype in ("double", "float", "array<double>"):
            if anyof(f"i{i}"):
                entry["long"] = _cap(
                    agg=any(r[f"i{i}"] and not r[f"f{i}"] for r in rows)
                )
            entry["double"] = {**_cap(), "type": "double"}
        elif dtype.startswith("boolean") or dtype == "array<boolean>":
            entry["boolean"] = {**_cap(), "type": "boolean"}
        else:
            entry["keyword"] = {**_cap(), "type": "keyword"}
        for t, cap in entry.items():
            cap.setdefault("type", t)
        out[path] = entry
    return out


def merge_field_caps(per_index: dict[str, dict], fields_filter=None) -> dict:
    """Merge {index: {path: {type: caps}}} into the ES `_field_caps`
    response body; subset-carried type entries list their indexes."""
    import fnmatch

    names = sorted(per_index)
    fields: dict[str, dict] = {}
    carriers: dict[tuple, list] = {}
    for name in names:
        for path, entry in per_index[name].items():
            if fields_filter and not any(
                fnmatch.fnmatch(path, pat) for pat in fields_filter
            ):
                continue
            for t, cap in entry.items():
                fields.setdefault(path, {}).setdefault(t, dict(cap))
                carriers.setdefault((path, t), []).append(name)
    for (path, t), carrying in carriers.items():
        if len(carrying) < len(names):
            fields[path][t]["indices"] = sorted(carrying)
    return {"indices": names, "fields": fields}

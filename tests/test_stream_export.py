"""search_stream export formats (reference `search_stream/leaf.rs`):
CSV + ClickHouseRowBinary, optional partition_by_fast_field — outputs
byte-compared against independently-built oracle encodings."""

import glob
import os
import struct
import tempfile

import pytest
from pyspark.sql import functions as F

from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.query.ast import Term
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.sources.corpus import web_corpus


@pytest.fixture(scope="module")
def searcher(spark, sf_dir):
    idx = tempfile.mkdtemp(prefix="qws_stream_")
    docs = web_corpus(spark, sf_dir).withColumn("n_chars", F.length("text"))
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("lang", "n_chars"),
    )
    build_index(spark, docs, idx, cfg)
    return IndexSearcher(spark, idx)


def _leb128_decode(buf, pos):
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _decode_rowbinary(buf, types):
    """types: list of 'i8' | 'f8' | 's' in column order."""
    rows, pos = [], 0
    while pos < len(buf):
        row = []
        for t in types:
            if t == "i8":
                row.append(struct.unpack_from("<q", buf, pos)[0])
                pos += 8
            elif t == "i4":
                row.append(struct.unpack_from("<i", buf, pos)[0])
                pos += 4
            elif t == "f8":
                row.append(struct.unpack_from("<d", buf, pos)[0])
                pos += 8
            else:
                ln, pos = _leb128_decode(buf, pos)
                row.append(buf[pos : pos + ln].decode("utf-8"))
                pos += ln
        rows.append(tuple(row))
    return rows


def test_rowbinary_fixed_width_bytes(searcher):
    """Fixed-width-only schema: the file must byte-equal the oracle
    little-endian row encoding (numpy structured-array path)."""
    out_dir = tempfile.mkdtemp(prefix="qws_rb_")
    counts = searcher.export_stream(
        Term("text", "vector"), ["doc_key", "n_chars"], out_dir, fmt="rowbinary"
    )
    exp = sorted(
        (r["doc_key"], r["n_chars"])
        for r in searcher.search_stream(Term("text", "vector"), ["n_chars"]).collect()
    )
    (fp, nrows), = counts.items()
    assert nrows == len(exp)
    with open(fp, "rb") as f:
        buf = f.read()
    # oracle encoding: <q doc_key (Int64), <i n_chars (Int32) per row
    assert len(buf) == 12 * len(exp)
    got = sorted(_decode_rowbinary(buf, ["i8", "i4"]))
    assert got == exp
    oracle = b"".join(struct.pack("<qi", a, b) for a, b in got)
    assert sorted(
        [buf[i : i + 12] for i in range(0, len(buf), 12)]
    ) == sorted([oracle[i : i + 12] for i in range(0, len(oracle), 12)])


def test_rowbinary_strings_and_partition_by(searcher):
    out_dir = tempfile.mkdtemp(prefix="qws_rbp_")
    counts = searcher.export_stream(
        Term("text", "vector"),
        ["doc_key", "lang", "n_chars"],
        out_dir,
        fmt="rowbinary",
        partition_by="lang",
    )
    full = searcher.search_stream(
        Term("text", "vector"), ["lang", "n_chars"]
    ).collect()
    by_lang = {}
    for r in full:
        by_lang.setdefault(r["lang"], []).append(
            (r["doc_key"], r["lang"], r["n_chars"])
        )
    assert len(counts) == len(by_lang)
    for fp, nrows in counts.items():
        lang = os.path.basename(fp)[: -len(".bin")]
        with open(fp, "rb") as f:
            rows = _decode_rowbinary(f.read(), ["i8", "s", "i4"])
        assert nrows == len(by_lang[lang])
        assert sorted(rows) == sorted(by_lang[lang])


def test_csv_export_partitioned(spark, searcher):
    out_dir = tempfile.mkdtemp(prefix="qws_csv_") + "/out"
    searcher.export_stream(
        Term("text", "vector"), ["doc_key", "n_chars"], out_dir,
        fmt="csv", partition_by="lang",
    )
    # partition directories per lang value
    part_dirs = {os.path.basename(p) for p in glob.glob(f"{out_dir}/lang=*")}
    exp = searcher.search_stream(Term("text", "vector"), ["lang", "n_chars"]).collect()
    assert part_dirs == {f"lang={r['lang']}" for r in exp}
    # line-compare against the oracle CSV encoding
    lines = []
    for fp in glob.glob(f"{out_dir}/lang=*/*.csv"):
        lang = fp.split("lang=")[1].split("/")[0]
        with open(fp) as f:
            header = f.readline().strip()
            assert header == "doc_key,n_chars"
            lines += [f"{line.strip()},{lang}" for line in f if line.strip()]
    oracle = [f"{r['doc_key']},{r['n_chars']},{r['lang']}" for r in exp]
    assert sorted(lines) == sorted(oracle)


def test_rowbinary_distributed_writer_bytes(spark):
    """The executor-side part-file writer must byte-equal the
    single-writer reference assembly (collect chunks, sort stably by
    partition value) on multi-partition input, leave no _parts debris,
    and report per-file row counts."""
    from quickwit_spark.search.stream_export import (
        rowbinary_chunks,
        write_rowbinary,
    )

    rows = [(i, ["en", "de", "fr"][i % 3], float(i) * 0.5) for i in range(997)]
    df = spark.createDataFrame(rows, ["k", "lang", "score"]).repartition(7)

    for partition_by in (None, "lang"):
        ref: dict[str, bytes] = {}
        refrows: dict[str, int] = {}
        chunks = rowbinary_chunks(df, ["k", "lang", "score"], partition_by).collect()
        for r in sorted(chunks, key=lambda r: r["partition"]):
            name = f"{r['partition'] or 'all'}.bin"
            ref[name] = ref.get(name, b"") + bytes(r["chunk"])
            refrows[name] = refrows.get(name, 0) + r["num_rows"]

        out_dir = tempfile.mkdtemp(prefix="qws_rbd_")
        counts = write_rowbinary(df, ["k", "lang", "score"], out_dir, partition_by)
        assert not os.path.exists(os.path.join(out_dir, "_parts"))
        got = {os.path.basename(fp): n for fp, n in counts.items()}
        assert got == refrows
        for name, blob in ref.items():
            with open(os.path.join(out_dir, name), "rb") as f:
                assert f.read() == blob, name


def test_rowbinary_rejects_unsupported(spark):
    from quickwit_spark.search.stream_export import rowbinary_chunks

    df = spark.createDataFrame([(1, True)], ["k", "flag"])
    with pytest.raises(NotImplementedError):
        rowbinary_chunks(df, ["k", "flag"])


def test_rowbinary_colliding_filenames_append(spark):
    """Partition values '' and the literal 'all' both render to
    all.bin — they must append into one file (old shared-handle
    semantics), not overwrite each other."""
    from quickwit_spark.search.stream_export import write_rowbinary

    rows = [(1, ""), (2, "all"), (3, ""), (4, "all")]
    df = spark.createDataFrame(rows, "k long, grp string")
    out_dir = tempfile.mkdtemp(prefix="qws_rbc_")
    counts = write_rowbinary(df, ["k"], out_dir, partition_by="grp")
    (fp, n), = counts.items()
    assert os.path.basename(fp) == "all.bin" and n == 4
    with open(fp, "rb") as f:
        ks = sorted(_decode_rowbinary(f.read(), ["i8"]))
    assert ks == [(1,), (2,), (3,), (4,)]


def test_rowbinary_keep_parts_mode(spark):
    """keep_parts=True: no concatenation — _parts/ survives with an
    ordered _manifest.json whose recipe (concatenate each partition
    value's parts in manifest order) reproduces the assembled bytes
    byte-for-byte; the returned dict keys are RAW partition values
    ('' and 'all' stay distinct) reconciling 1:1 with the manifest."""
    import json as _json

    from quickwit_spark.search.stream_export import write_rowbinary

    rows = [(i, ["", "all", "de"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, grp string").repartition(5)

    ref_dir = tempfile.mkdtemp(prefix="qws_rbk_ref_")
    ref_counts = write_rowbinary(df, ["k"], ref_dir, partition_by="grp")

    out_dir = tempfile.mkdtemp(prefix="qws_rbk_")
    counts = write_rowbinary(
        df, ["k"], out_dir, partition_by="grp", keep_parts=True
    )
    # raw-valued keys, one per partition value
    assert counts == {"": 100, "all": 100, "de": 100}
    parts_dir = os.path.join(out_dir, "_parts")
    assert os.path.isdir(parts_dir)
    with open(os.path.join(out_dir, "_manifest.json")) as f:
        manifest = _json.load(f)
    assert sum(m["num_rows"] for m in manifest) == 300
    # manifest lists exactly the surviving part files
    assert sorted(m["file"] for m in manifest) == sorted(os.listdir(parts_dir))
    # assembling per the manifest reproduces the normal-mode output
    # ('' and 'all' merge into all.bin only at assembly time)
    assembled: dict[str, bytes] = {}
    for m in manifest:  # already (partition, file)-ordered
        name = f"{m['partition'] or 'all'}.bin"
        with open(os.path.join(parts_dir, m["file"]), "rb") as f:
            assembled[name] = assembled.get(name, b"") + f.read()
    for fp, _n in ref_counts.items():
        with open(fp, "rb") as f:
            assert f.read() == assembled[os.path.basename(fp)], fp

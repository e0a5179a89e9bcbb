"""WARC/1.0 reader + writer — the Common Crawl container format.

The north-rule corpus is "Common-Crawl-style web pages"; real CC data
arrives as WARC files (ISO 28500, public). This module closes that
loop: `write_warc` serializes a `(url, warc_ts, html)` DataFrame into
standard WARC response records, `read_warc` parses WARC files back
into rows, and the round-trip through `corpus.extract_text` is
byte-identical per url (tested).

Scale design: CC WARC files are ~1 GB each and records are not
splittable mid-file, so the unit of parallelism is the FILE — exactly
what `spark.read.format("binaryFile")` gives (one partition per file);
a 1000-executor cluster processes 1000 WARCs at a time, which is how
public CC pipelines shard. Parsing is an Arrow batch pass; the record
walk is offset arithmetic (Content-Length), never a delimiter split
over the payload (payloads may contain any bytes).

Record shape written (and the subset read): WARC-Type: response with
an HTTP/1.1 response block; warcinfo/request/metadata records in
inputs are skipped. Gzip members (.warc.gz is per-record gzip) are
supported on read via the stdlib decompressor.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"


def _record_bytes(url: str, ts, html: bytes) -> bytes:
    """One WARC/1.0 response record with an HTTP/1.1 200 block."""
    if isinstance(ts, datetime):
        # naive timestamps are treated as UTC (the session default);
        # aware ones are CONVERTED — replace() would relabel the wall
        # time and shift the instant
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        ts = ts.astimezone(timezone.utc)
        wdate = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    else:
        wdate = str(ts)
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
        + html
    )
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + wdate.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response\r\n"
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> int:
    """Writes one `part-<n>.warc` file per partition under `out_dir`
    (local/shared filesystem). Returns the number of records written.
    The inverse of `read_warc` up to record order within a file."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    # a NULL url or html cannot be serialized as a response record —
    # skip such rows rather than crash the job mid-file
    cols = df.select(url_col, ts_col, html_col).where(
        F.col(url_col).isNotNull() & F.col(html_col).isNotNull()
    )

    def dump(pid, it):
        path = os.path.join(out_dir, f"part-{pid:05d}.warc")
        n = 0
        with open(path, "wb") as f:
            for row in it:
                f.write(_record_bytes(row[0], row[1], bytes(row[2])))
                n += 1
        yield n

    counts = cols.rdd.mapPartitionsWithIndex(dump).collect()
    return sum(counts)


def _parse_warc(blob: bytes):
    """Yields (url, warc_date, http_status, html bytes) for every
    response record; offset walk driven by Content-Length."""
    if blob[:2] == b"\x1f\x8b":  # .warc.gz: concatenated gzip members
        import gzip

        blob = gzip.decompress(blob)
    pos, n = 0, len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = blob.index(b"\r\n\r\n", pos)
        headers = {}
        for line in blob[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers[b"content-length"])
        if hdr_end + 4 + length > n:
            raise ValueError(
                "truncated WARC record: Content-Length "
                f"{length} overruns the file by "
                f"{hdr_end + 4 + length - n} bytes"
            )
        body = blob[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get(b"warc-type") == b"response":
            http_end = body.index(b"\r\n\r\n")
            status = int(body.split(_CRLF, 1)[0].split(b" ")[1])
            yield (
                headers.get(b"warc-target-uri", b"").decode(),
                headers.get(b"warc-date", b"").decode(),
                status,
                body[http_end + 4 :],
            )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → (url, warc_ts timestamp, http_status, html binary).
    One input partition per file (binaryFile source) — the CC sharding
    unit; pass a glob like `dir/*.warc` or a directory."""
    import pandas as pd
    from pyspark.sql import types as T

    files = spark.read.format("binaryFile").load(path)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_date", T.StringType()),
            T.StructField("http_status", T.IntegerType()),
            T.StructField("html", T.BinaryType()),
        ]
    )

    def parse(batches, _chunk=512):
        # yield in bounded chunks — a CC-sized WARC holds GBs of
        # payloads; buffering the whole file's records in one pandas
        # frame would hold 2-3x the decompressed size per task
        rows = {"url": [], "warc_date": [], "http_status": [], "html": []}
        for pdf in batches:
            for blob in pdf["content"]:
                for url, wd, status, html in _parse_warc(bytes(blob)):
                    rows["url"].append(url)
                    rows["warc_date"].append(wd)
                    rows["http_status"].append(status)
                    rows["html"].append(html)
                    if len(rows["url"]) >= _chunk:
                        yield pd.DataFrame(rows)
                        rows = {k: [] for k in rows}
        if rows["url"]:
            yield pd.DataFrame(rows)

    out = files.select("content").mapInPandas(parse, schema)
    return out.select(
        "url",
        F.to_timestamp(
            # tolerate WARC/1.1 fractional seconds by stripping them
            F.regexp_replace(F.col("warc_date"), r"\.[0-9]+Z$", "Z"),
            "yyyy-MM-dd'T'HH:mm:ss'Z'",
        ).alias("warc_ts"),
        "http_status",
        "html",
    )

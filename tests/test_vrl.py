"""VRL-subset compiler: the reference's documented transform scripts
(docs/configuration/source-config.md:248-289) port unmodified, lowering
to pure Column pipelines."""

import pytest

from quickwit_spark.sources.vrl import VrlCompileError, compile_vrl


def test_reference_doc_example_logs(spark):
    """source-config.md:250-255 — the logs transform, verbatim."""
    t = compile_vrl(
        """
        .message = downcase(string!(.message))
        .timestamp = now()
        del(.username)
        """
    )
    df = spark.createDataFrame(
        [("HELLO World", "alice"), ("OK", "bob")], ["message", "username"]
    )
    out = t(df)
    assert out.columns == ["message", "timestamp"]
    rows = out.collect()
    assert [r["message"] for r in rows] == ["hello world", "ok"]
    assert all(r["timestamp"] is not None for r in rows)


def test_reference_doc_example_csv(spark):
    """source-config.md:281-289 — the plain_text CSV transform,
    verbatim."""
    t = compile_vrl(
        """
        user = parse_csv!(.plain_text)
        .first_name = user[0]
        .last_name = user[1]
        .age = to_int!(user[2])
        del(.plain_text)
        """
    )
    df = spark.createDataFrame([("jane,doe,32",), ("li,wu,7",)], ["plain_text"])
    rows = t(df).collect()
    assert rows[0].asDict() == {"first_name": "jane", "last_name": "doe", "age": 32}
    assert rows[1]["age"] == 7


def test_parse_json_variant_extraction(spark):
    t = compile_vrl(
        """
        payload = parse_json!(.props)
        .k = to_int!(payload["k"])
        .tag = upcase(string!(payload["tag"]))
        del(.props)
        """
    )
    df = spark.createDataFrame(
        [('{"k": 69, "tag": "a"}',), ("{not json",)], ["props"]
    )
    rows = t(df).collect()
    assert rows[0]["k"] == 69 and rows[0]["tag"] == "A"
    # fallible parse on bad input → NULLs, doc survives (documented
    # deviation from VRL's abort)
    assert rows[1]["k"] is None and rows[1]["tag"] is None


def test_arithmetic_comparisons_and_vars(spark):
    t = compile_vrl(
        """
        base = .n * 2 + 1
        .big = base >= 7
        .half = .n / 2
        .neq = .n != 3
        """
    )
    df = spark.createDataFrame([(3,), (5,)], ["n"])
    rows = t(df).collect()
    assert [r["big"] for r in rows] == [True, True]
    assert rows[1]["half"] == 2.5
    assert [r["neq"] for r in rows] == [False, True]


def test_string_functions(spark):
    t = compile_vrl(
        """
        .host = split(.url, "/")[2]
        .secure = starts_with(.url, "https")
        .fp = sha256(.url)
        """
    )
    df = spark.createDataFrame([("https://ex.com/a/b",)], ["url"])
    r = t(df).collect()[0]
    assert r["host"] == "ex.com"
    assert r["secure"] is True
    assert len(r["fp"]) == 64


def test_compile_errors_are_loud():
    with pytest.raises(VrlCompileError):
        compile_vrl(".x = frobnicate!(.y)")  # unsupported function
    with pytest.raises(VrlCompileError):
        compile_vrl(".a.b = 1")  # nested assignment target
    with pytest.raises(VrlCompileError):
        compile_vrl("if .a { .b = 1 }")  # outside the subset
    with pytest.raises(VrlCompileError):
        compile_vrl(".x = .y @")  # tokenizer garbage


def test_string_escapes_are_real_control_chars(spark):
    t = compile_vrl('.second = split(.line, "\\t")[1]\n.nl = "\\n"')
    df = spark.createDataFrame([("a\tb\tc",)], ["line"])
    r = t(df).collect()[0]
    assert r["second"] == "b"
    assert r["nl"] == "\n"
    with pytest.raises(VrlCompileError):
        compile_vrl('.x = "\\q"')  # non-JSON escape: loud, not silent

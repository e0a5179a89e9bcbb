"""C4-style line cleaning + page filters (datapipe/c4_filters.py).

Hand-computed expectations on constructed pages exercising every
published rule (Raffel et al. 2020 §2.2), plus an equivalence check
between `c4_filter` and the clean+predicate pieces the gate query uses.
"""

from pyspark.sql import functions as F

from quickwit_spark.datapipe.c4_filters import (
    c4_clean_lines,
    c4_filter,
    c4_page_predicate,
)

GOOD = "one two three four five is a fine sentence."
PAGES = [
    # kept: three good lines -> 3 sentences
    (0, f"{GOOD}\n{GOOD}\n{GOOD}"),
    # line rules: short line, no-terminal line, javascript line and a
    # policy line all removed; three good lines survive -> kept
    (
        1,
        f"{GOOD}\ntoo short.\nno terminal punctuation here at all\n"
        f"please enable JavaScript to view this page.\n"
        f"this site uses cookies to improve your experience.\n"
        f"{GOOD}\n{GOOD}",
    ),
    # page rule: lorem ipsum (case-insensitive) -> dropped
    (2, f"{GOOD}\n{GOOD}\n{GOOD}\nLorem Ipsum dolor sit amet filler."),
    # page rule: curly brace -> dropped
    (3, f"{GOOD}\n{GOOD}\n{GOOD}\nfunction f() {{ return 1; }}"),
    # page rule: only two surviving sentences -> dropped
    (4, f"{GOOD}\n{GOOD}"),
    # trailing '"' is a valid LINE terminal but not a sentence mark:
    # only '?' and '!' count toward min_sentences -> 2 -> dropped
    (
        5,
        'he said "this line ends with a quote mark"\n'
        "does this line have five words?\n"
        "yes it does have five!",
    ),
    (6, ""),  # empty -> cleaned empty -> dropped
]


def _df(spark):
    return spark.createDataFrame(PAGES, ["doc_id", "text"])


def test_line_rules(spark):
    out = (
        c4_clean_lines(_df(spark), "text", "clean")
        .orderBy("doc_id")
        .collect()
    )
    assert out[0]["clean"] == f"{GOOD}\n{GOOD}\n{GOOD}"
    # doc 1: exactly the three GOOD lines survive
    assert out[1]["clean"] == f"{GOOD}\n{GOOD}\n{GOOD}"
    # doc 5: quote / question / exclamation terminals all kept
    assert out[5]["clean"].count("\n") == 2
    assert out[6]["clean"] == ""


def test_page_rules(spark):
    kept = {r["doc_id"] for r in c4_filter(_df(spark)).collect()}
    assert kept == {0, 1}


def test_filter_equals_clean_plus_predicate(spark):
    df = _df(spark)
    via_pieces = (
        c4_clean_lines(df, "text", "c")
        .filter(c4_page_predicate(F.col("text"), F.col("c")))
        .select("doc_id", F.col("c").alias("text"))
    )
    a = sorted((r["doc_id"], r["text"]) for r in c4_filter(df).collect())
    b = sorted((r["doc_id"], r["text"]) for r in via_pieces.collect())
    assert a == b


def test_blocklist_and_params(spark):
    df = _df(spark)
    kept = {
        r["doc_id"]
        for r in c4_filter(df, blocklist=("TOO SHORT",)).collect()
    }
    assert kept == {0}  # doc 1 removed by case-insensitive blocklist
    # min_sentences=1 readmits docs 4 and 5; min_words=12 kills every
    # GOOD line
    assert {
        r["doc_id"] for r in c4_filter(df, min_sentences=1).collect()
    } == {0, 1, 4, 5}
    assert c4_filter(df, min_words=12).count() == 0


def test_schema_preserved(spark):
    df = _df(spark).withColumn("lang", F.lit("en"))
    out = c4_filter(df)
    assert out.columns == ["doc_id", "text", "lang"]


def test_curate_c4_stage(spark):
    """curate(c4=True) runs the C4 stage between redaction and quality
    and reports its row count."""
    from quickwit_spark.datapipe.curate import curate

    # every token embeds the line number so no n-gram repeats across
    # lines (the downstream Gopher repetition stage must not fire)
    def line(j):
        return (
            f"the pipe{j} line{j} holds "
            + " ".join(f"a{j}b{i}" for i in range(40))
            + f" end{j}."
        )

    good = line(0)
    multi = f"{line(0)}\n{line(1)}\n{line(2)}"
    rows = [
        (0, multi),
        (1, multi + "\ncode page with a brace {"),  # C4 page kill
        (2, good),  # only 1 sentence -> C4 page kill
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out, rep = curate(
        df,
        c4=True,
        redact=False,
        near_dup=False,
        quality_bounds={"min_stopword_hits": 1},
        with_report=True,
    )
    stages = dict(rep)
    assert stages["c4"] == 1
    assert {r["doc_id"] for r in out.collect()} == {0}

"""Source operators: dispatch, CSV grids, PDF struct, partitioned IO."""

import pytest
from pyspark.sql import functions as F

from fingerprint_spark.corpus import generate_corpus
from fingerprint_spark.dsl.compiler import compile_assertion
from fingerprint_spark.dsl.model import make_assertion
from fingerprint_spark.sources import (
    detect_format,
    parse_by_format,
    read_corpus,
    write_corpus_partitioned,
)
from fingerprint_spark.sources.grid import xlsx_to_sheets
from fingerprint_spark.sources.pdf import pdf_struct_col, sparse_text_flag


def test_detect_format(spark):
    rows = [
        ("http://x/a.HTML", "html"), ("http://x/a.md", "markdown"),
        ("http://x/a.csv", "csv"), ("http://x/a.TSV", "text"),
        ("http://x/a.xlsx", "xlsx"), ("http://x/a.pdf", "pdf"),
        ("http://x/a.bin", "unknown"), ("http://x/noext", "unknown"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], ["url"])
    got = [
        r["f"] for r in df.select(detect_format(F.col("url")).alias("f")).collect()
    ]
    assert got == [f for _u, f in rows]


CSV = 'name,qty,price\nwidget,"2",3.50\ngadget,5,"1,200.00"\n'


def test_csv_grid_and_fallback(spark):
    df = spark.createDataFrame(
        [
            ("http://x/data.csv", CSV),
            ("http://x/notes.txt", CSV),        # csv-text fallback probe
            ("http://x/page.html", "<html><body><h1>T</h1></body></html>"),
        ],
        ["url", "html"],
    )
    out = parse_by_format(df, content_col="html")
    rows = {r["url"]: r for r in out.collect()}

    # csv rows get the grid under all three virtual names
    sheets = rows["http://x/data.csv"]["sheets"]
    assert set(sheets) == {"Sheet1", "csv", "data"}
    assert sheets["csv"][0] == ["name", "qty", "price"]
    assert sheets["csv"][2][2] == "1,200.00"  # quoted comma survives

    # txt gets the fallback grid too (enricher.rs:270-372)
    assert rows["http://x/notes.txt"]["sheets"]["Sheet1"][1][0] == "widget"
    # html rows parse structurally, no grid
    assert rows["http://x/page.html"]["sheets"] is None
    assert rows["http://x/page.html"]["parsed"]["headings"][0]["text"] == "T"

    # the spreadsheet assertion family runs against the dispatched grid
    env = {"url": F.col("url"), "sheets": F.col("sheets")}
    a = make_assertion(
        "cell_eq", "t", {"sheet": "Sheet1", "cell": "A2", "value": "widget"}
    )
    ok = (
        out.filter(F.col("url") == "http://x/data.csv")
        .select(compile_assertion(a, env).alias("r"))
        .first()["r"]
    )
    assert ok is True


def test_pdf_struct_and_sparse_warning(spark):
    df = spark.createDataFrame(
        [(12, {"Title": "X"}, "tiny"), (12, {"Title": "X"}, "t" * 200),
         (3, {"Title": "X"}, "tiny")],
        "page_count int, metadata map<string,string>, text string",
    )
    df = df.withColumn("pdf", pdf_struct_col(F.col("page_count"), F.col("metadata")))
    flags = [
        r["w"]
        for r in df.select(
            sparse_text_flag(F.col("pdf"), F.col("text")).alias("w")
        ).collect()
    ]
    assert flags == [True, False, False]

    env = {"pdf": F.col("pdf")}
    a = make_assertion("page_count", "t", {"min_pages": 10, "max_pages": 20})
    got = [r["r"] for r in df.select(compile_assertion(a, env).alias("r")).collect()]
    assert got == [True, True, False]


def test_xlsx_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        xlsx_to_sheets(b"PK...")


def test_partition_pruning_and_column_pruning(spark, tmp_path):
    path = str(tmp_path / "corpus")
    docs = generate_corpus(spark, 3000, partitions=8)  # warc_ts spans ~2 days
    write_corpus_partitioned(docs, path)

    day = spark.read.parquet(path).select("warc_day").first()["warc_day"]
    scoped = read_corpus(spark, path, day=str(day), columns=["url", "text"])
    plan = scoped._jdf.queryExecution().executedPlan().toString()
    # partition pruning reached the scan
    assert "PartitionFilters" in plan and "warc_day" in plan
    # column pruning: html must NOT be in the read schema
    import re

    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "html" not in m.group(1) and "url" in m.group(1)
    assert scoped.count() > 0
    assert scoped.count() < 3000  # genuinely scoped to one day

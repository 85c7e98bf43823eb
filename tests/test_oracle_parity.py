"""Replicates the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + column names + order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "\x00null"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    return str(v)


def _rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )


QUERY_NAMES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_oracle_parity(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _rowset(spark_rows, spark_cols)
    b = _rowset(duck_rows, duck_cols)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_rows_only_queries_run(spark):
    from fingerprint_spark.entry_queries import ROWS_ONLY_QUERIES

    for name, q in ROWS_ONLY_QUERIES.items():
        df = q(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
        assert len(df.schema.fields) > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_xlsx_grid_roundtrip_matches_decode(spark):
    """q_xlsx_grid (build+decode in one plan) was retired from the
    driver registry for the 50-row budget; pin it to q_xlsx_decode
    (same projection over cached bytes, oracle-checked) here."""
    from fingerprint_spark.entry_queries import q_xlsx_decode, q_xlsx_grid

    a = {tuple(r) for r in q_xlsx_grid(spark, SF_DIR).collect()}
    b = {tuple(r) for r in q_xlsx_decode(spark, SF_DIR).collect()}
    assert a == b and len(a) > 0


def test_winnow_sketches_parity_on_adversarial_docs(spark, tmp_path):
    """Review findings r4: sub-k-char docs must not drop out of the
    winnow oracle (LEFT JOIN), and Unicode whitespace (NBSP) must not
    diverge the Python-UDF contract path from the Column/oracle paths
    (ASCII-\\s tokenization everywhere)."""
    import duckdb

    docs = [
        (0, "short", "s0", "en"),                       # < k=8 chars
        (1, "alpha beta gamma delta words here now", "s0", "en"),
        (2, "", "s1", "en"),                            # empty
        (3, "a perfectly ordinary document with words", "s1", "en"),
        (4, None, "s1", "en"),                          # NULL text (ADVICE r4)
    ]
    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).coalesce(1).write.parquet(d)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'"
    )
    for name in ("winnow", "sketches"):
        q = entry_mod.queries()[name]
        sdf = q(spark, str(tmp_path))
        spark_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(entry_mod.oracle_sql()[name])
        duck_cols = [c[0] for c in res.description]
        duck_rows = res.fetchall()
        assert len(spark_rows) == len(duck_rows) == 5, name
        a = _rowset(spark_rows, sdf.columns)
        b = _rowset(duck_rows, duck_cols)
        assert a == b, (name, a, b)
        # Column path == UDF path per row (the _u columns)
        for r in sdf.collect():
            base = [c for c in sdf.columns if not c.endswith("_u")
                    and c != "doc_id"]
            for c in base:
                assert r[c] == r[c + "_u"], (name, r["doc_id"], c)
    con.close()


def test_driver_query_budget_pinned():
    """VERDICT r4 #2: the driver's correctness harness records exactly
    ~50 rows; a 51st registration silently evicts the last-registered
    query from the hard signal (the round-3 winnow failure class).
    Adding a query now REQUIRES folding or retiring another."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) == 50, (
        f"driver budget is 50 registered queries, got {len(q)} — "
        "fold or retire a row before adding"
    )
    assert set(o) <= set(q)
    assert len(o) == 49  # 49 oracle + html_pipeline rows-only


def test_lang_distribution_is_langid_projection(spark):
    """lang_distribution was retired from the driver registry for the
    50-row budget (quality_score took the slot); pin it here as the
    strict groupBy projection of oracle-green langid."""
    from collections import Counter

    from fingerprint_spark.entry_queries import (
        q_lang_distribution, q_langid,
    )

    dist = {
        (r["lang_detected"], r["n_docs"])
        for r in q_lang_distribution(spark, SF_DIR).collect()
    }
    base = Counter(
        r["lang_detected"] for r in q_langid(spark, SF_DIR).collect()
    )
    assert dist == {(k, v) for k, v in base.items()} and dist


def test_lang_by_source_pivot_retired_parity(spark, duck):
    """lang_by_source_pivot was retired from the driver registry for
    the 50-row budget (perplexity took the slot); keep it under the
    same Spark-vs-DuckDB check here so the pivot operator stays
    oracle-verified."""
    from fingerprint_spark.entry_queries import (
        q_lang_by_source_pivot, sql_lang_by_source_pivot,
    )

    sdf = q_lang_by_source_pivot(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql_lang_by_source_pivot())
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert _rowset(spark_rows, sdf.columns) == _rowset(duck_rows, duck_cols)
    assert len(spark_rows) > 0


def test_perplexity_oracle_on_adversarial_docs(spark, tmp_path):
    """The perplexity oracle row on edge inputs the sf corpus lacks:
    NULL text, empty text, text of only unseen chars (every gram hits
    the backoff), and a text longer than the 4000-char truncation
    point. All three engines (Spark exact path, Arrow UDF, DuckDB)
    must stay bit-identical on the integer contract columns."""
    import duckdb

    docs = [
        (0, None, "s0", "en"),
        (1, "", "s0", "en"),
        (2, "@@@@ ####", "s0", "en"),        # all-backoff grams
        (3, "the committee reviewed the evidence " * 200, "s1", "en"),
        (4, "it's got 'quotes' and\ttabs\nand newlines", "s1", "en"),
    ]
    d = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string"
    ).coalesce(1).write.parquet(d)

    q = entry_mod.queries()["perplexity"]
    sdf = q(spark, str(tmp_path))
    spark_rows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/*.parquet'")
    res = con.execute(entry_mod.oracle_sql()["perplexity"])
    duck_cols = [c[0] for c in res.description]
    duck_rows = res.fetchall()
    con.close()
    assert len(spark_rows) == len(duck_rows) == 5
    assert _rowset(spark_rows, sdf.columns) == _rowset(duck_rows, duck_cols)
    by_id = {r["doc_id"]: r for r in sdf.collect()}
    # NULL and empty text coalesce to the same padded shell: 1 gram
    assert by_id[0]["n_grams"] == by_id[1]["n_grams"] == 1
    assert by_id[0]["logp_micro_total"] == by_id[1]["logp_micro_total"]
    # truncation fired: ~4001 grams, not ~7200
    assert by_id[3]["n_grams"] == 4000 + 1
    # the production UDF agreed with the exact path on every row
    assert all(r["udf_agrees"] for r in sdf.collect())


def test_quality_classifier_weights_cross_engine_identical(spark):
    """The lever under the quality_score oracle row: Spark GD with
    per-epoch HALF_UP gradient rounding must learn weights
    BIT-IDENTICAL to the pure-Python twin, independent of input
    partitioning (distributed double sums differ in the last ulp;
    the rounding absorbs it)."""
    from fingerprint_spark.operators.quality_classifier import (
        QUALITY_TRAIN_FIXTURE,
        train_quality_logreg,
        train_quality_logreg_py,
    )

    train = spark.createDataFrame(
        QUALITY_TRAIN_FIXTURE, "text string, label int"
    )
    mp = train_quality_logreg_py(
        QUALITY_TRAIN_FIXTURE, dim=512, epochs=8, lr=2.0, grad_round_dp=6
    )
    for parts in (1, 7):
        ms = train_quality_logreg(
            train.repartition(parts), dim=512, epochs=8, lr=2.0,
            hasher="md5", grad_round_dp=6,
        )
        assert ms["bias"] == mp["bias"]
        assert ms["weights"] == mp["weights"]
    # and the model genuinely separates the fixture
    from fingerprint_spark.operators.quality_classifier import quality_score

    scored = quality_score(
        train, mp, text_col="text", hasher="md5"
    ).collect()
    acc = sum(
        (r["quality_prob"] >= 0.5) == (r["label"] == 1) for r in scored
    ) / len(scored)
    assert acc >= 0.95

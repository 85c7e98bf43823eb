#!/usr/bin/env python3
"""Round-6 optimization helpers — separate from the FROZEN bench.py.

Modes:
  --plans TAG            capture .explain("formatted") for each headline
                         query into plans/r06/<query>_<TAG>.txt
  --time Q1,Q2           per-query noop-sink timing (bench.py methodology:
                         warm-up + min-of-2) without running the full set
  --diff-check Q         materialize query Q twice (collect) and compare
                         row multisets — used to prove a rewrite computes
                         the identical result on the given sf dir
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf resolves type hints here

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark(cores: str):
    from fingerprint_spark.session import get_spark

    return get_spark("fingerprint_spark_bench_extra", cores=cores)


def capture_plans(cores: str, sf_dir: str, names: list[str], tag: str) -> None:
    from fingerprint_spark.entry_queries import all_queries

    spark = _spark(cores)
    queries = all_queries()
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r06/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(plan)
        ex = plan.count("Exchange")
        py = plan.count("EvalPython") + plan.count("MapInArrow")
        print(f"{name}: Exchange={ex} PythonNodes={py} -> {path}")


def time_queries(cores: str, sf_dir: str, names: list[str], runs: int = 2) -> None:
    from fingerprint_spark.caching import release_tracked
    from fingerprint_spark.entry_queries import all_queries

    spark = _spark(cores)
    queries = all_queries()
    # same warm-up as bench.py (worker pool + codegen)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 10000, 1, 32).select(_warm("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        queries[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        release_tracked(spark)
        best = float("inf")
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            df = queries[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
            release_tracked(spark)
        out[name] = {"min": round(best, 3), "samples": samples}
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cores": cores, "timings": out}))


def diff_check(cores: str, sf_dir: str, name: str) -> None:
    """Collect the query and print a stable digest of the row multiset —
    run before AND after a rewrite; digests must match."""
    import hashlib

    from fingerprint_spark.entry_queries import all_queries

    spark = _spark(cores)
    df = all_queries()[name](spark, sf_dir)
    cols = sorted(df.columns)
    rows = sorted(
        "\x1f".join(repr(r[c]) for c in cols) for r in df.collect()
    )
    digest = hashlib.md5("\n".join(rows).encode()).hexdigest()
    print(f"{name} sf={sf_dir} rows={len(rows)} cols={cols} digest={digest}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--plans", default=None, help="tag, e.g. before/after")
    ap.add_argument("--time", default=None, help="comma-separated queries")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--diff-check", default=None)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    import bench

    names = args.queries.split(",") if args.queries else bench.HEADLINE
    if args.plans:
        capture_plans(str(args.cores), args.sf_dir, names, args.plans)
    elif args.time:
        time_queries(
            str(args.cores), args.sf_dir,
            bench.HEADLINE if args.time == "all" else args.time.split(","),
            args.runs,
        )
    elif args.diff_check:
        diff_check(str(args.cores), args.sf_dir, args.diff_check)


if __name__ == "__main__":
    main()

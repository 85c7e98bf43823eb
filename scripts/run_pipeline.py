#!/usr/bin/env python3
"""spark-submit entry point — the north_rule deployment shape.

    spark-submit --py-files fingerprint_spark.zip \\
        scripts/run_pipeline.py \\
        --input  /data/corpus          (day-partitioned parquet/Iceberg) \\
        --output /data/filtered \\
        --rules-dir rules/             (*.fp.yaml, optional) \\
        --day 2024-01-01               (partition pruning, optional) \\
        --buckets 256                  (checkpoint granularity) \\
        --resume                       (skip committed buckets)

Writes keep/drop verdicts + scrubbed text per url, checkpointed per
url-hash bucket with a lineage manifest; a killed job resumes with
``--resume`` and recomputes nothing. Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--rules-dir", default=None)
    ap.add_argument("--day", default=None)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--params-version", default="v1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("fingerprint_spark_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from fingerprint_spark.checkpoint import CheckpointedRun
    from fingerprint_spark.deploy import ensure_pyfiles
    from fingerprint_spark.dsl.registry import Registry, builtin_rules
    from fingerprint_spark.pipeline import quality_filter
    from fingerprint_spark.sources.corpus_io import read_corpus
    from fingerprint_spark.witness import append_witness

    ensure_pyfiles(spark)

    if args.rules_dir:
        registry = Registry.load_dir(args.rules_dir)
    else:
        registry = Registry(builtin_rules())
    rules = registry.list()

    df = read_corpus(spark, args.input, day=args.day)

    run = CheckpointedRun(
        args.output, n_buckets=args.buckets, params_hash=args.params_version
    )
    if not args.resume and run.completed_buckets():
        sys.exit(
            "output has committed buckets; pass --resume to continue or "
            "choose a fresh --output"
        )

    def stage(part):
        out = quality_filter(part, rules=rules)
        return out.select(
            "url", "warc_ts", "keep", "drop_reason", "scrubbed_text",
            "lang_detected", "ppl", "simhash", "scrub", "fingerprint",
            "child_routing", "warnings", "tool_versions",
        )

    summary = run.run(df, stage)
    metrics_total = {}
    for rec in summary["records"]:
        for k, v in rec["metrics"].items():
            metrics_total[k] = metrics_total.get(k, 0) + (v or 0)

    outcome = "OK" if summary["complete"] else "PARTIAL"
    append_witness(
        tool="run_pipeline",
        inputs={"input": args.input, "day": args.day},
        params={
            "rules": [r.fingerprint_id for r in rules],
            "buckets": args.buckets,
            "params_version": args.params_version,
        },
        outcome=outcome,
        exit_code=0 if summary["complete"] else 1,
    )
    print(
        json.dumps(
            {
                "outcome": outcome,
                "processed_buckets": summary["processed_buckets"],
                "skipped_buckets": summary["skipped_buckets"],
                "metrics": metrics_total,
                "output": args.output,
            },
            sort_keys=True,
        )
    )
    return 0 if summary["complete"] else 1


if __name__ == "__main__":
    sys.exit(main())

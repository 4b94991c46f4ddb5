"""CLI mirroring the reference's four entry points, Spark-first.

A user of the reference switches 1:1:

- ``python ETL_OMS.py --file F --pandemic_name N``
  → ``python -m etl_oms_spark long --file F --pandemic-name N --out DIR``
- ``python ETL_OMS_V2.py`` (long → wide pivot for BI)
  → ``python -m etl_oms_spark pivot --file LONG --out DIR``
- ``python ETL_OMS_FINAL.py --file F --pandemic_name N`` (star schema)
  → ``python -m etl_oms_spark star --file F --pandemic-name N --out DIR``
- ``python ETL_OMS_OPERATIONNEL.py`` (directory → warehouse upsert)
  → ``python -m etl_oms_spark warehouse --directory DATASETS --target WAREHOUSE``

Outputs are written as CSV + JSON (like EP1/EP2; ``--single-file`` coalesces
for small-output parity) or as a partition-pruned parquet merge table (EP3's
scalable ON CONFLICT twin). Each subcommand builds ONE lazy plan and lets
Catalyst optimize; sinks are the only actions.
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import functions as F


def _read_input(spark, path: str):
    from .sources.readers import read_csv, read_json

    if path.lower().endswith(".json"):
        return read_json(spark, path)
    return read_csv(spark, path)


def _write_both(df, out_dir: str, name: str, single_file: bool) -> None:
    from .sources.writers import write_csv, write_json

    write_csv(df, os.path.join(out_dir, f"{name}_csv"), single_file=single_file)
    write_json(df, os.path.join(out_dir, f"{name}_json"), single_file=single_file)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_oms_spark")
    ap.add_argument("--master", default=None, help="Spark master (default: env/local)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_long = sub.add_parser("long", help="EP1: wide input -> tidy long format")
    p_long.add_argument("--file", required=True)
    p_long.add_argument("--pandemic-name", required=True)
    p_long.add_argument("--out", required=True)
    p_long.add_argument("--single-file", action="store_true")

    p_pivot = sub.add_parser("pivot", help="V2: long CSV -> wide pivot")
    p_pivot.add_argument("--file", required=True)
    p_pivot.add_argument("--out", required=True)
    p_pivot.add_argument("--single-file", action="store_true")

    p_star = sub.add_parser("star", help="EP2: input -> star schema (4 tables)")
    p_star.add_argument("--file", required=True)
    p_star.add_argument("--pandemic-name", required=True)
    p_star.add_argument("--out", required=True)
    p_star.add_argument("--single-file", action="store_true")

    p_wh = sub.add_parser(
        "warehouse", help="EP3: directory scan -> idempotent warehouse merge"
    )
    p_wh.add_argument("--directory", required=True)
    p_wh.add_argument("--target", required=True, help="parquet merge-table path")
    p_wh.add_argument("--min-date", default="2019-01-01")

    p_cur = sub.add_parser(
        "curate",
        help="training-data curation: quality gate -> exact+minhash dedup -> "
        "annotate -> deterministic train/test split -> partitioned parquet",
    )
    p_cur.add_argument("--documents", required=True, help="parquet path with doc_id+text")
    p_cur.add_argument("--out", required=True)
    p_cur.add_argument("--min-tokens", type=int, default=10)
    p_cur.add_argument("--near-dup-threshold", type=float, default=0.8)
    p_cur.add_argument("--test-rate", type=float, default=0.05)
    p_cur.add_argument("--transitive", action="store_true",
                       help="transitive closure over near-dup pairs (iterative)")
    p_cur.add_argument("--config", default=None,
                       help="JSON file with pipeline knobs (min_tokens, "
                            "near_dup_threshold, test_rate, transitive, "
                            "lang_rates, hash_method); CLI flags override")

    p_prof = sub.add_parser(
        "profile", help="data-quality survey: per-column nulls/distincts/min-max"
    )
    p_prof.add_argument("--table", required=True, help="parquet path to profile")
    p_prof.add_argument("--approx", action="store_true",
                        help="HLL distinct counts (one scan, the at-scale default)")

    p_val = sub.add_parser(
        "validate", help="constraint report: PK duplicates / FK orphans"
    )
    p_val.add_argument("--table", required=True, help="parquet path (child table)")
    p_val.add_argument("--pk", required=True, help="comma-separated key columns")
    p_val.add_argument("--fk", default=None,
                       help="child_col:parent_path:parent_col foreign-key check")

    p_exp = sub.add_parser(
        "export", help="write a parquet table as ~target-byte JSONL shards"
    )
    p_exp.add_argument("--table", required=True, help="parquet path to export")
    p_exp.add_argument("--out", required=True)
    p_exp.add_argument("--target-mb", type=int, default=256)
    p_exp.add_argument("--order-by", default=None,
                       help="comma-separated shard-order columns (default: first column)")

    p_ing = sub.add_parser(
        "ingest", help="incremental directory ingest via file ledger (only new files)"
    )
    p_ing.add_argument("--directory", required=True)
    p_ing.add_argument("--ledger", required=True, help="processed-file ledger parquet")
    p_ing.add_argument("--out", required=True, help="append-target parquet")
    p_ing.add_argument("--format", default="csv", choices=["csv", "json", "parquet"])

    p_dec = sub.add_parser(
        "decontaminate",
        help="eval-safe release: bloom decontamination vs a benchmark set"
        " -> repeated-span repair -> exact dedup on repaired text",
    )
    p_dec.add_argument("--documents", required=True, help="corpus parquet (doc_id+text)")
    p_dec.add_argument("--benchmark", required=True, help="held-out set parquet (text)")
    p_dec.add_argument("--out", required=True, help="cleaned-corpus parquet target")
    p_dec.add_argument("--shingle-k", type=int, default=5)
    p_dec.add_argument("--span-tokens", type=int, default=8)
    p_dec.add_argument("--no-repair", action="store_true",
                       help="skip cross-document span repair")
    p_dec.add_argument("--no-dedup", action="store_true",
                       help="skip exact dedup on the repaired text")

    p_srch = sub.add_parser(
        "search", help="BM25 full-text search over a parquet document table"
    )
    p_srch.add_argument("--table", required=True, help="parquet path (documents)")
    p_srch.add_argument("--terms", required=True, help="space-separated query terms")
    p_srch.add_argument("--k", type=int, default=10)
    p_srch.add_argument("--text-col", default="text")
    p_srch.add_argument("--id-col", default="doc_id")

    args = ap.parse_args(argv)

    from .session import get_spark

    spark = get_spark("etl-oms-cli", master=args.master)

    if args.cmd == "long":
        from .plans.pipelines import long_format_pipeline

        df = _read_input(spark, args.file)
        out = long_format_pipeline(df, args.pandemic_name).cache()
        _write_both(out, args.out, "final", args.single_file)
        out.show(5)
    elif args.cmd == "pivot":
        from .plans.pipelines import pivot_report
        from .sources.writers import write_csv

        long_df = _read_input(spark, args.file)
        wide = pivot_report(long_df)
        write_csv(wide, os.path.join(args.out, "visual_csv"), single_file=args.single_file)
        wide.show(5)
    elif args.cmd == "star":
        from .plans.pipelines import star_schema_pipeline

        df = _read_input(spark, args.file)
        tables = star_schema_pipeline(df, args.pandemic_name)
        for name, tdf in tables.items():
            _write_both(tdf, os.path.join(args.out, args.pandemic_name), name, args.single_file)
        print({k: "written" for k in tables})
    elif args.cmd == "warehouse":
        from .plans.pipelines import warehouse_directory_to_parquet

        import time

        t0 = time.time()
        # dims persist next to the fact target and grow anti-join style, so
        # id_region / id_maladie are stable across pandemics and re-runs
        updates, bilan = warehouse_directory_to_parquet(
            spark, args.directory, args.target, min_date=args.min_date
        )
        if updates is None:
            print(f"no conformable files in {args.directory}: {bilan}")
            return 1
        print(f"bilan: {bilan} in {round(time.time() - t0, 2)}s")
    elif args.cmd == "curate":
        from .plans.training_pipeline import (
            curate_documents_with_split,
            write_curated_single,
        )

        docs = spark.read.parquet(args.documents)
        # single-frame pipeline (split as a column — one evaluation, not
        # one per side) with the bilan riding the write action via the
        # Observation API (plans/instrument.py): zero extra scans
        from .plans.instrument import PipelineMetrics

        stages = PipelineMetrics()
        docs = stages.observe(docs, "input")
        knobs = {
            "min_tokens": args.min_tokens,
            "near_dup_threshold": args.near_dup_threshold,
            "transitive": args.transitive,
            "test_rate": args.test_rate,
        }
        if args.config:
            # declarative pipeline spec: file sets the defaults, explicit
            # CLI flags (non-default values) still win
            import json as _json

            with open(args.config) as fh:
                cfg = _json.load(fh)
            defaults = {"min_tokens": 10, "near_dup_threshold": 0.8,
                        "transitive": False, "test_rate": 0.05}
            for k, v in cfg.items():
                if k in defaults and knobs.get(k) == defaults[k]:
                    knobs[k] = v
                elif k in ("lang_rates", "hash_method"):
                    knobs[k] = v
        curated = curate_documents_with_split(docs, **knobs)
        curated = stages.observe(
            curated,
            "curated",
            train_rows=F.sum(F.when(F.col("split") == "train", 1).otherwise(0)),
            test_rows=F.sum(F.when(F.col("split") == "test", 1).otherwise(0)),
        )
        write_curated_single(curated, args.out)
        rep = stages.report()
        print(
            f"curated: train {rep['curated']['train_rows']}, "
            f"test {rep['curated']['test_rows']} "
            f"(input {rep['input']['rows']})"
        )
    elif args.cmd == "profile":
        from .operators.profile import profile_columns

        df = spark.read.parquet(args.table)
        profile_columns(df, approx=args.approx).show(100, truncate=False)
    elif args.cmd == "validate":
        from .operators.validate import constraint_report, fk_orphans, pk_violations

        df = spark.read.parquet(args.table)
        keys = [k.strip() for k in args.pk.split(",")]
        checks = {"pk_duplicate_keys": pk_violations(df, keys)}
        if args.fk:
            child_col, parent_path, parent_col = args.fk.split(":")
            parent = spark.read.parquet(parent_path)
            checks["fk_orphans"] = fk_orphans(df, parent, child_col, parent_col)
        report = constraint_report(checks)
        report.show(truncate=False)
        n_bad = sum(r["n_violations"] for r in report.collect())
        return 0 if n_bad == 0 else 2
    elif args.cmd == "export":
        from .sources.writers import export_jsonl_shards

        df = spark.read.parquet(args.table)
        order = [c.strip() for c in args.order_by.split(",")] if args.order_by else None
        export_jsonl_shards(
            df, args.out, target_bytes=args.target_mb * 1024 * 1024, order_cols=order
        )
        print(f"exported {df.count()} rows to {args.out}")
    elif args.cmd == "ingest":
        from .sources.readers import ingest_new_files, record_ingested

        rows, files = ingest_new_files(
            spark, args.directory, args.ledger, fmt=args.format,
            **({"header": True} if args.format == "csv" else {}),
        )
        if not files:
            print("no new files")
            return 0
        rows.write.mode("append").parquet(args.out)
        record_ingested(spark, files, args.ledger)
        print(f"ingested {len(files)} new file(s) into {args.out}")
    elif args.cmd == "decontaminate":
        from .plans.training_pipeline import eval_safe_release

        docs = spark.read.parquet(args.documents)
        bench = spark.read.parquet(args.benchmark)
        released = eval_safe_release(
            docs,
            bench,
            shingle_k=args.shingle_k,
            repair=not args.no_repair,
            dedup=not args.no_dedup,
            span_tokens=args.span_tokens,
        ).cache()
        released.write.mode("overwrite").parquet(args.out)
        n_in = docs.count()
        n_out = released.count()
        n_rep = released.filter(F.col("was_repaired")).count()
        print(
            f"released {n_out}/{n_in} docs ({n_rep} span-repaired) -> {args.out}"
        )
        released.unpersist()
    elif args.cmd == "search":
        from .operators.search import bm25_topk

        df = spark.read.parquet(args.table)
        hits = bm25_topk(
            df,
            args.terms.split(),
            k=args.k,
            text_col=args.text_col,
            id_col=args.id_col,
        )
        hits.show(args.k, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())

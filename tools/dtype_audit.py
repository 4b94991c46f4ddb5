"""Output-dtype parity audit: Spark result vs DuckDB oracle result.

The driver's CORRECTNESS hash is type-sensitive — round 1's only failures
were dtype drift (long vs double, HUGEINT vs BIGINT), which the value-level
compare in tools/check.py cannot see. This audit compares the pandas dtypes
of every oracle query's two sides and flags any divergence, treating
datetime64 unit differences (ns vs us) as equal because the driver
normalizes datetimes before hashing.

Usage: python tools/dtype_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    def norm(dtypes: dict[str, str]) -> dict[str, str]:
        return {
            k: ("datetime64" if v.startswith("datetime64") else v)
            for k, v in dtypes.items()
        }

    qs, osql = E.queries(), E.oracle_sql()
    bad = 0
    results: dict[str, dict] = {}
    for name in qs:
        if name not in osql or (only and name not in only):
            continue
        sdf = qs[name](spark, sf).limit(200).toPandas()
        odf = con.execute(osql[name]).df().head(200)
        sdt = {c: str(sdf[c].dtype) for c in sorted(sdf.columns)}
        odt = {c: str(odf[c].dtype) for c in sorted(odf.columns)}
        ok = norm(sdt) == norm(odt)
        results[name] = {"ok": ok, "spark": sdt, "oracle": odt}
        if not ok:
            bad += 1
            print(f"MISMATCH {name}")
            print(f"  spark : {sdt}")
            print(f"  oracle: {odt}")
    # DTYPE_JSON: persist the audit as a machine-readable artifact
    # (mirrors check.py's CHECK_JSON) so sweep.sh runs leave committed
    # evidence — VERDICT r06/r07 item: type drift must never again
    # reach a driver window unaudited.
    out = os.environ.get("DTYPE_JSON")
    if out:
        with open(out, "w") as f:
            json.dump(
                {"sf": sf, "mismatches": bad, "queries": results},
                f, indent=1,
            )
    print("ALL DTYPES OK" if bad == 0 else f"{bad} DTYPE MISMATCHES")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

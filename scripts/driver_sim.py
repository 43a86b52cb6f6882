"""Driver simulation — the /verify skill's primary drive, scripted.

Imports the driver contract exactly as the driver does, smokes
``entry()``, then runs every ``queries()`` entry at sf0.01 and
compares against its ``oracle_sql()`` twin in DuckDB. Pass query
names as argv to restrict the run (entry() smoke still runs).

Exit code 0 iff every compared query matches.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402

from pyspark.sql import SparkSession  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    only = set(sys.argv[1:])
    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("SMOKE entry():", len(e.entry(spark).collect()), "rows")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    bad = []
    n_run = 0
    for name, b in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        sdf = b(spark, sf)
        srows = sorted(
            tuple(map(str, sorted(zip(sdf.columns, r), key=lambda kv: kv[0])))
            for r in sdf.collect()
        )
        if name not in osql:
            print(name, "rows-only:", len(srows))
            continue
        res = con.execute(osql[name])
        cols = [d[0] for d in res.description]
        orows = sorted(
            tuple(map(str, sorted(zip(cols, r), key=lambda kv: kv[0])))
            for r in res.fetchall()
        )
        if srows != orows:
            bad.append(name)
            print(name, "rows:", len(srows), "vs", len(orows), "MATCH FAIL")
    print("RAN", n_run, "BAD", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

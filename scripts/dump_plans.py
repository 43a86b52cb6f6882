"""Dump .explain("formatted") for named queries to text files.

Usage: python scripts/dump_plans.py OUTDIR SUFFIX q_name [q_name ...]

Writes OUTDIR/<q_name>_<SUFFIX>.txt for each query — the round's
before/after plan evidence (captured from a live builder, never
reconstructed at write-up time; VERDICT r17 "What's wrong" #1).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    from mapreduceapp_spark.session import get_spark
    from mapreduceapp_spark.plans.registry import get_query

    spark = get_spark(
        app_name="mrapp-dump-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = get_query(name).builder(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — dump what we can
            txt = f"DUMP FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Count py4j round-trips (socket recv calls) per builder invocation.

Usage: python scripts/profile_builder_py4j.py q_name [q_name ...]

Warms each builder once (staging slots land), then cProfiles a second
invocation — the steady-state construction cost the bench pays inside
every timed run. Round-trips ≈ ncalls of socket.recv_into via py4j's
GatewayConnection. The r17 measurement: q_ivfpq_recall = 3,422 cold /
~900 warm; VERDICT r17 #1 wants warm cut ≥3×.
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    from mapreduceapp_spark.session import get_spark
    from mapreduceapp_spark.plans.registry import get_query

    spark = get_spark(
        app_name="mrapp-profile-py4j",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        q = get_query(name)
        df = q.builder(spark, sf_dir)  # warm: slots stage, memos fill
        df.write.format("noop").mode("overwrite").save()
        prof = cProfile.Profile()
        t0 = time.perf_counter()
        prof.enable()
        q.builder(spark, sf_dir)
        prof.disable()
        wall = time.perf_counter() - t0
        st = pstats.Stats(prof)
        recv = sum(
            nc
            for (fn, ln, fname), (cc, nc, tt, ct, callers) in st.stats.items()
            if "recv_into" in fname or fname == "recv"
        )
        send = sum(
            nc
            for (fn, ln, fname), (cc, nc, tt, ct, callers) in st.stats.items()
            if "send_command" in fname
        )
        print(
            f"{name}: builder wall {wall:.3f}s, socket recv calls {recv}, "
            f"py4j send_command {send}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

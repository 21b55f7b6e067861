"""Round-9 optimization harness (bench.py is FROZEN for measurement —
this file exists so the round's before/after numbers are reproducible
without running the full driver bench).

Times the declared bench queries with bench.py's exact methodology
(one warm .count(), then min-of-2), plus optional noop-sink isolation
per guide §1.4.  Usage:

    python bench_extra.py                 # all bench queries
    python bench_extra.py minhash_pairs   # a subset
    EEL_NOOP=1 python bench_extra.py ...  # noop sink instead of count()
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
NOOP = os.environ.get("EEL_NOOP", "0") == "1"

BENCH_QUERIES = [
    "tpch_q1", "broadcast_join_agg", "join_multi", "topk_per_group",
    "window_running", "dedup_exact", "minhash_pairs", "text_metrics",
    "ann_batch", "events_window", "sessionization", "grouping_sets",
]


def main() -> None:
    from eel_sdk_spark.session import get_spark
    import __spark_entry__ as entrymod

    names = sys.argv[1:] or BENCH_QUERIES
    spark = get_spark(app="bench-extra", cpus=CPUS)
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")

        def run():
            df = fn(spark, SF_DIR)
            if NOOP:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()

        run()  # warm
        samples = []
        for _ in range(2):
            t0 = time.monotonic()
            run()
            samples.append(time.monotonic() - t0)
        out[name] = round(min(samples), 3)
        print(f"{name:25s} {out[name]:7.3f} s", file=sys.stderr)
    spark.stop()
    print(json.dumps({"queries": out, "sf": SF_DIR, "noop": NOOP,
                      "load_1m": round(os.getloadavg()[0], 1)}))


if __name__ == "__main__":
    main()

"""Dump .explain('formatted') for declared queries to files (round-9
deliverable helper): python tools_plandump.py <outdir> <query> [...]
Uses SPARK_GRAFT_SF_DIR (default sf0.1)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    from eel_sdk_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app="plandump")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()

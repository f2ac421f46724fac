#!/usr/bin/env python
"""Dump ``explain("formatted")`` output for named registry queries to
one file each — the evidence files behind plans/r15/ (the optimization
round's before/after plan record; the judge checks plan claims against
these instead of running Spark).

Usage:  python scripts/dump_plans.py OUT_DIR SUFFIX query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt per query. Plans are built at
$SPARK_GRAFT_SF_DIR (default sf0.001) — plan construction only; the
bounded driver-side actions some operators run during planning (e.g.
the stored-index staging writes) execute, but no query is collected.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from llm_pretraining_data_pipeline_spark.queries import QUERIES
    import llm_pretraining_data_pipeline_spark.queries_corpus  # noqa: F401
    import llm_pretraining_data_pipeline_spark.queries_ext  # noqa: F401
    import llm_pretraining_data_pipeline_spark.queries_rel  # noqa: F401
    from llm_pretraining_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="dump_plans", master="local[8]", shuffle_partitions=8
    )
    rc = 0
    for name in names:
        out_path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        if name not in QUERIES:
            with open(out_path, "w") as fh:
                fh.write(f"{name}: not registered at this commit\n")
            print(f"dump_plans: {name} NOT REGISTERED -> {out_path}")
            continue
        try:
            df = QUERIES[name].spark(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — keep dumping the rest
            with open(out_path, "w") as fh:
                fh.write(f"{name}: plan build FAILED: {exc}\n")
            print(f"dump_plans: {name} FAILED: {exc}")
            rc = 1
            continue
        with open(out_path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {SF_DIR}\n\n")
            fh.write(plan)
        print(f"dump_plans: {name} -> {out_path}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

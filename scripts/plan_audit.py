#!/usr/bin/env python
"""Physical-plan audit over the full query registry.

Builds every registered query's DataFrame at sf0.001 (plan construction
only — the driver-side actions some operators legitimately run during
planning, e.g. budget_select's histogram, do execute, but no query is
collected) and counts the plan nodes that matter at 100 TB:

  Exchange            shuffles — each one is a corpus-wide data movement
  Window              sort-based windows — serial within a partition key
  CartesianProduct    must be ZERO everywhere (the audit FAILS otherwise)
  ArrowEvalPython     Arrow-batched pandas_udf stages
  MapInPandas / MapInArrow / FlatMapGroupsInPandas   Python fan-out/batch stages
  BroadcastHashJoin / SortMergeJoin     join strategies chosen

Writes PLAN_AUDIT.md (table per query + summary) so plan regressions
show up in review diffs, and exits non-zero on any CartesianProduct.

Usage:  python scripts/plan_audit.py [out.md]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

NODES = [
    ("Exchange", r"\bExchange\b"),
    ("Window", r"\bWindow\b|\bWindowExec\b"),
    ("Cartesian", r"\bCartesianProduct\b"),
    ("ArrowEval", r"\bArrowEvalPython\b"),
    ("MapInPandas", r"\bMapInPandas\b"),
    ("MapInArrow", r"\bMapInArrow\b"),
    ("GroupsInPandas", r"FlatMapGroupsInPandas"),
    ("BHJ", r"\bBroadcastHashJoin\b"),
    ("SMJ", r"\bSortMergeJoin\b"),
]


def main() -> int:
    from llm_pretraining_data_pipeline_spark.queries import QUERIES
    import llm_pretraining_data_pipeline_spark.queries_corpus  # noqa: F401
    import llm_pretraining_data_pipeline_spark.queries_ext  # noqa: F401
    import llm_pretraining_data_pipeline_spark.queries_rel  # noqa: F401
    from llm_pretraining_data_pipeline_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLAN_AUDIT.md"
    spark = get_spark(
        app_name="plan_audit", master="local[8]", shuffle_partitions=8
    )
    rows, errors, cartesians = [], [], []
    t0 = time.time()
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name].spark(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must finish
            msg = (str(exc).splitlines() or ["<no message>"])[0][:160]
            errors.append((name, msg))
            continue
        counts = {
            label: len(re.findall(pat, plan)) for label, pat in NODES
        }
        if counts["Cartesian"]:
            cartesians.append(name)
        rows.append((name, counts))
    dur = time.time() - t0

    with open(out_path, "w") as fh:
        fh.write(
            "# Plan audit\n\n"
            f"Every registered query's PHYSICAL plan at sf0.001 "
            f"({len(rows)} plans built in {dur:.0f}s; "
            f"{len(errors)} errors). Node counts that matter at "
            "100 TB; CartesianProduct must be zero everywhere.\n\n"
        )
        fh.write(
            "| query | Exch | Win | Cart | Arrow | MapPd | GrpPd "
            "| BHJ | SMJ |\n|---|---|---|---|---|---|---|---|---|\n"
        )
        for name, c in rows:
            fh.write(
                f"| {name} | {c['Exchange']} | {c['Window']} "
                f"| {c['Cartesian']} | {c['ArrowEval']} "
                f"| {c['MapInPandas']} | {c['GroupsInPandas']} "
                f"| {c['BHJ']} | {c['SMJ']} |\n"
            )
        tot = {label: sum(c[label] for _, c in rows) for label, _ in NODES}
        fh.write(
            f"\n**Totals over {len(rows)} queries:** "
            + ", ".join(f"{k}={v}" for k, v in tot.items())
            + ".\n"
        )
        zero_shuffle = sum(1 for _, c in rows if c["Exchange"] == 0)
        fh.write(
            f"\n{zero_shuffle} queries plan with ZERO shuffles; "
            f"{sum(1 for _, c in rows if c['Window'] == 0)} with zero "
            "windows.\n"
        )
        if errors:
            fh.write("\n## Errors\n\n")
            for name, msg in errors:
                fh.write(f"- `{name}`: {msg}\n")
        if cartesians:
            fh.write(
                "\n## CARTESIAN PRODUCTS FOUND (audit FAILED)\n\n"
                + "".join(f"- `{n}`\n" for n in cartesians)
            )
    print(
        f"plan_audit: {len(rows)} plans, {len(errors)} errors, "
        f"{len(cartesians)} cartesians -> {out_path}"
    )
    return 1 if cartesians else 0


if __name__ == "__main__":
    raise SystemExit(main())

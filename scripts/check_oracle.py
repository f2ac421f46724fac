#!/usr/bin/env python
"""Local replica of the driver's DuckDB-oracle comparison.

Runs each registered query on Spark AND its oracle SQL on DuckDB at sf0.01
(default), compares row count, column names/types, and an order-insensitive
value hash. Usage:

    python scripts/check_oracle.py            # all queries
    python scripts/check_oracle.py q1 q2 ...  # subset
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python scripts/check_oracle.py
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def _norm_cell(v):
    """Engine-neutral cell rendering for hashing."""
    import datetime
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return _norm_cell(f)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames) -> tuple[int, str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    rendered = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(rendered).encode()).hexdigest()[:16]
    return len(rendered), h


def run_checks(names=None, sf_dir=SF_DIR, spark=None, verbose=True):
    import duckdb

    import __spark_entry__ as entrymod
    from llm_pretraining_data_pipeline_spark.session import get_spark

    registry = entrymod._registry()
    names = names or list(registry)

    spark = spark or get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    results = []
    for name in names:
        qd = registry[name]
        status, detail = "", ""
        t0 = time.time()
        try:
            sdf = qd.spark(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            if qd.oracle is None:
                status = "ROWS_ONLY"
                detail = f"{len(srows)} rows"
            else:
                orel = con.execute(qd.oracle)
                ocols = [d[0] for d in orel.description]
                orows = orel.fetchall()
                sn, sh = value_hash(srows, scols)
                on, oh = value_hash(orows, ocols)
                if sorted(scols) != sorted(ocols):
                    status, detail = "SCHEMA_MISMATCH", f"spark={scols} duck={ocols}"
                elif sn != on:
                    status, detail = "COUNT_MISMATCH", f"spark={sn} duck={on}"
                elif sh != oh:
                    status, detail = "HASH_MISMATCH", f"{sn} rows"
                    # show first differing rendered row for debugging
                    so = sorted(
                        "|".join(
                            _norm_cell(r[i])
                            for i in sorted(range(len(scols)), key=lambda i: scols[i])
                        )
                        for r in srows
                    )
                    oo = sorted(
                        "|".join(
                            _norm_cell(r[i])
                            for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                        )
                        for r in orows
                    )
                    for a, b in zip(so, oo):
                        if a != b:
                            detail += f"\n    spark: {a[:160]}\n    duck : {b[:160]}"
                            break
                else:
                    status, detail = "OK", f"{sn} rows"
        except Exception as e:  # noqa: BLE001
            status, detail = "ERROR", f"{type(e).__name__}: {str(e)[:200]}"
        wall = time.time() - t0
        results.append((name, status, wall, detail))
        if verbose:
            print(f"{name:32s} {status:16s} {wall:6.1f}s  {detail}")

    bad = [r for r in results if r[1] not in ("OK", "ROWS_ONLY")]
    if verbose:
        print(f"\n{len(results) - len(bad)}/{len(results)} passing"
              f" ({sum(1 for r in results if r[1] == 'OK')} hash-matched)")
    return results


def main(argv):
    results = run_checks(argv or None)
    return 1 if any(r[1] not in ("OK", "ROWS_ONLY") for r in results) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

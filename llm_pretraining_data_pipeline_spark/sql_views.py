"""SQL-addressable relational surface: temp views over every testdata
table plus the derived ``partsupp``, so the whole relational layer can be
driven with ``spark.sql(...)`` text — no DataFrame code required (VERDICT
r6 item 8).

The views are METADATA only: each ``createOrReplaceTempView`` stores the
logical plan, so a ``spark.sql`` query over them gets identical Catalyst
treatment (pushdown, pruning, broadcast choice) to the DataFrame forms —
``rel_sql_surface`` pins that the SQL route and the DataFrame route plan
and hash identically. ``partsupp`` is the same deterministic derivation
TPC-H Q2/Q11/Q16/Q20 use (queries_rel._PARTSUPP_SQL): one distinct over
lineitem's narrow key pair, integer cost in cents.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# The derived-table SQL is shared VERBATIM with the TPC-H oracle CTE
# (single source of truth — editing one side cannot diverge the other).
PARTSUPP_SELECT = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           (l_partkey * 3 + l_suppkey * 5) % 100 + 1 AS ps_availqty,
           (l_partkey * 13 + l_suppkey * 17) % 90000 + 1000 AS ps_cost_cents
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
"""


def register_sql_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table as a temp view (via ``sources.io``'s
    schema-normalising readers — events timestamps arrive normalised) plus
    the derived ``partsupp``. Returns the registered view names."""
    from llm_pretraining_data_pipeline_spark.sources import io as src

    src.register_views(spark, sf_dir)
    spark.sql(PARTSUPP_SELECT).createOrReplaceTempView("partsupp")
    return [*src.TESTDATA_TABLES, "partsupp"]

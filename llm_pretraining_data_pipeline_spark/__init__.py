"""PySpark-native LLM-pretraining data-pipeline engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (maryamkolyaei/LLM-Pretraining-Data-Pipeline,
an 8-stage single-machine pandas pipeline — see /root/reference/run_pipeline.py:24-49).

Design principles (see SURVEY.md):
  * One logical document table with an explicit schema; per-stage column accretion
    expressed as lazy ``withColumn``/``select`` chains, executed by Catalyst.
  * Every reference operator that is expressible as a column expression IS a column
    expression (JVM-side, whole-stage-codegen). Python survives only in four places
    (NFKC, language-ID model hook, HF tokenizer hook, none in the hot default path),
    always as Arrow-batched pandas UDFs.
  * The only shuffles are the dedup windows and the aggregation layer; both are
    keyed to support AQE skew handling at 100 TB.
"""

__version__ = "0.1.0"

from llm_pretraining_data_pipeline_spark.session import get_spark  # noqa: F401

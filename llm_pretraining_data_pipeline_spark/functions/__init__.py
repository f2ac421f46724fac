from llm_pretraining_data_pipeline_spark.functions import (  # noqa: F401
    hashing,
    langid,
    metrics,
    pii,
    scoring,
    structural,
    text_norm,
    tokenizer,
    toxicity,
)

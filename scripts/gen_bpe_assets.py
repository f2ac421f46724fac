#!/usr/bin/env python
"""Regenerate the bundled mini BPE assets (vocab_mini.json / merges_mini.txt).

Trains a deterministic byte-level BPE on the sf0.001 test documents: the
corpus-sized piece-count phase runs as a Spark aggregation, the merge loop on
the resulting piece dict. Output is committed; rerunning on the same corpus
reproduces it bit-for-bit.

    python scripts/gen_bpe_assets.py [num_merges] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_pretraining_data_pipeline_spark import get_spark  # noqa: E402
from llm_pretraining_data_pipeline_spark.functions import bpe  # noqa: E402


def main() -> None:
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="gen-bpe-assets", master="local[4]", shuffle_partitions=4)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab, merges = bpe.train_bpe_on_frame(docs, "text", num_merges)

    os.makedirs(bpe.ASSET_DIR, exist_ok=True)
    with open(os.path.join(bpe.ASSET_DIR, "vocab_mini.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False, separators=(",", ":"))
    with open(os.path.join(bpe.ASSET_DIR, "merges_mini.txt"), "w", encoding="utf-8") as f:
        f.write(f"#version: mini-bpe trained on {sf_dir} num_merges={num_merges}\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(vocab)} vocab entries, {len(merges)} merges to {bpe.ASSET_DIR}")


if __name__ == "__main__":
    main()

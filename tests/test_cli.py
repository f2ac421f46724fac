"""The run_pipeline CLI (the engine's `python run_pipeline.py` equivalent),
driven in-process against a real JSONL corpus."""

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)


def test_cli_end_to_end(spark, tmp_path, capsys, monkeypatch):
    import run_pipeline as cli

    src_path = tmp_path / "input.jsonl"
    docs = [
        {"url": f"http://t/{i}",
         "text": f"the story number {i} tells of the river and the boats that "
                 f"sailed past the village in the warm evening light of summer"}
        for i in range(40)
    ]
    docs.append({"url": "http://t/short", "text": "tiny"})
    src_path.write_text("\n".join(json.dumps(d) for d in docs))
    out = tmp_path / "out"

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--input", str(src_path), "--out", str(out),
         "--no-nfkc", "--no-lang-filter", "--docs-per-shard", "10"],
    )
    assert cli.main() == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["input_docs"] == 41
    assert line["kept_docs"] == 40  # "tiny" -> too_short_chars
    assert line["num_shards"] == 4

    assert (out / "manifest.json").exists()
    summary = json.load(open(out / "metrics_summary.json"))
    assert summary["docs"]["kept"] == 40
    assert summary["drop_reasons"] == {"too_short_chars": 1}
    final = spark.read.parquet(str(out / "final.parquet"))
    assert final.count() == 41


def test_cli_hashed_shards(spark, tmp_path):
    """--hashed-shards N routes the training export through hash sharding:
    shard dirs are pmod(crc32(id), N) buckets and the manifest still adds
    up; no global-order window constrains the write."""
    import json
    import os

    from llm_pretraining_data_pipeline_spark import cli

    inp = tmp_path / "in.jsonl"
    with open(inp, "w") as f:
        for i in range(120):
            f.write(json.dumps({
                "url": f"http://t/{i}",
                "text": ("the quick brown fox jumps over the lazy dog "
                         f"variant {i} with enough words to survive " * 3),
            }) + "\n")
    out = tmp_path / "out"
    rc = cli.main([
        "--input", str(inp), "--out", str(out),
        "--no-lang-filter", "--hashed-shards", "4",
    ])
    assert rc == 0
    with open(out / "manifest.json") as f:
        man = json.load(f)
    shard_dirs = [d for d in os.listdir(out / "train_shards")
                  if d.startswith("shard_id=")]
    assert 1 <= len(shard_dirs) <= 4
    assert man["total_docs"] == sum(s["num_docs"] for s in man["shards"])
    assert {int(d.split("=")[1]) for d in shard_dirs} <= {0, 1, 2, 3}

#!/usr/bin/env python
"""Fetch the published GPT-2 vocabulary assets (runbook for full-vocab parity).

The engine's tokenizer backend "auto" upgrades itself to exact published
GPT-2 ids the moment ``encoder.json`` + ``vocab.bpe`` exist on disk
(``functions/bpe.py:find_gpt2_assets``). The vocabulary is LEARNED data —
it cannot be regenerated programmatically — and this container has no
network, so the drop-in is a runbook step, not a code change:

    # on a machine with network access
    python scripts/fetch_gpt2_assets.py --dest /path/to/assets
    # then in the engine environment
    export SPARK_GRAFT_GPT2_ASSETS=/path/to/assets
    # or copy the two files into llm_pretraining_data_pipeline_spark/functions/bpe_assets/

After the drop-in:
  * pipeline/`p22` token counts match the reference's HF-GPT-2 numbers
    (the 51.86M-token contract in BASELINE.md at the reference's corpus);
  * ``tests/test_bpe.py::TestFullVocabParity`` un-skips and asserts
    corpus-scale parity shape at fixture scale.

Sources (both public; identical contents, different filenames):
  * OpenAI blob: models/124M/{encoder.json,vocab.bpe}
  * Hugging Face gpt2: {vocab.json,merges.txt}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

OPENAI_BASE = "https://openaipublic.blob.core.windows.net/gpt-2/models/124M"
HF_BASE = "https://huggingface.co/gpt2/resolve/main"

SOURCES = [
    # (encoder.json URL, vocab.bpe URL, save-as names)
    (f"{OPENAI_BASE}/encoder.json", f"{OPENAI_BASE}/vocab.bpe",
     ("encoder.json", "vocab.bpe")),
    (f"{HF_BASE}/vocab.json", f"{HF_BASE}/merges.txt",
     ("encoder.json", "vocab.bpe")),
]

EXPECTED_VOCAB = 50257


def fetch(url: str, dest: str, timeout: float) -> None:
    print(f"  GET {url}")
    with urllib.request.urlopen(url, timeout=timeout) as r, open(dest, "wb") as f:
        f.write(r.read())


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    default_dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "llm_pretraining_data_pipeline_spark", "functions", "bpe_assets",
    )
    ap.add_argument("--dest", default=default_dest,
                    help=f"directory to place encoder.json/vocab.bpe (default: {default_dest})")
    ap.add_argument("--timeout", type=float, default=60.0)
    args = ap.parse_args()

    os.makedirs(args.dest, exist_ok=True)
    enc_path = os.path.join(args.dest, "encoder.json")
    voc_path = os.path.join(args.dest, "vocab.bpe")

    last_err: Exception | None = None
    for enc_url, voc_url, _names in SOURCES:
        try:
            fetch(enc_url, enc_path, args.timeout)
            fetch(voc_url, voc_path, args.timeout)
            break
        except Exception as e:  # noqa: BLE001 — report and try the mirror
            last_err = e
            print(f"  source failed ({e}); trying next", file=sys.stderr)
    else:
        print(f"ERROR: no source reachable (last: {last_err}). "
              "This environment likely has no network — run this script "
              "elsewhere and copy the two files in.", file=sys.stderr)
        return 1

    with open(enc_path, encoding="utf-8") as f:
        n = len(json.load(f))
    if n != EXPECTED_VOCAB:
        print(f"ERROR: encoder.json has {n} entries, expected {EXPECTED_VOCAB}",
              file=sys.stderr)
        return 1
    print(f"OK: {enc_path} ({n} entries), {voc_path}")
    print("The tokenizer 'auto' backend will now resolve to exact GPT-2 ids "
          "(set $SPARK_GRAFT_GPT2_ASSETS if you used a custom --dest).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

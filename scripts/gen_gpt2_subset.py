#!/usr/bin/env python
"""Generate the committed GPT-2 SUBSET fixture (no network, no transformers).

The container has neither the published ``encoder.json``/``vocab.bpe`` nor
network access, so exact-id parity with the full 50,257-token GPT-2 vocabulary
cannot be tested wholesale. What CAN be pinned down from public knowledge:

1. **The 256 byte-level ids — derived, certain.** GPT-2's vocabulary starts
   with the 256 byte symbols in the exact order of the published
   ``bytes_to_unicode`` table (openai/gpt-2 ``encoder.py``): printable
   ``!``..``~`` (ids 0..93), ``¡``..``¬`` (94..105), ``®``..``ÿ`` (106..187),
   then the 68 excluded bytes in byte order (188..255). Anchors verified
   against independently-published ids: ``!``=0, tab=197, newline(``Ċ``)=198,
   space(``Ġ``)=220.
2. **The first merge products — published.** ``vocab.bpe`` opens with
   ``Ġ t``, ``Ġ a``, ``h e`` ..., giving ``Ġt``=256, ``Ġa``=257, ``he``=258;
   " a"=257 and " the"=262 are independently widely cited, corroborating the
   scheme (id = 256 + merge rank).
3. **A hand-curated set of full-token ids** from widely-published example
   tokenizations (each entry cites its form). These are the parity targets.

The subset contains merge CHAINS that derive each curated token. The chain
interiors (``ll``, ``est`` ...) use sentinel ids >= 50300 — clearly outside
the real 50,257-id space — because their true ids are not among the
hand-verifiable facts. Golden strings are chosen so every FINAL piece is
either a curated token or a single byte: on those strings the subset codec's
output ids are exactly HF ``gpt2``'s. On arbitrary text the subset codec is
only an algorithm exerciser (real GPT-2 would merge further) — that is what
``BASELINE.md``-scale parity would need the full public assets for.

Outputs (committed):
  llm_pretraining_data_pipeline_spark/functions/bpe_assets/gpt2_subset_encoder.json
  llm_pretraining_data_pipeline_spark/functions/bpe_assets/gpt2_subset_vocab.bpe
  tests/golden/gpt2_golden.parquet   (example_id, text, ids_str, n_tokens)
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_pretraining_data_pipeline_spark.functions.bpe import bytes_to_unicode

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSET_DIR = os.path.join(
    REPO, "llm_pretraining_data_pipeline_spark", "functions", "bpe_assets"
)
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")

# --- 1. byte-level ids: vocabulary order == bytes_to_unicode build order ----
b2u = bytes_to_unicode()
bs = (
    list(range(ord("!"), ord("~") + 1))
    + list(range(ord("¡"), ord("¬") + 1))
    + list(range(ord("®"), ord("ÿ") + 1))
)
bs = bs + [b for b in range(256) if b not in bs]  # appended in byte order
byte_vocab = {b2u[b]: i for i, b in enumerate(bs)}
# anchors against independently-published ids
assert byte_vocab["!"] == 0
assert byte_vocab["~"] == 93
assert byte_vocab["¡"] == 94
assert byte_vocab["®"] == 106
assert byte_vocab[b2u[9]] == 197  # tab
assert byte_vocab[b2u[10]] == 198  # \n -> 'Ċ'
assert byte_vocab[b2u[32]] == 220  # ' ' -> 'Ġ'
assert byte_vocab[","] == 11 and byte_vocab["."] == 13 and byte_vocab["?"] == 30

# --- 2./3. curated multi-char tokens (published ids; G = 'Ġ' space marker) --
CURATED = {
    "Ġt": 256,       # first merge line of the published vocab.bpe
    "Ġa": 257,       # second merge; " a"=257 also independently cited
    "he": 258,       # third merge
    "Ġthe": 262,     # " the" — among the most-cited GPT-2 ids
    "Ġis": 318,      # "This is a test" example: [1212, 318, 257, 1332]
    "The": 464,      # widely cited
    "Ġworld": 995,   # "Hello world" example: [15496, 995]
    "the": 1169,     # widely cited lowercase bare form
    "This": 1212,    # "This is a test" example
    "Ġtest": 1332,   # "This is a test" example
    "Hello": 15496,  # "Hello world" example
    "ĠHello": 18435, # " Hello" — cited in leading-space tokenization demos
    "hello": 31373,  # "hello world" example: [31373, 995]
    "<|endoftext|>": 50256,
}

# merge chains deriving each curated token; interiors get sentinel ids.
# rank order only needs to be a valid derivation order — the final merged
# form (hence the emitted id) is order-independent for these chains.
MERGES = [
    ("h", "e"),        # -> he (256+2 real)
    ("l", "l"),        # -> ll (sentinel)
    ("i", "s"),        # -> is (sentinel; bare "is" id not hand-verifiable)
    ("o", "r"),        # -> or (sentinel)
    ("l", "d"),        # -> ld (sentinel)
    ("e", "s"),        # -> es (sentinel)
    ("Ġ", "t"),        # -> Ġt (real 256)
    ("Ġ", "a"),        # -> Ġa (real 257)
    ("H", "e"),        # -> He (sentinel)
    ("T", "h"),        # -> Th (sentinel)
    ("ll", "o"),       # -> llo (sentinel)
    ("w", "or"),       # -> wor (sentinel)
    ("es", "t"),       # -> est (sentinel)
    ("He", "llo"),     # -> Hello (real)
    ("he", "llo"),     # -> hello (real)
    ("t", "he"),       # -> the (real)
    ("T", "he"),       # -> The (real)
    ("Th", "is"),      # -> This (real)
    ("Ġ", "is"),       # -> Ġis (real)
    ("Ġt", "he"),      # -> Ġthe (real)
    ("wor", "ld"),     # -> world (sentinel; bare "world" id not verified)
    ("Ġ", "world"),    # -> Ġworld (real)
    ("Ġt", "est"),     # -> Ġtest (real)
    ("Ġ", "Hello"),    # -> ĠHello (real)
]

vocab = dict(byte_vocab)
sentinel = 50300
for a, b in MERGES:
    tok = a + b
    if tok in vocab:
        continue
    if tok in CURATED:
        vocab[tok] = CURATED[tok]
    else:
        vocab[tok] = sentinel
        sentinel += 1
vocab["<|endoftext|>"] = CURATED["<|endoftext|>"]

os.makedirs(ASSET_DIR, exist_ok=True)
with open(os.path.join(ASSET_DIR, "gpt2_subset_encoder.json"), "w") as f:
    json.dump(vocab, f, ensure_ascii=False, indent=0, sort_keys=True)
with open(os.path.join(ASSET_DIR, "gpt2_subset_vocab.bpe"), "w") as f:
    f.write("#version: 0.2 — gpt2 subset fixture (scripts/gen_gpt2_subset.py)\n")
    for a, b in MERGES:
        f.write(f"{a} {b}\n")

# --- golden strings: every final piece is curated or a single byte ----------
# expected ids are written LITERALLY from the published facts above — never
# computed with the codec under test.
GOLDEN = [
    ("g01_hello_world", "Hello world", [15496, 995]),
    ("g02_lower_hello", "hello world", [31373, 995]),
    ("g03_this_is_a_test", "This is a test.", [1212, 318, 257, 1332, 13]),
    ("g04_the_test_bang", "The test!", [464, 1332, 0]),
    ("g05_hello_comma", "Hello, world!", [15496, 11, 995, 0]),
    ("g06_this_is_the_test", "This is the test", [1212, 318, 262, 1332]),
    ("g07_newline_byte", "The test!\n", [464, 1332, 0, 198]),
    ("g08_bare_the", "the test", [1169, 1332]),
    ("g09_mid_sentence_hello", "The test. Hello world!", [464, 1332, 13, 18435, 995, 0]),
    ("g10_empty", "", []),
]

import pyarrow as pa
import pyarrow.parquet as pq

os.makedirs(GOLDEN_DIR, exist_ok=True)
table = pa.table(
    {
        "example_id": [g[0] for g in GOLDEN],
        "text": [g[1] for g in GOLDEN],
        "ids_str": [",".join(str(i) for i in g[2]) for g in GOLDEN],
        "n_tokens": [len(g[2]) for g in GOLDEN],
    }
)
pq.write_table(table, os.path.join(GOLDEN_DIR, "gpt2_golden.parquet"))
print("wrote", len(vocab), "vocab entries,", len(MERGES), "merges,", len(GOLDEN), "goldens")

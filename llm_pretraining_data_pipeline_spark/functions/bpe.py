"""Byte-level BPE — the GPT-2 tokenisation algorithm, dependency-free.

Reference contract: Tokenisation_JSONL_export.py:71-119 tokenises with the
HF GPT-2 tokenizer (pad→eos :228-229, add_special_tokens=True — a no-op for
GPT-2 — truncation off, n_tokens = len(input_ids)). transformers is not in
this environment, so this module implements the *algorithm* itself:

  * ``bytes_to_unicode`` — GPT-2's exact reversible byte↔unicode table
    (public: openai/gpt-2 encoder.py; also in HF GPT2Tokenizer);
  * ``BpeCodec`` — encode/decode with the exact greedy lowest-merge-rank
    loop over pre-tokenised pieces;
  * ``load_gpt2_codec(encoder_json, vocab_bpe)`` — feed it the published
    GPT-2 assets (encoder.json + vocab.bpe) and ids are value-identical to
    HF ``gpt2``;
  * ``train_bpe`` — deterministic trainer over a word-frequency table. The
    scale split follows real BPE trainers: the corpus-sized phase is ONE
    Spark aggregation (pre-token piece counts, ``word_frequencies``); the
    merge loop runs over the distinct-piece dict, which is bounded
    (vocabulary-sized, not corpus-sized) and driver-side;
  * ``bpe_tokenize_map`` — mapInPandas batch encode, codec built once per
    Python worker from broadcast-able plain data.

A mini codec trained on the test corpus is bundled under ``bpe_assets/``
(regenerate with scripts/gen_bpe_assets.py) so the full BPE path is
exercised end-to-end without external downloads.
"""

from __future__ import annotations

import json
import logging
import os
import re
from collections import Counter
from collections.abc import Iterator
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bpe_assets")

logger = logging.getLogger(__name__)
END_OF_TEXT = "<|endoftext|>"

# GPT-2 pre-tokeniser, Python-regex flavor. Python `re` lacks \p{L}/\p{N}:
# unicode letters are [^\W\d_] and numbers \d (Nd; GPT-2's \p{N} also takes
# Nl/No — exotic numerals split one piece earlier, documented delta).
PY_SPLIT_PATTERN = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+",
    re.UNICODE,
)


@lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's bijective byte → unicode-char table: printable latin-1 bytes
    map to themselves, the rest to codepoints 256+n in byte order. Keeps BPE
    symbols printable and the mapping reversible (public algorithm)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


@lru_cache(maxsize=1)
def unicode_to_bytes() -> dict[str, int]:
    return {c: b for b, c in bytes_to_unicode().items()}


def _get_pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word, word[1:]))


class BpeCodec:
    """Encoder/decoder over a (vocab, merges) pair.

    ``vocab``: token string → id. ``merges``: ordered list of (a, b) pairs;
    position is the merge rank (lower merges first). The encode loop is the
    exact published GPT-2 greedy algorithm: repeatedly merge the
    lowest-ranked bigram present in the word.
    """

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]]):
        self.vocab = vocab
        self.decoder = {i: t for t, i in vocab.items()}
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self._cache: dict[str, tuple[str, ...]] = {}

    def _bpe(self, token: str) -> tuple[str, ...]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = tuple(token)
        pairs = _get_pairs(word)
        while pairs:
            bigram = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if bigram not in self.ranks:
                break
            first, second = bigram
            new_word: list[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        if len(self._cache) < 65536:
            self._cache[token] = word
        return word

    def encode(self, text: str) -> list[int]:
        b2u = bytes_to_unicode()
        ids: list[int] = []
        for piece in PY_SPLIT_PATTERN.findall(text):
            symbols = "".join(b2u[b] for b in piece.encode("utf-8"))
            for tok in self._bpe(symbols):
                ids.append(self.vocab[tok])
        return ids

    def decode(self, ids: list[int]) -> str:
        u2b = unicode_to_bytes()
        chars = "".join(self.decoder[i] for i in ids)
        return bytes(u2b[c] for c in chars).decode("utf-8", errors="replace")

    def to_plain(self) -> tuple[dict[str, int], list[tuple[str, str]]]:
        """Plain picklable data for shipping to Python workers."""
        merges = [None] * len(self.ranks)
        for pair, rank in self.ranks.items():
            merges[rank] = pair
        return self.vocab, merges  # type: ignore[return-value]


def load_gpt2_codec(encoder_json: str, vocab_bpe: str) -> BpeCodec:
    """Codec from the published GPT-2 assets (encoder.json + vocab.bpe).
    With those files the ids are value-identical to HF ``gpt2``."""
    with open(encoder_json, encoding="utf-8") as f:
        vocab = json.load(f)
    merges: list[tuple[str, str]] = []
    with open(vocab_bpe, encoding="utf-8") as f:
        for line in f.read().split("\n")[1:]:  # first line is the version tag
            parts = line.split()
            if len(parts) == 2:
                merges.append((parts[0], parts[1]))
    return BpeCodec(vocab, merges)


# Where the engine looks for the PUBLISHED full GPT-2 assets (the ~1 MB
# encoder.json + ~0.5 MB vocab.bpe from the public openai/gpt-2 release, or
# byte-identical copies shipped with HF `gpt2`). This container has neither
# the files nor network access, and a learned vocabulary cannot be
# reconstructed programmatically — so full-vocab parity is an *asset drop-in*
# away, not a code change: place the two files at the paths below (or point
# SPARK_GRAFT_GPT2_ASSETS at a directory holding them) and every default
# tokenisation path upgrades to exact reference ids automatically.
FULL_ASSET_ENV = "SPARK_GRAFT_GPT2_ASSETS"
# openai names first, then the HF gpt2 names (vocab.json is HF's encoder
# dict; merges.txt is HF's vocab.bpe — same formats, same contents)
FULL_ENCODER_NAMES = ("encoder.json", "gpt2_encoder.json", "vocab.json")
FULL_VOCAB_NAMES = ("vocab.bpe", "gpt2_vocab.bpe", "merges.txt")


def find_gpt2_assets() -> tuple[str, str] | None:
    """(encoder_json, vocab_bpe) paths for the full published GPT-2 vocab,
    or None. Search order: $SPARK_GRAFT_GPT2_ASSETS, then ``bpe_assets/``.
    A directory qualifies only when BOTH files are present and the encoder
    holds the real 50,257-entry vocabulary (so the committed subset fixture
    can never masquerade as the full assets)."""
    dirs = []
    env = os.environ.get(FULL_ASSET_ENV)
    if env:
        dirs.append(env)
    dirs.append(ASSET_DIR)
    for d in dirs:
        enc = next(
            (os.path.join(d, n) for n in FULL_ENCODER_NAMES
             if os.path.isfile(os.path.join(d, n))),
            None,
        )
        voc = next(
            (os.path.join(d, n) for n in FULL_VOCAB_NAMES
             if os.path.isfile(os.path.join(d, n))),
            None,
        )
        if enc and voc:
            try:
                with open(enc, encoding="utf-8") as f:
                    vocab = json.load(f)
            except (OSError, ValueError):
                continue
            if len(vocab) >= 50000:
                return enc, voc
    return None


def full_gpt2_codec() -> BpeCodec:
    """Codec over the full published vocabulary; raises with drop-in
    instructions when the assets are absent."""
    found = find_gpt2_assets()
    if found is None:
        raise FileNotFoundError(
            "Full GPT-2 assets not found. Place the published encoder.json "
            f"and vocab.bpe under {ASSET_DIR} or a directory named by "
            f"${FULL_ASSET_ENV}. (This container has no network; the "
            "vocabulary is learned data and cannot be regenerated.)"
        )
    return load_gpt2_codec(*found)


# ------------------------------------------------------------------ training


def word_frequencies(
    df: DataFrame,
    text_col: str,
    min_count: int = 1,
    top_pieces: int | None = None,
) -> DataFrame:
    """Corpus-scale phase of BPE training: pre-token piece counts as one
    Spark aggregation (JVM regex, map-side partial aggregation).

    On web-scale corpora the DISTINCT piece table is not vocabulary-sized —
    typo/URL/code pieces push it to 10^8–10^9 rows — so the trainer must
    prune before anything is collected to the driver:

    - ``min_count``: drop pieces with ``freq < min_count`` (the standard
      BPE-trainer cutoff — e.g. sentencepiece/HF tokenizers' default
      ``min_frequency=2``). A piece seen once contributes at most 1 to any
      pair count, so for realistic merge budgets the learned ranks are
      unchanged; ties that a singleton would have broken can shift tail
      merges, which is the documented cost of the cutoff.
    - ``top_pieces``: hard cap — keep the N most frequent pieces
      (ties break on the piece string, so the cap is deterministic). This
      bounds the driver materialisation absolutely; plans as
      TakeOrderedAndProject, never a global sort.

    Uses the Python-equivalent pre-tokeniser (``GPT2_SPLIT_PATTERN_PYEQ``) so
    the trainer sees exactly the pieces ``BpeCodec.encode`` will later split —
    the JVM ``\\p{N}`` and Python ``\\d`` classes disagree on Nl/No numerals,
    and merges trained over pieces the encoder never produces are dead weight.
    """
    from llm_pretraining_data_pipeline_spark.functions import tokenizer

    out = (
        df.select(
            F.explode(
                tokenizer.token_pieces(text_col, tokenizer.GPT2_SPLIT_PATTERN_PYEQ)
            ).alias("piece")
        )
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_count > 1:
        out = out.filter(F.col("freq") >= F.lit(min_count))
    if top_pieces is not None:
        out = out.orderBy(F.desc("freq"), F.asc("piece")).limit(top_pieces)
    return out


def _merge_word(
    word: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    first, second = pair
    out: list[str] = []
    i = 0
    while i < len(word):
        if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
            out.append(first + second)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train_bpe(
    piece_freqs: dict[str, int], num_merges: int
) -> tuple[dict[str, int], list[tuple[str, str]]]:
    """Deterministic BPE trainer over a piece-frequency table.

    Ties on pair frequency break lexicographically, so the same input always
    yields the same merges. Returns (vocab, merges): ids are the 256 byte
    symbols in byte order, then merges in rank order, then END_OF_TEXT —
    the id-assignment convention of a freshly trained vocab.
    """
    b2u = bytes_to_unicode()
    words: dict[tuple[str, ...], int] = {}
    for piece, freq in piece_freqs.items():
        sym = tuple(b2u[b] for b in piece.encode("utf-8"))
        if sym:
            words[sym] = words.get(sym, 0) + freq

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for word, freq in words.items():
            for pair in zip(word, word[1:]):
                pair_counts[pair] += freq
        if not pair_counts:
            break
        # deterministic: highest count, ties to the lexicographically
        # smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {_merge_word(w, best): f for w, f in words.items()}

    vocab: dict[str, int] = {}
    for b in range(256):
        vocab[b2u[b]] = b
    for a, b_ in merges:
        vocab[a + b_] = len(vocab)
    vocab[END_OF_TEXT] = len(vocab)
    return vocab, merges


def train_bpe_on_frame(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_count: int = 2,
    top_pieces: int | None = 1_000_000,
    log_pruning: bool = False,
) -> tuple[dict[str, int], list[tuple[str, str]]]:
    """End-to-end trainer: Spark piece counts → driver merge loop.

    The piece table is pruned IN SPARK before the collect (see
    ``word_frequencies``): default ``min_count=2`` + a 1M-piece cap bound
    the driver materialisation at any corpus size — on web-scale text the
    unpruned distinct-piece table is a driver OOM, not vocabulary-sized.
    Pass ``min_count=1, top_pieces=None`` for the exact unpruned table
    (fixture-scale corpora; the committed mini assets are reproducible
    either way because the test corpus has no singleton pieces).

    .. note:: **Changed in round 7** — the defaults were previously
       ``min_count=1, top_pieces=None`` (unpruned). A corpus with
       singleton pieces, or tail ties at the cap, now learns DIFFERENT
       merges under the defaults; pin the old arguments to reproduce a
       pre-round-7 vocabulary (see CHANGELOG.md).

    ``log_pruning=True`` (opt-IN — the extra job re-aggregates the whole
    corpus unpruned, doubling the heaviest stage, so the web-scale default
    is off) runs one extra count job (a scalar to the driver, nothing
    corpus-sized) measuring how many distinct pieces the cutoffs actually
    dropped — turn it on at fixture scale to notice when the pruning
    defaults change the learned merges.
    """
    pruned = word_frequencies(
        df, text_col, min_count=min_count, top_pieces=top_pieces
    )
    freqs = {r["piece"]: r["freq"] for r in pruned.collect()}
    if log_pruning and (min_count > 1 or top_pieces is not None):
        total = word_frequencies(df, text_col).count()
        dropped = total - len(freqs)
        if dropped > 0:
            logger.warning(
                "train_bpe_on_frame pruning dropped %d of %d distinct "
                "pieces (min_count=%d, top_pieces=%s) — learned merges "
                "may differ from an unpruned run",
                dropped, total, min_count, top_pieces,
            )
    return train_bpe(freqs, num_merges)


# ------------------------------------------------------------ bundled assets


@lru_cache(maxsize=1)
def gpt2_subset_codec() -> BpeCodec:
    """Codec over the committed GPT-2 SUBSET fixture
    (scripts/gen_gpt2_subset.py): the 256 byte-level tokens with their exact
    published ids (derived from the bytes_to_unicode vocabulary order;
    anchors '!'=0, tab=197, '\\n'=198, space=220) plus merge chains for a
    hand-curated set of published token ids (Hello=15496, ' world'=995,
    ' the'=262, ...). On the golden strings in tests/golden/gpt2_golden.parquet
    the output ids are exactly HF ``gpt2``'s; on arbitrary text the codec is
    an algorithm exerciser only (chain-interior tokens carry sentinel ids
    >= 50300 — deliberately outside the real 50,257-id space)."""
    return load_gpt2_codec(
        os.path.join(ASSET_DIR, "gpt2_subset_encoder.json"),
        os.path.join(ASSET_DIR, "gpt2_subset_vocab.bpe"),
    )


@lru_cache(maxsize=1)
def mini_codec() -> BpeCodec:
    """The bundled mini codec (trained on the test corpus by
    scripts/gen_bpe_assets.py; committed, deterministic)."""
    with open(os.path.join(ASSET_DIR, "vocab_mini.json"), encoding="utf-8") as f:
        vocab = json.load(f)
    merges: list[tuple[str, str]] = []
    with open(os.path.join(ASSET_DIR, "merges_mini.txt"), encoding="utf-8") as f:
        for line in f.read().split("\n")[1:]:
            parts = line.split(" ")
            if len(parts) == 2:
                merges.append((parts[0], parts[1]))
    return BpeCodec(vocab, merges)


# ------------------------------------------------------------- Spark surface


def bpe_tokenize_map(
    df: DataFrame, text_col: str, codec: BpeCodec | None = None
) -> DataFrame:
    """Real BPE tokenisation via mapInPandas (Arrow batches; codec rebuilt
    once per Python worker from plain data, never per row). Appends
    input_ids, attention_mask, n_tokens — the reference's tokenise-stage
    contract (Tokenisation_JSONL_export.py:97-119)."""
    import pandas as pd

    vocab, merges = (codec or mini_codec()).to_plain()

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["input_ids array<int>", "attention_mask array<int>", "n_tokens long"]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        worker_codec = BpeCodec(vocab, list(merges))
        for pdf in batches:
            texts = ["" if not isinstance(t, str) else t for t in pdf[text_col]]
            ids = [worker_codec.encode(t) for t in texts]
            pdf = pdf.copy()
            pdf["input_ids"] = ids
            pdf["attention_mask"] = [[1] * len(x) for x in ids]
            pdf["n_tokens"] = [len(x) for x in ids]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def bpe_decode_col(ids_col: str, codec: BpeCodec | None = None):
    """Arrow-batched pandas UDF decoding an array<int> id column back to text.

    Pairs with ``bpe_tokenize_map`` to express the lossless-round-trip
    invariant (BPE is a bijection up to UTF-8 validity) as a Spark column —
    the DuckDB oracle can then check sha256(decoded) == sha256(original)
    without re-implementing the merge loop in SQL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    vocab, merges = (codec or mini_codec()).to_plain()

    # no annotations: `from __future__ import annotations` stringifies them,
    # which pandas_udf can't resolve — pass the return type explicitly.
    def _decode_series(ids):
        worker_codec = BpeCodec(vocab, list(merges))
        return ids.map(
            lambda x: worker_codec.decode([int(i) for i in x]) if x is not None else ""
        )

    return pandas_udf(_decode_series, "string")(ids_col)

"""Deterministic GPT-2-style byte-pair encoding (BPE) tokenization.

The engine's other token arithmetic (``textstats.ws_token_count``, the
``bpe_token_count`` regex) approximates tokenizer behavior; packing and
chunking budgets for a real 100 TB pretraining run are set in REAL
tokenizer tokens, so this module implements the actual BPE algorithm
(Sennrich et al. 2016, the GPT-2 encoder formulation: a regex
pre-tokenizer + a ranked merges table applied greedily lowest-rank-first
per word). No reference analog — the reference engine (text-contract
validation) has no tokenizer at all; this is part of the LLM-pipeline
operator suite.

Design for scale:

* **Training** is the classic two-phase shape: ONE Spark hash-agg builds
  the word-frequency table (map-side combined; capped at ``max_words``
  distinct words by (count desc, word) so the collect is bounded and
  deterministic), then the sequential merge-learning loop — which is
  inherently ordered, each merge depends on the last — runs driver-side
  over that frequency dict. This is how production BPE trainers work:
  the corpus is unbounded, the distinct-word table is not.
* **Encoding** is Arrow-batched ``mapInPandas`` (never per-row Python):
  the ranks table ships to executors once as a broadcast variable, each
  batch encodes with a per-executor word→tokens cache (natural-language
  batches repeat words heavily, so the cache converts the merge loop to
  a dict hit for all but first occurrences).
* **Determinism**: pair-count ties break on the lexicographically
  smallest pair; the word table cap breaks ties on the word. Training
  twice on the same corpus yields byte-identical merges, and encoding is
  a pure function of (text, merges) — so an external SQL oracle can
  replay encoding exactly: for a well-formed merges table (each merge's
  constituents are produced by strictly earlier merges — true of ANY
  table this trainer emits), greedy lowest-rank-first encoding equals
  applying the merges as ordered left-to-right replace-all passes, which
  is straight-line SQL.

The pre-tokenizer is the ASCII projection of the GPT-2 regex (contraction
suffixes, optional-leading-space letter runs / digit runs / punctuation
runs, whitespace): Python ``re`` lacks ``\\p{L}`` classes and the oracle
must replay the split, so the unicode letter classes are narrowed to
``A-Za-z`` — documented, deterministic, and identical on both engines.
Tokens are unicode *characters* (not raw UTF-8 bytes): character-level
merges keep the SQL replay exact for non-ASCII text, at the cost of the
byte-fallback property of the original byte-level GPT-2 vocabulary.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ASCII projection of the GPT-2 pre-tokenizer regex (see module docstring)
PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+(?!\S)|\s+"
)
_PRETOKEN = re.compile(PRETOKEN_RE)


def pretokenize(text: str) -> List[str]:
    """GPT-2-style pre-token split (pure function; used by both the
    trainer and the encoder, and mirrored by the SQL oracle)."""
    return _PRETOKEN.findall(text or "")


def _merge_word(word: Tuple[str, ...], pair: Tuple[str, str]) -> Tuple[str, ...]:
    """All occurrences of ``pair`` in ``word`` merged, leftmost first."""
    a, b = pair
    out: List[str] = []
    i = 0
    while i < len(word):
        if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def learn_merges(
    word_counts: Dict[str, int], num_merges: int
) -> List[Tuple[str, str]]:
    """Sennrich-style merge learning over a word-frequency dict.

    Each round counts adjacent symbol pairs weighted by word frequency,
    merges the most frequent (ties → lexicographically smallest pair),
    and stops early when no pair occurs twice. Pure Python by design:
    the loop is sequential (merge *i* changes the pair counts merge
    *i+1* sees), and the word table it runs on is already
    corpus-size-independent.
    """
    vocab: Dict[Tuple[str, ...], int] = {
        tuple(w): c for w, c in word_counts.items() if len(w) > 1
    }
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Dict[Tuple[str, str], int] = {}
        for word, c in vocab.items():
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        vocab = {
            _merge_word(w, best) if best[0] in w else w: c
            for w, c in vocab.items()
        }
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_words: int = 100_000,
) -> List[Tuple[str, str]]:
    """Train a BPE merges table on a corpus: one distributed
    word-frequency aggregation, then driver-side merge learning.

    The Spark stage is explode(pretokenize) → hash-agg on the word →
    top-``max_words`` by (count desc, word) — the only data-sized work,
    all map-side combined; the collect is capped at ``max_words`` rows
    (the classic BPE-trainer shape: corpora are unbounded, distinct-word
    tables are not). Whitespace-only pre-tokens are excluded from
    training (they stay single-symbol at encode time, like GPT-2's
    space handling at small vocab sizes).
    """
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), F.lit(0))
        ).alias("w")
    ).filter(F.trim("w") != "")
    counts = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_words)
        .collect()
    )
    return learn_merges({r["w"]: r["c"] for r in counts}, num_merges)


def encode_word(
    word: str,
    ranks: Dict[Tuple[str, str], int],
    cache: Dict[str, Tuple[str, ...]],
) -> Tuple[str, ...]:
    """Greedy BPE encode of one pre-token: repeatedly merge the
    lowest-rank adjacent pair present (the GPT-2 ``bpe()`` loop)."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    toks: Tuple[str, ...] = tuple(word)
    while len(toks) > 1:
        pairs = {(toks[i], toks[i + 1]) for i in range(len(toks) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        toks = _merge_word(toks, min(ranked)[1])
    cache[word] = toks
    return toks


def encode_text(
    text: str,
    ranks: Dict[Tuple[str, str], int],
    cache: Dict[str, Tuple[str, ...]],
) -> List[str]:
    out: List[str] = []
    for w in pretokenize(text):
        out.extend(encode_word(w, ranks, cache))
    return out


def bpe_encode(
    df: DataFrame,
    merges: Sequence[Tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, tokens: array<string>, n_tokens: long) — Arrow-batched
    BPE encoding of each document under a fixed merges table.

    The ranks dict rides a SparkContext broadcast (shipped to each
    executor once, not per task); each Arrow batch shares a word→tokens
    cache. The id column keeps its input type.
    """
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(ranks)
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("tokens", ArrayType(StringType()), False),
            StructField("n_tokens", LongType(), False),
        ]
    )

    def fn(batches: Iterable) -> Iterable:
        import pandas as pd

        r = bc.value
        cache: Dict[str, Tuple[str, ...]] = {}
        for pdf in batches:
            toks = [
                list(encode_text(t if isinstance(t, str) else "", r, cache))
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return df.select(id_col, text_col).mapInPandas(fn, schema)


def bpe_token_counts(
    df: DataFrame,
    merges: Sequence[Tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_tokens) — real-tokenizer token budgets, shaped for
    :func:`~.sampling.pack_sequences` (``token_col='n_tokens'``) and
    chunk sizing."""
    return bpe_encode(df, merges, id_col, text_col).select(id_col, "n_tokens")

"""End-to-end corpus curation: the canonical pretraining-data funnel as
ONE composed DataFrame plan.

    decontaminate (vs an eval benchmark)
      → exact dedup (min-id per content digest)
        → quality filter (C4/Gopher-style composite score)
          → deterministic hash sample
            → sequence packing (shard / pack_id / pack_offset)

No reference analog (`/root/reference` validates single tables) — this is
the builder's-brief training-pipeline composition: the operators already
exist (:mod:`decontaminate`, :mod:`dedup`, :mod:`textstats`,
:mod:`sampling`); this module wires them so a user gets a training-ready
pack layout in one call, and the whole funnel stays ONE lazy Catalyst
plan (no intermediate materialization, shared scans where stages allow).

Scale: the composition adds no new shuffle class — each stage's shuffle
inventory is exactly its SCALE.md row (broadcast benchmark join + doc-id
agg; digest agg + semi-join; pure projections for quality/sample; one
per-shard window for packing). Stage order is chosen so row-reducing
filters run BEFORE the digest shuffle and the packing window.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from . import dedup, sampling, textstats
from .decontaminate import decontaminate


def curate_corpus(
    df: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    min_overlap: int = 1,
    frac_threshold: Optional[float] = None,
    quality_threshold: float = 0.6,
    sample_rate: float = 1.0,
    budget: int = 512,
    n_shards: int = 64,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Run the full curation funnel; returns one row per surviving doc::

        (id_col, n_tokens, shard, pack_id, pack_offset)

    ``n_tokens`` is the whitespace token count that fed the packer.
    Every stage is deterministic (portable hashes, min-id keep, fixed
    thresholds), so the whole funnel is replayable by an external SQL
    oracle and stable across runs, engines and repartitions.

    Stage parameters are the underlying operators' (see their docstrings
    for semantics and NULL policies): ``k``/``min_overlap``/
    ``frac_threshold``/``broadcast_benchmark`` → decontamination;
    ``quality_threshold`` compares against
    :func:`textstats.quality_score_col` (rounded to 2 decimals, so the
    filter agrees with the reported feature); ``sample_rate`` < 1.0
    applies :func:`sampling.hash_sample`; ``budget``/``n_shards``/
    ``seed`` → :func:`sampling.pack_sequences`.
    """
    kept = decontaminate(
        df,
        benchmark,
        k=k,
        id_col=id_col,
        text_col=text_col,
        min_overlap=min_overlap,
        frac_threshold=frac_threshold,
        broadcast_benchmark=broadcast_benchmark,
    )
    kept = dedup.exact_dedup(kept, text_col=text_col, id_col=id_col)
    kept = kept.filter(
        textstats.quality_score_col(F.col(text_col))
        >= F.lit(quality_threshold)
    )
    if sample_rate < 1.0:
        kept = sampling.hash_sample(kept, sample_rate, id_col, seed=seed)
    with_tokens = kept.select(
        F.col(id_col),
        textstats.ws_token_count(F.col(text_col)).alias("n_tokens"),
    )
    return sampling.pack_sequences(
        with_tokens,
        budget=budget,
        token_col="n_tokens",
        id_col=id_col,
        n_shards=n_shards,
        seed=seed,
    )

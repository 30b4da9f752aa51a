"""Corpus-trained language-model scoring: CCNet-style perplexity
filtering without an external model.

No reference analog (`/root/reference` validates transcripts only) — this
is the builder's-brief quality stage used by CCNet/LLaMA-class data
pipelines: score each document by its per-token log-probability under a
language model and filter the tails. Here the LM is the corpus's own
add-alpha unigram model, so the whole computation is closed-form,
deterministic, and replayable by an external SQL oracle.

Scale design:
* token counts: explode (map) → ONE hash-agg on the token (map-side
  combined) — the classic word-count shuffle.
* model size is bounded by ``top_k`` (default 50,000): everything
  outside the head folds into a single OOV bucket whose probability
  mass is exact (tail count derived from the totals), so the join side
  broadcast to score documents is a capped head table, never the full
  vocabulary of a 100 TB corpus. ``top_k=None`` keeps the exact full
  vocabulary (fine at small scale; the gate query uses it).
* scoring: exploded tokens LEFT-join the broadcast head (missing →
  OOV log-prob literal) → ONE hash-agg on doc id. Totals (N tokens,
  V vocab) are a 1-row aggregate collected driver-side — metadata
  scale, like every report scalar in the engine.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .textstats import ws_tokens


def unigram_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    top_k: Optional[int] = 50_000,
) -> DataFrame:
    """Per-document mean token log-probability and perplexity under the
    corpus's add-``alpha`` unigram LM::

        (id_col, n_tokens, mean_logprob, perplexity)

    p(tok) = (count + alpha) / (N + alpha * (V + 1)); with ``top_k`` set,
    tokens outside the most frequent ``top_k`` share one OOV bucket whose
    count is the exact tail mass. Docs with zero tokens are excluded
    (no distribution to score). perplexity = exp(-mean_logprob).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(ws_tokens(F.col(text_col))).alias("tok"),
    )
    # the word-count aggregate feeds three jobs (totals, top-k head,
    # scoring-side broadcast build) — persist it so the corpus is
    # tokenized and counted ONCE; Spark's LRU block manager reclaims it
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).persist()
    totals = vocab.agg(
        F.sum("c").alias("n_tokens_total"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    n_total = int(totals["n_tokens_total"] or 0)
    v_total = int(totals["v"] or 0)
    denom = n_total + alpha * (v_total + 1)
    if n_total == 0:
        vocab.unpersist()
        # keep the caller's id type (empty frame, schema-faithful)
        return df.select(F.col(id_col)).limit(0).select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0.0).alias("mean_logprob"),
            F.lit(0.0).alias("perplexity"),
        )

    if top_k is not None:
        head = vocab.orderBy(F.desc("c"), "tok").limit(top_k)
        head_totals = head.agg(
            F.sum("c").alias("hc"), F.count(F.lit(1)).alias("hv")
        ).collect()[0]
        tail_count = n_total - int(head_totals["hc"] or 0)
        tail_vocab = v_total - int(head_totals["hv"] or 0)
        # the OOV bucket carries the exact tail mass: its probability is
        # the AVERAGE tail-token probability, so total mass is conserved
        oov_logp = math.log(
            (tail_count / max(tail_vocab, 1) + alpha) / denom
        )
        model = head
    else:
        oov_logp = math.log(alpha / denom)  # unreachable for own corpus
        model = vocab

    scored = model.withColumn(
        "logp", F.log((F.col("c") + F.lit(alpha)) / F.lit(denom))
    ).select("tok", "logp")
    per_doc = (
        toks.join(F.broadcast(scored), "tok", "left")
        .select(
            "id", F.coalesce("logp", F.lit(oov_logp)).alias("logp")
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("logp").alias("mean_logprob"),
        )
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_tokens",
        "mean_logprob",
        F.exp(-F.col("mean_logprob")).alias("perplexity"),
    )


def bigram_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    lam: float = 0.7,
) -> DataFrame:
    """Per-document perplexity under an interpolated add-``alpha``
    BIGRAM model trained on the corpus itself::

        p(w2 | w1) = lam · p_bi(w2|w1) + (1 − lam) · p_uni(w2)
        p_bi(w2|w1) = (c(w1,w2) + alpha) / (c_ctx(w1) + alpha · (V + 1))

    Returns ``(id_col, n_bigrams, mean_logprob, perplexity)``; docs with
    fewer than two tokens have no bigrams and are excluded.

    Scale: unlike the unigram scorer, NOTHING broadcasts — the bigram
    model, context counts and unigram table all join on their keys as
    standard partitioned shuffle joins, so web-scale vocabularies are
    fine. Shuffles: gram/token/context hash-aggs + three key-partitioned
    joins + one doc-id agg, all map-side combined. Deterministic, so an
    external SQL oracle replays the arithmetic exactly.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    from .textstats import word_grams

    toks = df.select(F.explode(ws_tokens(F.col(text_col))).alias("tok"))
    # persist the AGGREGATED relations (model-sized, never the exploded
    # token/gram streams): uni feeds totals + the p_uni join, cbi feeds
    # the context agg + the model join — without persist each would
    # re-tokenize the corpus per consumer (same finding the review made
    # on the unigram scorer). Spark's LRU block manager reclaims them.
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cu")).persist()
    totals = uni.agg(
        F.sum("cu").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    n_total, v_total = int(totals["n"] or 0), int(totals["v"] or 0)
    if n_total == 0:
        return df.select(F.col(id_col)).limit(0).select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_bigrams"),
            F.lit(0.0).alias("mean_logprob"),
            F.lit(0.0).alias("perplexity"),
        )
    uni_denom = float(n_total + alpha * (v_total + 1))
    p_uni = uni.select(
        "tok", ((F.col("cu") + F.lit(alpha)) / F.lit(uni_denom)).alias("pu")
    )

    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_grams(F.col(text_col), 2)).alias("g"),
    )
    cbi = grams.groupBy("g").agg(F.count(F.lit(1)).alias("cb")).persist()
    w1 = F.split(F.col("g"), " ").getItem(0)
    ctx = cbi.groupBy(w1.alias("w1")).agg(F.sum("cb").alias("cc"))
    model = (
        cbi.withColumn("w1", w1)
        .join(ctx, "w1")
        .select(
            "g",
            (
                (F.col("cb") + F.lit(alpha))
                / (F.col("cc") + F.lit(alpha * (v_total + 1)))
            ).alias("pb"),
        )
    )
    w2 = F.split(F.col("g"), " ").getItem(1)
    scored = (
        grams.join(model, "g")
        .withColumn("w2", w2)
        .join(p_uni.withColumnRenamed("tok", "w2"), "w2")
        .select(
            "id",
            F.log(
                F.lit(lam) * F.col("pb") + F.lit(1.0 - lam) * F.col("pu")
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("logp").alias("mean_logprob"),
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        "mean_logprob",
        F.exp(-F.col("mean_logprob")).alias("perplexity"),
    )


def perplexity_filter(
    df: DataFrame,
    max_perplexity: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    top_k: Optional[int] = 50_000,
) -> DataFrame:
    """``df`` minus documents whose unigram perplexity exceeds
    ``max_perplexity`` (the CCNet-style tail cut). Zero-token docs are
    kept (they have no score; length filters are a separate concern)."""
    scores = unigram_perplexity(
        df, id_col=id_col, text_col=text_col, alpha=alpha, top_k=top_k
    )
    bad = scores.filter(
        F.col("perplexity") > F.lit(max_perplexity)
    ).select(F.col(id_col))
    return df.join(bad, id_col, "left_anti")

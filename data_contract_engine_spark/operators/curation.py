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


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------

def funnel_lineage(
    k: int,
    min_overlap: int,
    frac_threshold: Optional[float],
    quality_threshold: float,
    sample_rate: float,
    seed: int,
    benchmark_fingerprint: str = "",
) -> str:
    """Hash of everything that determines a partition's candidate rows —
    funnel parameters, engine version and (optionally) a caller-supplied
    benchmark fingerprint. Changing any of them invalidates old
    checkpoints, exactly like :func:`..checkpoint.lineage_hash` for
    validation runs."""
    import hashlib

    from ..checkpoint import ENGINE_VERSION

    payload = "|".join(
        str(x)
        for x in (
            "curate", k, min_overlap, frac_threshold, quality_threshold,
            sample_rate, seed, ENGINE_VERSION, benchmark_fingerprint,
        )
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def curate_corpus_resumable(
    df: DataFrame,
    benchmark: DataFrame,
    store,
    run_id: str,
    partition_col: str,
    candidates_out: str,
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
    benchmark_fingerprint: str = "",
    all_partitions: Optional[list] = None,
):
    """:func:`curate_corpus` with partition-granular checkpoint/resume —
    at 100 TB a preempted one-shot funnel would replay EVERYTHING; this
    variant replays only unfinished partitions.

    Phase split (the key design decision):

    * **Phase 1 — per-doc scoring, partition-wise, checkpointed.** All
      the raw-text cost (benchmark shingle overlap, quality features,
      token counting) is a pure per-document function, so
      it runs one input partition at a time: surviving docs' compact
      candidate rows ``(doc_id, digest, n_tokens)`` are written to
      ``candidates_out/run=<run_id>/lineage=<lineage>/`` (namespaced so a
      new run or changed funnel parameters can never read another run's
      stale partitions) partitioned by ``partition_col`` with DYNAMIC
      partition overwrite (idempotent per partition — a crash between
      the write and the checkpoint flip just re-overwrites the same
      partition on resume), then the partition's checkpoint row flips to
      DONE via :class:`..checkpoint.CheckpointStore` (parquet append
      here; on a real cluster both writes back onto the snapshot/Iceberg
      catalog — ``TableCatalog.merge`` keyed by (run_id, partition_key)
      is the documented seam, pinned idempotent in test_catalog.py).
    * **Phase 2 — global stages over the compact table.** Exact dedup's
      min-id-per-digest, the hash sample and the packing window are
      corpus-GLOBAL (a digest group or pack shard spans input
      partitions), so they cannot be checkpointed per input partition
      without changing semantics. They run on every call — over the
      materialized candidate rows (~40 bytes/doc, not the raw corpus),
      so re-running phase 2 after a crash costs a scan of the small
      table, never of the 100 TB input.

    The result is byte-identical to the one-shot :func:`curate_corpus`
    on the same input, which the kill-and-resume test pins: the
    decontamination and quality filters are pure functions of the TEXT,
    hence uniform across a digest group, so hoisting them before the
    min-id dedup cannot change which groups survive or their min ids —
    but the hash SAMPLE keys on doc_id, so it must stay AFTER dedup
    (sampling first would promote a larger-id duplicate whenever the
    representative sampled out), which is why it lives in phase 2.

    Returns ``(result_df, resumable_stats)`` where ``resumable_stats``
    mirrors :class:`..checkpoint.ResumableResult` fields
    (pending_before / skipped counts for observability).
    """
    import os as _os
    import time as _time

    from .. import checkpoint as ckpt

    spark = df.sparkSession
    lin = funnel_lineage(
        k, min_overlap, frac_threshold, quality_threshold, sample_rate,
        seed, benchmark_fingerprint,
    )
    # Namespace the candidate table by (run_id, lineage): dynamic
    # partition overwrite only rewrites partitions that produce ≥1 row,
    # so sharing one directory across runs or parameter changes would
    # leave STALE candidate rows in any partition whose new candidate
    # set is empty (e.g. a tighter quality_threshold drops every doc) —
    # and phase 2 would silently read them (round-4 advice). A fresh
    # subdirectory per (run_id, lineage) starts empty, so the dynamic
    # overwrite's rewrite-only-nonempty semantics can never resurrect
    # another run's rows.
    candidates_out = _os.path.join(
        candidates_out, f"run={run_id}", f"lineage={lin}"
    )
    if all_partitions is None:
        all_partitions = [
            r[0]
            for r in df.select(F.col(partition_col).cast("string"))
            .distinct()
            .collect()
        ]
    done = set(store.done_partitions(run_id, lin))
    pending = [p for p in all_partitions if p not in done]

    def _cand_projection(frame):
        return frame.select(
            F.col(id_col),
            dedup.content_digest(F.col(text_col)).alias("digest"),
            textstats.ws_token_count(F.col(text_col)).alias("n_tokens"),
            F.col(partition_col).cast("string").alias("__part"),
        )

    if pending:
        sub = df.filter(F.col(partition_col).cast("string").isin(pending))
        kept = decontaminate(
            sub,
            benchmark,
            k=k,
            id_col=id_col,
            text_col=text_col,
            min_overlap=min_overlap,
            frac_threshold=frac_threshold,
            broadcast_benchmark=broadcast_benchmark,
        )
        kept = kept.filter(
            textstats.quality_score_col(F.col(text_col))
            >= F.lit(quality_threshold)
        )
        cand = _cand_projection(kept)
        (
            cand.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__part")
            .parquet(candidates_out)
        )
        # candidate partitions are durable — flip their checkpoints.
        # (A crash BEFORE this append leaves the partitions pending; the
        # dynamic overwrite above makes the retry idempotent.)
        rows = spark.createDataFrame(
            [
                (run_id, p, lin, "DONE", None, None, None, None, None,
                 _time.time())
                for p in pending
            ],
            ckpt.CHECKPOINT_SCHEMA,
        )
        store.write_done(rows)

    # Explicit schema: a run whose every pending partition produced zero
    # candidates leaves the namespaced directory with no parquet files,
    # where schema inference would fail. The projection's schema is known
    # without running anything (plan analysis only).
    cand_all = (
        spark.read.schema(_cand_projection(df).schema)
        .parquet(candidates_out)
        .filter(F.col("__part").isin(all_partitions))
        .drop("__part")
    )
    # phase 2: global min-id-per-digest dedup, hash sample, then the
    # packing window — same operators in the same order as the one-shot
    # funnel's tail (and therefore byte-identical output).
    keep = cand_all.groupBy("digest").agg(F.min(id_col).alias(id_col))
    deduped = cand_all.join(
        keep, [id_col, "digest"], "left_semi"
    ).select(id_col, "n_tokens")
    if sample_rate < 1.0:
        deduped = sampling.hash_sample(deduped, sample_rate, id_col, seed=seed)
    result = sampling.pack_sequences(
        deduped,
        budget=budget,
        token_col="n_tokens",
        id_col=id_col,
        n_shards=n_shards,
        seed=seed,
    )
    return result, ckpt.ResumableResult(
        run_id, len(pending), len(pending), len(done), None
    )

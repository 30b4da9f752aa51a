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


def _near_dup_dropped(
    kept: DataFrame,
    near_dup: str,
    id_col: str,
    text_col: str,
    near_dup_threshold: float,
    minhash_k: int,
    minhash_num_hashes: int,
    minhash_bands: int,
    max_shingle_freq,
    embeddings: Optional[DataFrame],
    emb_id_col: str,
    emb_vec_col: str,
    centroids,
    n_lists: int,
    semantic_exact: bool,
    seed: int,
) -> DataFrame:
    """Non-representative near-dup cluster members of ``kept`` — one
    column ``id_col``, sized ≈ duplicate count (anti-join fodder).

    ``minhash`` composes :func:`dedup.minhash_near_duplicates` (LSH
    candidates + exact-Jaccard verify) with
    :func:`dedup.duplicate_clusters`; ``semantic`` restricts
    ``embeddings`` to the surviving docs (semi-join — a doc whose
    near-dup twin was already removed upstream must not lose its
    representative) and runs :func:`dedup.semantic_dedup`. Docs with no
    embedding row are never dropped (anti-join against dropped, not
    semi-join against survivors)."""
    if near_dup == "minhash":
        pairs = dedup.minhash_near_duplicates(
            kept,
            id_col,
            text_col,
            k=minhash_k,
            num_hashes=minhash_num_hashes,
            bands=minhash_bands,
            threshold=near_dup_threshold,
            max_shingle_freq=max_shingle_freq,
        )
        comp = dedup.duplicate_clusters(pairs.select("id_a", "id_b"))
        return comp.filter(F.col("id") != F.col("cluster_id")).select(
            F.col("id").alias(id_col)
        )
    if near_dup == "semantic":
        if embeddings is None:
            raise ValueError("near_dup='semantic' requires embeddings=")
        sub = embeddings.join(
            kept.select(F.col(id_col).alias(emb_id_col)),
            emb_id_col,
            "left_semi",
        )
        surv = dedup.semantic_dedup(
            sub,
            id_col=emb_id_col,
            vec_col=emb_vec_col,
            threshold=near_dup_threshold,
            centroids=centroids,
            n_lists=n_lists,
            seed=seed,
            exact=semantic_exact,
        )
        return sub.select(F.col(emb_id_col).alias(id_col)).join(
            surv.select(F.col(emb_id_col).alias(id_col)),
            id_col,
            "left_anti",
        )
    raise ValueError(
        f"near_dup must be 'minhash', 'semantic' or None, got {near_dup!r}"
    )


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
    near_dup: Optional[str] = None,
    near_dup_threshold: float = 0.8,
    minhash_k: int = 3,
    minhash_num_hashes: int = 32,
    minhash_bands: int = 8,
    max_shingle_freq: Optional[int] = dedup.DEFAULT_MAX_SHINGLE_FREQ,
    embeddings: Optional[DataFrame] = None,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
    centroids=None,
    n_lists: int = 16,
    semantic_exact: bool = False,
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

    ``near_dup`` adds a fuzzy-dedup stage AFTER the quality filter
    (RefinedWeb-style filter-then-dedup order — and deliberately NOT
    between decontamination and quality: quality is uniform across an
    exact-digest group but not across a near-dup cluster, so running
    near-dup first would let a low-quality representative drag its
    whole cluster out of the corpus, and it would break byte-parity
    with :func:`curate_corpus_resumable`, whose phase split hoists the
    quality filter into phase 1). ``'minhash'`` composes the certified
    LSH + exact-verify + connected-components operators over the text;
    ``'semantic'`` composes SemDeDup over a caller-supplied
    ``embeddings`` table (``emb_id_col`` must align with ``id_col``
    values); docs without an embedding row are kept.
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
    if near_dup is not None:
        # cut the lineage before the fuzzy stage: minhash's internal
        # actions (stop-shingle probe, candidate checkpoint, cluster
        # rounds) and the final anti-join would otherwise each replay
        # the decontaminate→dedup→quality prefix from the raw corpus
        # (≥3 full-funnel scans measured) — same pattern as
        # semantic_dedup's lazily checkpointed `assigned`. At 100 TB
        # the funnel's phase split (curate_corpus_resumable) is the
        # real answer; this bounds the one-shot path.
        kept = kept.localCheckpoint(eager=False)
        dropped = _near_dup_dropped(
            kept, near_dup, id_col, text_col, near_dup_threshold,
            minhash_k, minhash_num_hashes, minhash_bands, max_shingle_freq,
            embeddings, emb_id_col, emb_vec_col, centroids, n_lists,
            semantic_exact, seed,
        )
        kept = kept.join(dropped, id_col, "left_anti")
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
    near_dup: Optional[str] = None,
    near_dup_threshold: float = 0.8,
    embeddings: Optional[DataFrame] = None,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
    centroids=None,
    n_lists: int = 16,
    semantic_exact: bool = False,
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
      table, never of the 100 TB input. ``near_dup='semantic'`` also
      lives here: SemDeDup joins the candidate ids against the separate
      ``embeddings`` table, so it never needs the raw text — which is
      also why ``near_dup='minhash'`` is rejected in the resumable
      variant (its shingles ARE the raw text; re-deriving them would
      re-scan the full corpus every resume, defeating the phase split —
      use the one-shot :func:`curate_corpus` or persist a shingle
      digest table upstream).

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

    if near_dup == "minhash":
        raise ValueError(
            "near_dup='minhash' needs the raw text and is not resumable-"
            "phase-2 compatible; use curate_corpus or run minhash "
            "upstream"
        )
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
    if near_dup is not None:
        dropped = _near_dup_dropped(
            deduped, near_dup, id_col, text_col, near_dup_threshold,
            3, 32, 8, None,
            embeddings, emb_id_col, emb_vec_col, centroids, n_lists,
            semantic_exact, seed,
        )
        deduped = deduped.join(dropped, id_col, "left_anti")
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

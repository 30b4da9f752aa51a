"""Deterministic sampling + sequence packing for training-data pipelines.

Two operations every large-scale dataset build needs and `df.sample` does
not give you:

* **hash sampling** — membership decided by a pure hash of a stable key,
  so the sample is reproducible across runs, engines and repartitions
  (``df.sample`` depends on partition layout and RNG state), and
  subsets nest: rate 0.1 ⊂ rate 0.2 ⊂ … because the keep rule is a
  threshold on the same hash value. Stratified variant applies per-group
  rates (e.g. downsample web crawl, keep all books).
* **sequence packing** — the "concat documents, cut into fixed token
  budgets" shape used to build LLM pretraining examples. Packing is done
  per shard (hash of the id) with a window cumsum inside each shard, so
  the sort is per-shard, never global — at 10¹² docs every shard packs
  independently on its executor.

Both are pure Column pipelines (no UDFs) and both use the md5-derived
portable hash so an external SQL oracle can replay membership exactly.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Window, functions as F

HASH_SPACE = 1_000_000


def portable_key_hash(key: Column, seed: int = 42) -> Column:
    """Stable 32-bit-ish hash of a key column: md5 hex window → bigint.
    Portable to any SQL engine (the DuckDB oracle recomputes it)."""
    hx = F.md5(F.concat(key.cast("string"), F.lit(f"|{seed}")).cast("binary"))
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")


def _null_guard(df: DataFrame, key_col: str, keep_cond, on_null: str):
    """NULL keys hash to NULL and a bare filter would drop them SILENTLY
    (even at rate 1.0) — make the policy explicit instead."""
    key_null = F.col(key_col).isNull()
    if on_null == "drop":
        return df.filter(~key_null & keep_cond)
    if on_null == "keep":
        return df.filter(key_null | keep_cond)
    raise ValueError(f"on_null must be 'drop' or 'keep', got {on_null!r}")


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    seed: int = 42,
    on_null: str = "drop",
) -> DataFrame:
    """Keep rows where hash(key) mod 10⁶ < rate·10⁶ — a deterministic,
    nested, repartition-stable sample. Pure filter: pushes to the scan,
    zero shuffles. Rows with a NULL key follow ``on_null`` ('drop', the
    default, or 'keep') — never a silent hash-of-null drop."""
    h = F.pmod(portable_key_hash(F.col(key_col), seed), F.lit(HASH_SPACE))
    return _null_guard(
        df, key_col, h < F.lit(int(rate * HASH_SPACE)), on_null
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: Dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 1.0,
    seed: int = 42,
    on_null: str = "drop",
) -> DataFrame:
    """Per-stratum hash sampling: ``rates`` maps stratum value → keep
    rate; unlisted strata keep ``default_rate``. One fused CASE filter.
    NULL keys follow ``on_null`` like :func:`hash_sample`."""
    h = F.pmod(portable_key_hash(F.col(key_col), seed), F.lit(HASH_SPACE))
    threshold = None
    for value, rate in sorted(rates.items()):
        cond = F.col(strata_col) == value
        t = F.lit(int(rate * HASH_SPACE))
        threshold = (
            F.when(cond, t) if threshold is None else threshold.when(cond, t)
        )
    threshold = (
        F.lit(int(default_rate * HASH_SPACE))
        if threshold is None
        else threshold.otherwise(F.lit(int(default_rate * HASH_SPACE)))
    )
    return _null_guard(df, key_col, h < threshold, on_null)


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: int = 42,
    on_null: str = "error",
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are sharded by key
    hash, ordered deterministically inside the shard (hash, then id — a
    stable pseudo-random order), concatenated into one virtual token
    stream per shard, and cut at every ``budget`` tokens. Each document
    gets (shard, pack_id, pack_offset) = the pack containing its FIRST
    token and its start position there; a document may span into the
    following pack(s) — the standard LLM-pretraining packing shape (the
    trainer masks attention across document boundaries).

    The window is ``partitionBy(shard)`` — per-shard sort, never a global
    one — so packing scales with executors; shard count bounds per-task
    sort size; the cut itself is a closed-form projection over the
    running token sum (no iterative bin state).

    A NULL ``token_col`` would otherwise poison the running sum (cum −
    NULL = NULL) and silently yield NULL pack ids for every later doc in
    the shard — ``on_null`` makes the policy explicit (mirroring
    :func:`hash_sample`'s ``_null_guard``): ``'error'`` (default) raises
    at execution time, ``'zero'`` packs the doc with 0 tokens (it shares
    the next doc's start position), ``'drop'`` filters such docs out.
    """
    clash = {"shard", "pack_id", "pack_offset", "__pack_order"} & set(
        df.columns
    )
    if clash:
        raise ValueError(
            f"pack_sequences output columns collide with input: {sorted(clash)}"
        )
    tokens = F.col(token_col).cast("long")
    if on_null == "error":
        tokens = F.when(
            F.col(token_col).isNull(),
            F.raise_error(
                F.lit(
                    f"pack_sequences: NULL {token_col!r} "
                    "(pass on_null='zero' or 'drop' for a lenient policy)"
                )
            ).cast("long"),
        ).otherwise(tokens)
    elif on_null == "zero":
        tokens = F.coalesce(tokens, F.lit(0).cast("long"))
    elif on_null == "drop":
        df = df.filter(F.col(token_col).isNotNull())
    else:
        raise ValueError(
            f"on_null must be 'error', 'zero' or 'drop', got {on_null!r}"
        )
    h = portable_key_hash(F.col(id_col), seed)
    out = df.select(
        "*",
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("__pack_order"),
    )
    w = Window.partitionBy("shard").orderBy("__pack_order", id_col)
    # running sums and pack ids stay LONG end to end: a shard's cumulative
    # token count passes 2^31 early at real scale, and an int32 product
    # (pack_id * budget) would wrap silently into negative offsets
    cum = F.sum(tokens).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # tokens before this doc in the shard stream decide where it starts
    prev_cum = cum - tokens
    budget_l = F.lit(budget).cast("long")
    pack_id = F.floor(prev_cum / budget_l).cast("long")
    pack_offset = (prev_cum - pack_id * budget_l).cast("long")
    return out.select(
        *[c for c in df.columns],
        "shard",
        pack_id.alias("pack_id"),
        pack_offset.alias("pack_offset"),
    )


def cap_per_group(
    df: DataFrame,
    max_per_group: int,
    group_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
    on_null: str = "drop",
) -> DataFrame:
    """Keep at most ``max_per_group`` rows per ``group_col`` value — the
    domain-frequency cap of a web-corpus pipeline (no single domain may
    dominate the training mix). Selection is deterministic: rows rank by
    the portable key hash (ties by key), so the survivors are stable
    across runs/engines/repartitions and an external SQL oracle replays
    membership exactly. Rows with a NULL ``key_col`` follow ``on_null``
    ('drop', the default, or 'keep' — ranked LAST, matching SQL
    nulls-last so the oracle replay holds), mirroring
    :func:`hash_sample`'s explicit policy. Because NULL keys (and
    duplicate keys) tie on both primary sort keys, a final whole-row
    xxhash64 tiebreaker keeps the survivor SET deterministic even when
    the cap cuts through a tied block (round-3 advice; bit-identical
    rows remain interchangeable, which preserves the output multiset).

    Scale: ONE shuffle on the group column for the ranking window.
    Per-task state is the group's row set — a pathologically hot domain
    concentrates on one task, which is exactly the case the cap exists
    for; if a single group exceeds task memory, pre-filter it with
    :func:`hash_sample` before capping.
    """
    if max_per_group < 1:
        raise ValueError(
            f"max_per_group must be >= 1, got {max_per_group}"
        )
    if on_null == "drop":
        df = df.filter(F.col(key_col).isNotNull())
    elif on_null != "keep":
        raise ValueError(f"on_null must be 'drop' or 'keep', got {on_null!r}")
    clash = {"__rank"} & set(df.columns)
    if clash:
        raise ValueError(
            f"cap_per_group needs the internal column name {sorted(clash)} "
            "free; rename it in the input"
        )
    h = portable_key_hash(F.col(key_col), seed)
    row_tiebreak = F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))
    w = Window.partitionBy(group_col).orderBy(
        h.asc_nulls_last(), F.col(key_col).asc_nulls_last(), row_tiebreak
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= max_per_group)
        .drop("__rank")
    )


def upsample_by_weight(
    df: DataFrame,
    weight_col: str,
    max_weight: int = 100,
) -> DataFrame:
    """Materialize integer repetition weights — the data-mixing stage
    that repeats high-value documents N times (epochs-per-source style).
    One output row per copy with a 1-based ``copy_idx`` column; weight 0
    (or NULL, or negative) drops the row; weights clamp at
    ``max_weight`` so a corrupt weight column cannot explode the output.
    Deterministic (no RNG), a pure projection + bounded explode — zero
    shuffles — and trivially replayable by a SQL oracle.
    """
    if max_weight < 1:
        raise ValueError(f"max_weight must be >= 1, got {max_weight}")
    if "copy_idx" in df.columns:
        raise ValueError(
            "upsample_by_weight needs the 'copy_idx' output name free"
        )
    w = F.coalesce(F.col(weight_col).cast("int"), F.lit(0))
    copies = F.when(
        w >= 1, F.sequence(F.lit(1), F.least(w, F.lit(max_weight)))
    ).otherwise(F.array().cast("array<int>"))
    # (sequence(1, 0) would COUNT DOWN to [1, 0] — the when-guard above
    # is what keeps weight-0 rows out instead of duplicating them)
    return df.withColumn("copy_idx", F.explode(copies))


def corpus_shuffle(
    df: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-example order.

    Training runs need the corpus in a pseudo-random order that is (a)
    reproducible across runs/engines/repartitions and (b) computable
    without a global sort. Each row gets::

        shard     — pmod(portable_hash(id, seed), n_shards)
        shard_pos — 1-based rank inside the shard, ordered by
                    (hash, id)  (id breaks 32-bit hash collisions)

    Readers stream shards in index order (or round-robin across them) to
    consume the corpus in shuffled order; a different ``seed`` is a fresh
    and unrelated permutation.

    Scale: ONE shuffle, partitioned by ``shard``; each shard sorts
    independently on its executor, so per-task sort size is
    ``corpus/n_shards`` — pick ``n_shards`` so a shard fits an executor
    (100 TB → n_shards ≈ 10⁵). No global sort, no driver state. The hash
    is the md5-derived portable key, so an external SQL oracle replays
    shard AND position exactly.
    """
    clash = {"shard", "shard_pos", "__shuffle_key"} & set(df.columns)
    if clash:
        raise ValueError(
            f"corpus_shuffle output columns collide with input: {sorted(clash)}"
        )
    h = portable_key_hash(F.col(id_col), seed)
    out = df.select(
        "*",
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("__shuffle_key"),
    )
    w = Window.partitionBy("shard").orderBy("__shuffle_key", id_col)
    return out.select(
        *[c for c in df.columns],
        "shard",
        F.row_number().over(w).cast("long").alias("shard_pos"),
    )

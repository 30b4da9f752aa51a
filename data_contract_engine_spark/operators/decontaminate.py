"""Benchmark decontamination: find training documents that share word
n-grams with an evaluation (benchmark) corpus, and strip them.

No reference analog (`/root/reference` validates transcripts only) — this
is a training-data-pipeline stage from the builder's brief: before
pretraining, every corpus is checked for n-gram collisions against the
held-out evaluation suites so benchmark answers don't leak into the
training set (standard practice since the GPT-2/GPT-3 data work, which
used 8- and 13-gram collision tests).

Scale design (corpus ~100 TB, benchmark ~10⁶–10⁸ distinct shingles):

* the benchmark side is shingled, ``distinct``-ed and **broadcast** — the
  eval suite is tiny relative to the corpus, and the corpus is NEVER the
  build side. If the benchmark is too large to broadcast, pass
  ``broadcast_benchmark=False`` for a shuffle hash join keyed on the
  shingle (the corpus side then shuffles shingle strings once).
* the corpus side is a pure map (tokenize → explode) into ONE
  hash-aggregation on the doc id (map-side partial combine). No corpus
  self-join and no shuffle of document text — the only corpus shuffle
  carries ``(doc_id, two counters)``.
* contaminated-id removal is a left-anti join on the id; AQE converts it
  to a broadcast join when the contaminated set is small (the usual case).

Pure Column pipeline — no Python UDFs; the tokenizer/shingler is shared
with the dedup family (:func:`dedup.shingle_table`), so one gram builder
feeds dedup, Jaccard AND decontamination and the SQL oracle replays all
three identically.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .dedup import balance_input, shingle_table


def contamination_scores(
    df: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: Optional[str] = None,
    min_overlap: int = 1,
    frac_threshold: Optional[float] = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination stats against a benchmark corpus.

    Returns one row per distinct ``id_col`` of ``df``::

        (id_col, n_shingles, n_overlap, overlap_frac, contaminated)

    ``n_shingles``  — distinct word ``k``-grams in the document (0 for
    docs shorter than ``k`` words, which can never collide and are clean
    by definition);
    ``n_overlap``   — how many of them also appear anywhere in the
    benchmark corpus;
    ``overlap_frac``— ``n_overlap / n_shingles`` (0.0 when no shingles);
    ``contaminated``— ``n_overlap >= min_overlap`` and, when
    ``frac_threshold`` is set, ``overlap_frac >= frac_threshold`` too.

    ``k`` defaults to 8 (the GPT-3 collision width); gate fixtures use
    smaller ``k`` so short synthetic docs can collide at all.
    """
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    bench_text = bench_text_col or text_col
    bench_sh = (
        shingle_table(benchmark, id_col=id_col, text_col=bench_text, k=k)
        .select("shingle")
        .distinct()
        .withColumn("_bench_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)

    corpus_sh = shingle_table(
        balance_input(df), id_col=id_col, text_col=text_col, k=k
    )
    # left join marks benchmark shingles; ONE agg computes size + overlap
    scores = (
        corpus_sh.join(bench_sh, "shingle", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_bench_hit").alias("n_overlap"),
        )
    )

    # docs with < k words have no shingle rows — re-attach them as clean
    # (id-only join: the shuffle carries ids and two longs, never text)
    spine = df.select(F.col(id_col).alias("id")).distinct()
    out = (
        spine.join(scores, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        )
        .withColumn(
            "overlap_frac",
            F.when(
                F.col("n_shingles") > 0,
                F.round(F.col("n_overlap") / F.col("n_shingles"), 6),
            ).otherwise(F.lit(0.0)),
        )
    )
    contaminated = F.col("n_overlap") >= F.lit(min_overlap)
    if frac_threshold is not None:
        contaminated = contaminated & (
            F.col("overlap_frac") >= F.lit(frac_threshold)
        )
    return out.withColumn("contaminated", contaminated)


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: Optional[str] = None,
    min_overlap: int = 1,
    frac_threshold: Optional[float] = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """``df`` minus every document flagged by :func:`contamination_scores`.

    Anti-join on the id column only; all original columns pass through
    untouched. AQE turns the anti-join into a broadcast when the
    contaminated set is small (the expected case for real eval suites).
    """
    bad = contamination_scores(
        df,
        benchmark,
        k=k,
        id_col=id_col,
        text_col=text_col,
        bench_text_col=bench_text_col,
        min_overlap=min_overlap,
        frac_threshold=frac_threshold,
        broadcast_benchmark=broadcast_benchmark,
    ).filter(F.col("contaminated"))
    return df.join(bad.select(id_col), id_col, "left_anti")

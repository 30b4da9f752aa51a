"""Deterministic phased replay of streaming semantics (AvailableNow).

The correctness gate needs STREAMING semantics — watermark late-row
drops, append-mode window finalization, dedup-state expiry across a
restart — replayed deterministically enough that a SQL oracle can
predict the sink exactly. The replay shape: each phase's rows land as
one file batch under the source directory, and each phase gets its own
``Trigger.AvailableNow`` run against the SAME checkpoint, so phase N+1
resumes phase N's watermark and operator state exactly like a restarted
production stream picking up newly arrived files.

Empirically pinned semantics this module (and the oracles built on it)
relies on — verified against Spark 4.x in tests/test_sources_streaming.py:

  * an AvailableNow run ends with a commit that advances the watermark
    to ``max(event time seen) - delay`` and finalizes append-mode
    windows with ``window_end <= watermark``;
  * rows with event time below the watermark at their batch's start are
    dropped by stateful operators (late data) — stateless projections
    still see them;
  * ``dropDuplicatesWithinWatermark`` evicts a key's state once
    ``watermark >= first_seen_event_time + delay`` (inclusive), so a
    replay arriving after eviction is admitted again.

At production scale the same shape is how a validation stream is
operated: files/partitions arrive, an AvailableNow pass drains them,
the checkpoint carries watermark + state to the next pass.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def _write_phase(df: DataFrame, src: str, i: int) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, f"phase_{i}")
    )


def replay_phases(
    spark: SparkSession,
    phases: Sequence[DataFrame],
    transform: Callable[[DataFrame], DataFrame],
    workdir: str,
    output_mode: str = "append",
    timeout_sec: int = 300,
) -> DataFrame:
    """Run ``transform(stream)`` over the phases with one AvailableNow
    pass per phase (shared checkpoint), sinking to parquet; returns the
    accumulated sink as a batch DataFrame."""
    src = os.path.join(workdir, "src")
    ckpt = os.path.join(workdir, "ckpt")
    sink = os.path.join(workdir, "sink")
    os.makedirs(src, exist_ok=True)
    schema = phases[0].schema
    for i, df in enumerate(phases):
        _write_phase(df, src, i)
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        q = (
            transform(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"streaming phase {i} did not drain in {timeout_sec}s"
            )
    return spark.read.parquet(sink)


def replay_phases_foreach(
    spark: SparkSession,
    phases: Sequence[DataFrame],
    handler: Callable[[DataFrame, int], None],
    workdir: str,
    timeout_sec: int = 300,
) -> None:
    """foreachBatch twin of :func:`replay_phases`: each phase becomes
    (at least) one micro-batch delivered to ``handler`` — the micro-batch
    validation shape, resumable across passes via the shared checkpoint."""
    src = os.path.join(workdir, "src")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(src, exist_ok=True)
    schema = phases[0].schema
    for i, df in enumerate(phases):
        _write_phase(df, src, i)
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        q = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"streaming phase {i} did not drain in {timeout_sec}s"
            )

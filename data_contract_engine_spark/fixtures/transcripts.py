"""Deterministic synthetic `transcripts` table (FIXTURES.md T1).

Schema (BASELINE.json input_hint):
    conv_id string, turn_idx int, role string, text string,
    tool string, ts timestamp

Two generators:

* :func:`transcripts_df` — Spark-native and fully distributed: built from
  ``spark.range`` + hash-derived columns (xxhash64), so a 10^9-turn table
  generates in parallel with zero driver memory and is reproducible for a
  given seed. Used by the benchmark and scale tests.

* :func:`events_to_transcripts` (in transcripts_sql.py) — derives a
  transcripts table from the driver-provided ``events`` parquet with ONE
  SQL text that both Spark and DuckDB can run, so every flagship query is
  oracle-checkable.

Violation injections (rates from FIXTURES.md: ~0.5% each, disjoint via
different moduli on the row hash): bad role ('robot'), unknown tool
('fax'), empty text, negative turn_idx, ts before 2020, and duplicated
(conv_id, turn_idx) rows. ~1% of conversations are "hot" (≥1000 turns) to
exercise skew salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

ROLES = ("system", "user", "assistant", "tool")
TOOLS = ("search", "browser", "python", "sql")
WORDS = (
    "the quick brown fox jumps over a lazy dog while spark shuffles "
    "partitions across executors and catalyst prunes columns for free"
).split()


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols)


def transcripts_df(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    hot_conv_pct: float = 1.0,
    hot_turns: int = 1200,
    inject: bool = True,
    with_flags: bool = False,
) -> DataFrame:
    """Distributed deterministic transcripts generator."""
    s = F.lit(seed)
    conv = spark.range(n_convs).select(
        F.col("id").alias("cn"),
        F.format_string("conv_%06d", F.col("id")).alias("conv_id"),
    )
    hot = F.pmod(_h(F.col("cn"), s, F.lit("hot")), F.lit(int(100 / hot_conv_pct))) == 0
    n_turns = F.when(
        hot, F.lit(hot_turns) + F.pmod(_h(F.col("cn"), s, F.lit("ht")), F.lit(400))
    ).otherwise(F.lit(2) + F.pmod(_h(F.col("cn"), s, F.lit("nt")), F.lit(39)))
    conv = conv.select("cn", "conv_id", n_turns.alias("n_turns"))

    t = conv.select(
        "cn",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    rh = _h(F.col("cn"), F.col("turn_idx"), s)  # per-row hash

    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (F.pmod(rh, F.lit(4)) + 1).cast("int")
    )
    tool = F.when(
        F.pmod(_h(rh, F.lit("tool")), F.lit(5)) == 0, F.lit(None).cast("string")
    ).otherwise(
        F.element_at(
            F.array(*[F.lit(x) for x in TOOLS]),
            (F.pmod(_h(rh, F.lit("tv")), F.lit(4)) + 1).cast("int"),
        )
    )
    # pseudo-sentence, 1..2000 chars, built from a repeated word pool
    base_text = F.lit(" ".join(WORDS * 40))
    text = F.substring(
        base_text, 1, (F.pmod(_h(rh, F.lit("len")), F.lit(2000)) + 1).cast("int")
    )
    ts = F.timestamp_seconds(
        F.lit(1735689600)  # 2025-01-01T00:00:00Z
        + F.col("cn") * 3600
        + F.col("turn_idx") * 10
    )

    if inject:
        bad_role = F.pmod(_h(rh, F.lit("i1")), F.lit(200)) == 0
        bad_tool = F.pmod(_h(rh, F.lit("i2")), F.lit(200)) == 0
        empty_text = F.pmod(_h(rh, F.lit("i3")), F.lit(200)) == 0
        neg_turn = F.pmod(_h(rh, F.lit("i4")), F.lit(200)) == 0
        old_ts = F.pmod(_h(rh, F.lit("i5")), F.lit(200)) == 0
        dup_row = F.pmod(_h(rh, F.lit("i6")), F.lit(200)) == 0

        role = F.when(bad_role, F.lit("robot")).otherwise(role)
        tool = F.when(bad_tool, F.lit("fax")).otherwise(tool)
        text = F.when(empty_text, F.lit("")).otherwise(text)
        turn_idx = F.when(neg_turn, F.lit(-1)).otherwise(F.col("turn_idx"))
        ts = F.when(old_ts, F.to_timestamp(F.lit("2019-06-01 00:00:00"))).otherwise(ts)
    else:
        bad_role = bad_tool = empty_text = neg_turn = old_ts = dup_row = F.lit(False)
        turn_idx = F.col("turn_idx")

    cols = [
        F.col("conv_id"),
        turn_idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    ]
    if with_flags:
        cols += [
            bad_role.alias("_inj_role"),
            bad_tool.alias("_inj_tool"),
            empty_text.alias("_inj_text"),
            neg_turn.alias("_inj_turn"),
            old_ts.alias("_inj_ts"),
            dup_row.alias("_inj_dup"),
        ]
    out = t.select(*cols)
    if inject:
        dups = t.select(*cols).filter(dup_row)
        out = out.unionByName(dups)
    return out


FLAGSHIP_CONTRACT_YAML = """
contract_version: "1.0"
domain: transcripts
description: Flagship multi-turn transcript contract (FIXTURES.md T1)
schema:
  conv_id:
    type: string
    required: true
    pattern: "^conv_\\\\d+$"
  turn_idx:
    type: integer
    required: true
    min: 0
  role:
    type: string
    required: true
    enum: [system, user, assistant, tool]
  text:
    type: string
    required: true
    min_length: 1
    max_length: 10000
  tool:
    type: string
    required: false
  ts:
    type: timestamp
    required: true
    min: "2020-01-01"
quality_rules:
  uniqueness:
    fields:
      - [conv_id, turn_idx]
  completeness:
    min_row_count: 1
    max_null_percentage: 25
  statistics:
    turn_idx:
      mean: {min: 0}
      std_dev: {max: 100000}
  freshness:
    max_latency_hours: 1000000
  referential:
    tool:
      values: [search, browser, python, sql]
    role:
      values: [system, user, assistant, tool]
  drift:
    text_len:
      expr: "length(text)"
      metric: psi
      threshold: 0.2
      bins: 10
    turn_idx_d:
      expr: "turn_idx"
      metric: psi
      threshold: 0.25
      bins: 10
"""

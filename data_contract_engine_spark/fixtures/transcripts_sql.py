"""events → transcripts derivation as ONE SQL text both Spark and DuckDB run.

The driver's correctness gate (CORRECTNESS_r{N}.json) compares each Spark
query against a DuckDB oracle over the same parquet tables, so the
flagship transcripts table is derived from the provided ``events`` table
with portable ANSI SQL: deterministic, pure function of (event_id,
user_id, ts, props), with violation injections keyed on event_id moduli
(disjoint primes, ~0.4-0.5%% each):

  * role  'robot'            when event_id % 211 = 0
  * tool  'fax'              when event_id % 223 = 1
  * empty text               when event_id % 227 = 2
  * turn_idx -1              when event_id % 229 = 3
  * ts 2019-06-01 (< 2020)   when event_id % 233 = 4
  * duplicated (conv_id, turn_idx) row when event_id % 239 = 5
"""

# Portable SQL (Spark + DuckDB): defines relation `transcripts` given a
# relation/view named `events(event_id, ts, user_id, event_type, value, props)`.
TRANSCRIPTS_FROM_EVENTS_SQL = """
WITH base AS (
  SELECT
    concat('conv_', lpad(cast(user_id AS string), 6, '0')) AS conv_id,
    cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS int)
      AS base_turn_idx,
    event_id,
    ts AS base_ts,
    props
  FROM events
),
shaped AS (
  SELECT
    conv_id,
    cast(CASE WHEN event_id % 229 = 3 THEN -1 ELSE base_turn_idx END AS int)
      AS turn_idx,
    CASE WHEN event_id % 211 = 0 THEN 'robot'
         ELSE CASE cast(event_id % 4 AS int)
                WHEN 0 THEN 'system' WHEN 1 THEN 'user'
                WHEN 2 THEN 'assistant' ELSE 'tool' END
    END AS role,
    CASE WHEN event_id % 227 = 2 THEN ''
         ELSE concat('turn text ', cast(event_id AS string), ' ', props)
    END AS text,
    CASE WHEN event_id % 223 = 1 THEN 'fax'
         ELSE CASE cast(event_id % 5 AS int)
                WHEN 0 THEN 'search' WHEN 1 THEN 'browser'
                WHEN 2 THEN 'python' WHEN 3 THEN 'sql'
                ELSE NULL END
    END AS tool,
    CASE WHEN event_id % 233 = 4 THEN timestamp '2019-06-01 00:00:00'
         ELSE base_ts END AS ts,
    event_id
  FROM base
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM shaped
UNION ALL
SELECT conv_id, turn_idx, role, text, tool, ts FROM shaped WHERE event_id % 239 = 5
"""


def transcripts_cte(events_relation: str = "events") -> str:
    """The derivation wrapped as a CTE body usable as
    ``WITH transcripts AS (<this>) SELECT ...``."""
    return TRANSCRIPTS_FROM_EVENTS_SQL.replace("FROM events", f"FROM {events_relation}")


def spark_transcripts_from_events(spark, events_df):
    """Run the shared derivation in Spark over an events DataFrame."""
    events_df.createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_FROM_EVENTS_SQL)

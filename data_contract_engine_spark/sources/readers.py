"""File sources: CSV / JSON / JSONL readers + dispatch (SURVEY.md §2.1).

Replaces the reference's pandas chunk iterators
(`app/core/file_handlers.py:27-158`) with native Spark readers:

  * CSV (S1): ``mode=PERMISSIVE`` keeps bad lines as null-rows instead of
    erroring (analog of ``on_bad_lines="warn"``); column names are
    trimmed like the reference's ``str.strip()``; values stay strings so
    the contract compiler's try_cast path reports TYPE_MISMATCH exactly
    like the dynamic-typed reference;
  * JSON (S2): ``multiLine=true`` whole-document parse; a top-level
    ``{"data": [...]}`` envelope is unwrapped; a single top-level object
    becomes a 1-row frame;
  * JSONL (S3): line mode; invalid lines land in
    ``_corrupt_record`` and are dropped with a counted warning (the
    reference logs-and-skips);
  * dispatch (S5): extension- or explicit-format based.

The production source is a table catalog scan
(``spark.read.format("iceberg").load``) — file ingestion is the
compatibility path for the reference's upload pipeline.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

log = logging.getLogger(__name__)

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    df = (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .option("inferSchema", infer_schema)
        .csv(path)
    )
    renames = {c: c.strip() for c in df.columns if c != c.strip()}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df


def read_json(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.option("multiLine", True).json(path)
    # unwrap {"data": [...]} envelope (file_handlers.py:81-93 analog)
    if df.columns == ["data"]:
        dtype = dict(df.dtypes)["data"]
        if dtype.startswith("array"):
            df = df.select(F.explode("data").alias("r")).select("r.*")
    return df


def read_jsonl(
    spark: SparkSession, path: str, drop_corrupt: bool = True
) -> Tuple[DataFrame, int]:
    """(frame, n_corrupt). Invalid JSON lines are counted then dropped
    (parity: reference skips them with a warning)."""
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    n_corrupt = 0
    if CORRUPT_COL in df.columns:
        # the eager count scans a narrow projection — no whole-input
        # cache (round-3 finding: the old ``cache()`` here would try to
        # pin a 100 TB JSONL corpus and never released it). The returned
        # clean frame is a fresh lazy read; this cold-path file reader
        # tolerates the second scan — the hot ingest path is the
        # parquet/Iceberg table. Callers that cannot afford two scans
        # should attach ``df.observe(...)`` on the corrupt marker and
        # read the metric after their own action. One real data column
        # rides the projection because Spark refuses plans whose only
        # referenced column is the internal corrupt-record column.
        data_cols = [c for c in df.columns if c != CORRUPT_COL]
        if data_cols:
            # the aggregate ALSO counts a real data column: Spark refuses
            # plans whose only referenced source column is the internal
            # corrupt-record column, and a merely-projected data column
            # would be pruned away by Catalyst — counting it keeps it
            # genuinely referenced (one scan, two counters)
            n_corrupt = int(
                df.agg(
                    F.count(
                        F.when(F.col(CORRUPT_COL).isNotNull(), 1)
                    ).alias("nc"),
                    F.count(F.col(data_cols[0])).alias("__force_parse"),
                ).collect()[0]["nc"]
            )
        else:
            # every line failed to parse: the inferred schema has ONLY
            # the corrupt column, which Spark refuses to query — count
            # non-blank text lines instead (all of them are corrupt)
            n_corrupt = (
                spark.read.text(path)
                .filter(F.trim(F.col("value")) != "")
                .count()
            )
        if n_corrupt:
            log.warning("read_jsonl: skipped %d invalid lines in %s",
                        n_corrupt, path)
        # the clean frame is a fresh read with the corrupt column pruned
        # from the schema entirely: filtering the PERMISSIVE frame on the
        # corrupt marker would re-trip Spark's only-corrupt-column
        # restriction the moment a caller's query prunes every data
        # column (e.g. ``count()``). DROPMALFORMED skips invalid lines
        # natively; with ``drop_corrupt=False`` PERMISSIVE keeps them as
        # null-field rows (same rows the old ``.drop(CORRUPT_COL)`` kept).
        clean_schema = StructType(
            [f for f in df.schema.fields if f.name != CORRUPT_COL]
        )
        df = (
            spark.read.schema(clean_schema)
            .option("mode", "DROPMALFORMED" if drop_corrupt else "PERMISSIVE")
            .json(path)
        )
    return df, n_corrupt


_EXT_FORMATS = {
    "csv": "csv",
    "json": "json",
    "jsonl": "jsonl",
    "ndjson": "jsonl",
    "parquet": "parquet",
}

SAMPLE_CSV_ROWS = 5     # reference file_handlers.py:68-73
SAMPLE_JSONL_LINES = 10  # reference file_handlers.py:131-141
JSON_FULL_PARSE_MAX_BYTES = 8 * 1024 * 1024


def validate_format(path: str, file_format: Optional[str] = None) -> bool:
    """Sample-based format validation (S4 parity: reference
    `app/core/file_handlers.py:68-73,95-101,131-141`): parse the first
    5 rows / 10 lines driver-side BEFORE committing to a distributed
    read, so a mislabeled file fails at submit time instead of minutes
    into the scan. Applies to local files only — directories and remote
    URIs return True and rely on the readers' PERMISSIVE / corrupt-record
    handling.

    Positional asymmetry (reference parity): a corrupt line INSIDE the
    sample window fails validation even though the PERMISSIVE reader
    would have counted-and-dropped it, while one past the window is
    handled by the reader — the reference's sample check behaves the same
    way (`file_handlers.py:131-141`). Pass ``validate=False`` to
    ``read_source`` (or call ``read_jsonl`` directly) when corrupt lines
    are expected input rather than a mislabeled file.

    Verdicts are memoized per (path, format, size, mtime): repeated reads
    of the same unchanged file — notably the ≤8MB whole-document JSON
    parse — validate once, not once per read."""
    import json
    import os

    if not os.path.isfile(path):
        return True
    st = os.stat(path)
    cache_key = (path, file_format, st.st_size, st.st_mtime_ns)
    hit = _VALIDATE_CACHE.get(cache_key)
    if hit is not None:
        return hit
    fmt = _EXT_FORMATS.get((file_format or path.rsplit(".", 1)[-1]).lower())
    res = _validate_format_uncached(path, fmt)
    if len(_VALIDATE_CACHE) >= _VALIDATE_CACHE_MAX:
        _VALIDATE_CACHE.clear()
    _VALIDATE_CACHE[cache_key] = res
    return res


_VALIDATE_CACHE: dict = {}
_VALIDATE_CACHE_MAX = 4096


def _validate_format_uncached(path: str, fmt: Optional[str]) -> bool:
    import json
    import os

    try:
        if fmt == "csv":
            import pandas as pd

            pd.read_csv(path, nrows=SAMPLE_CSV_ROWS)
        elif fmt == "json":
            # whole-document format: fully parse only small files (the
            # reference loads the whole file, but that is exactly the
            # driver-side cost this check exists to avoid); large files
            # get a structural sniff of the first non-space byte and rely
            # on Spark's own parse for the rest
            if os.path.getsize(path) <= JSON_FULL_PARSE_MAX_BYTES:
                with open(path, "r", encoding="utf-8") as f:
                    data = json.load(f)
                if not isinstance(data, (dict, list)):
                    return False
            else:
                with open(path, "r", encoding="utf-8") as f:
                    head = f.read(4096).lstrip()
                if not head or head[0] not in "{[":
                    return False
        elif fmt == "jsonl":
            with open(path, "r", encoding="utf-8") as f:
                for i, line in enumerate(f):
                    if i >= SAMPLE_JSONL_LINES:
                        break
                    if line.strip():
                        json.loads(line)
        elif fmt == "parquet":
            with open(path, "rb") as f:
                if f.read(4) != b"PAR1":
                    return False
        return True
    except Exception:
        return False


def read_source(
    spark: SparkSession,
    path: str,
    file_format: Optional[str] = None,
    validate: bool = True,
) -> DataFrame:
    """Handler dispatch (S5): explicit format wins, else file extension.
    ``validate`` runs the cheap :func:`validate_format` sample parse first
    (reference parity — the upload pipeline validates before ingesting);
    verdicts are memoized per (path, size, mtime) so re-reading an
    unchanged file never re-parses driver-side. Pass ``validate=False``
    to skip entirely (e.g. corrupt-tolerant JSONL ingestion)."""
    fmt = (file_format or path.rsplit(".", 1)[-1]).lower()
    fmt = _EXT_FORMATS.get(fmt)
    if validate and fmt and not validate_format(path, fmt):
        raise ValueError(
            f"{path!r} does not parse as {fmt} (sample validation failed)"
        )
    if fmt == "csv":
        return read_csv(spark, path)
    if fmt == "json":
        return read_json(spark, path)
    if fmt == "jsonl":
        return read_jsonl(spark, path)[0]
    if fmt == "parquet":
        return spark.read.parquet(path)
    raise ValueError(f"unsupported file format for {path!r}: {file_format}")

"""Pluggable table-catalog seam — the Iceberg integration boundary.

The north rule stores transcripts, violations, checkpoints and metrics in
Iceberg tables. This sandbox has no iceberg-spark-runtime jars (and no
network to fetch them), so every storage operation the engine needs goes
through one small ``TableCatalog`` interface with two implementations:

* :class:`ParquetCatalog` — the functional emulation used throughout this
  repo: append/overwrite writes, read-union-rewrite MERGE
  (`sinks.merge_upsert`), filter-rewrite retention DELETE. Semantics are
  the contract; performance differs (rewrites instead of metadata ops).
* :class:`IcebergCatalog` — the real thing: ``MERGE INTO``, ``DELETE
  FROM``, ``CALL <cat>.system.expire_snapshots`` issued via ``spark.sql``
  against a configured catalog. Statement *generation* is deterministic
  and unit-tested here; *execution* needs the runtime jars plus a catalog
  config such as::

      spark.sql.catalog.local = org.apache.iceberg.spark.SparkCatalog
      spark.sql.catalog.local.type = hadoop
      spark.sql.catalog.local.warehouse = /path/to/warehouse
      spark.sql.extensions =
          org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions

The contract test (`tests/test_catalog.py`) runs the SAME scenario —
checkpoint round-trip, MERGE idempotence, retention delete — against any
``TableCatalog``, so swapping parquet emulation for Iceberg cannot change
engine semantics, only the physical write path.

Reference analog: the Postgres store + scheduler retention
(`app/models/database.py:22-249`, `app/utils/scheduler.py:51-71`).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from . import sinks


class TableCatalog:
    """Minimal storage interface the engine relies on. Implementations
    must make ``merge`` idempotent on ``keys`` and ``append`` atomic per
    call — that pair is what checkpoint/resume correctness rests on."""

    def append(self, table: str, df: DataFrame) -> None:
        raise NotImplementedError

    def overwrite(self, table: str, df: DataFrame) -> None:
        raise NotImplementedError

    def read(self, table: str) -> Optional[DataFrame]:
        """DataFrame, or None if the table does not exist yet."""
        raise NotImplementedError

    def merge(self, table: str, updates: DataFrame, keys: Sequence[str]) -> None:
        """Upsert keyed by ``keys``: matching rows replaced, others
        inserted. Re-merging the same batch is a no-op (idempotent)."""
        raise NotImplementedError

    def delete_older_than(self, table: str, ts_col: str, cutoff) -> int:
        """Retention sweep: remove rows with ts_col < cutoff; returns the
        number removed (or -1 when the backend cannot count cheaply)."""
        raise NotImplementedError


class ParquetCatalog(TableCatalog):
    """Parquet-backed emulation: table name → directory under ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table.replace(".", "/"))

    def append(self, table: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self._path(table))

    def overwrite(self, table: str, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._path(table))

    def read(self, table: str) -> Optional[DataFrame]:
        try:
            return self.spark.read.parquet(self._path(table))
        except Exception:
            return None

    def merge(self, table: str, updates: DataFrame, keys: Sequence[str]) -> None:
        sinks.merge_upsert(self.spark, self._path(table), updates, keys)

    def delete_older_than(self, table: str, ts_col: str, cutoff) -> int:
        from pyspark.sql import functions as F

        if self.read(table) is None:
            return 0
        return sinks.filter_rewrite_keep(
            self.spark, self._path(table), F.col(ts_col) >= F.lit(cutoff)
        )


class IcebergCatalog(TableCatalog):
    """Iceberg-native implementation. Each operation is one metadata
    transaction — no read-union-rewrite. SQL builders are pure (tested
    without jars); execution goes through ``spark.sql``."""

    def __init__(self, spark: SparkSession, catalog: str = "local",
                 namespace: str = "dce"):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace

    def qualified(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    # -- SQL builders (pure, deterministic, unit-tested) -----------------

    def merge_sql(self, table: str, source_view: str,
                  keys: Sequence[str], columns: Sequence[str]) -> str:
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        sets = ", ".join(f"t.{c} = s.{c}" for c in columns if c not in keys)
        cols = ", ".join(columns)
        vals = ", ".join(f"s.{c}" for c in columns)
        # every column a key → nothing to update; a bare "UPDATE SET"
        # clause would be a parse error, and insert-if-absent is the
        # correct upsert semantics for a key-presence table
        matched = f"WHEN MATCHED THEN UPDATE SET {sets}\n" if sets else ""
        return (
            f"MERGE INTO {self.qualified(table)} t\n"
            f"USING {source_view} s\n"
            f"ON {on}\n"
            f"{matched}"
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
        )

    def delete_sql(self, table: str, ts_col: str, cutoff_literal: str) -> str:
        return (
            f"DELETE FROM {self.qualified(table)} "
            f"WHERE {ts_col} < TIMESTAMP '{cutoff_literal}'"
        )

    def expire_snapshots_sql(self, table: str, older_than_literal: str,
                             retain_last: int = 5) -> str:
        return (
            f"CALL {self.catalog}.system.expire_snapshots("
            f"table => '{self.namespace}.{table}', "
            f"older_than => TIMESTAMP '{older_than_literal}', "
            f"retain_last => {retain_last})"
        )

    # -- execution (requires iceberg-spark-runtime on the classpath) -----

    def append(self, table: str, df: DataFrame) -> None:
        df.writeTo(self.qualified(table)).append()

    def overwrite(self, table: str, df: DataFrame) -> None:
        df.writeTo(self.qualified(table)).createOrReplace()

    def read(self, table: str) -> Optional[DataFrame]:
        try:
            return self.spark.table(self.qualified(table))
        except Exception:
            return None

    def merge(self, table: str, updates: DataFrame, keys: Sequence[str]) -> None:
        view = f"__merge_src_{table.replace('.', '_')}"
        updates.createOrReplaceTempView(view)
        self.spark.sql(self.merge_sql(table, view, keys, updates.columns))

    def delete_older_than(self, table: str, ts_col: str, cutoff) -> int:
        self.spark.sql(
            self.delete_sql(table, ts_col, cutoff.strftime("%Y-%m-%d %H:%M:%S"))
        )
        return -1  # Iceberg DELETE is metadata-only; no cheap removed-count


def catalog_checkpoint_store(catalog: TableCatalog, table: str):
    """A :class:`~data_contract_engine_spark.checkpoint.CheckpointStore`
    backed by a catalog: completion rows land via idempotent MERGE keyed
    by (run_id, partition_key, lineage_hash) — re-running a crashed
    partition replaces its row exactly once, on ANY backend."""
    from ..checkpoint import CheckpointStore

    class _CatalogStore(CheckpointStore):
        def __init__(self):
            self.catalog = catalog
            self.table = table
            self.spark = getattr(catalog, "spark", None)

        def _read(self):
            return self.catalog.read(self.table)

        def write_done(self, rows_df: DataFrame) -> None:
            self.catalog.merge(
                self.table, rows_df,
                keys=("run_id", "partition_key", "lineage_hash"),
            )

    return _CatalogStore()

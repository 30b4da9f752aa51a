"""TableCatalog contract tests — the Iceberg seam.

One scenario, any backend: append-read round trip, MERGE idempotence,
retention delete, and a full checkpoint/resume cycle through
``catalog_checkpoint_store``. The parquet emulation runs it for real; the
Iceberg implementation's SQL generation is pinned here (execution needs
the iceberg-spark-runtime jars, absent in this sandbox — see
sources/catalog.py for the required session config).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_contract_engine_spark import ContractEngine, parse_contract_yaml
from data_contract_engine_spark.checkpoint import validate_resumable
from data_contract_engine_spark.sources.catalog import (
    IcebergCatalog,
    ParquetCatalog,
    catalog_checkpoint_store,
)

CONTRACT = """
contract_version: "1.0"
schema:
  conv_id: {type: string, required: true}
  turn_idx: {type: integer, required: true, min: 0}
"""


@pytest.fixture()
def pcat(spark, tmp_path):
    return ParquetCatalog(spark, str(tmp_path / "warehouse"))


def test_catalog_append_read_merge_contract(spark, pcat):
    df = spark.createDataFrame(
        [("r1", "a", 1), ("r1", "b", 2)], "run_id string, k string, v int"
    )
    assert pcat.read("results") is None
    pcat.append("results", df)
    assert pcat.read("results").count() == 2

    # MERGE: update one key, insert one, and re-merging is a no-op
    upd = spark.createDataFrame(
        [("r1", "b", 20), ("r1", "c", 3)], "run_id string, k string, v int"
    )
    pcat.merge("results", upd, keys=("run_id", "k"))
    pcat.merge("results", upd, keys=("run_id", "k"))  # idempotent
    got = {r["k"]: r["v"] for r in pcat.read("results").collect()}
    assert got == {"a": 1, "b": 20, "c": 3}


def test_catalog_retention_delete(spark, pcat):
    now = dt.datetime(2026, 6, 1)
    rows = [("x", now - dt.timedelta(days=d)) for d in (1, 50, 200)]
    pcat.append(
        "hist", spark.createDataFrame(rows, "k string, validated_at timestamp")
    )
    removed = pcat.delete_older_than(
        "hist", "validated_at", now - dt.timedelta(days=90)
    )
    assert removed == 1
    assert pcat.read("hist").count() == 2
    assert pcat.delete_older_than("missing", "validated_at", now) == 0


def test_checkpoint_round_trip_through_catalog(spark, pcat):
    """Resume semantics must hold on ANY backend: completion rows land via
    idempotent MERGE; a re-run of a done partition replaces its checkpoint
    row exactly once instead of duplicating it."""
    eng = ContractEngine(spark)
    contract = parse_contract_yaml(CONTRACT, name="cat-ckpt")
    store = catalog_checkpoint_store(pcat, "checkpoints")
    data = spark.createDataFrame(
        [(f"conv_{i % 3}", i) for i in range(30)],
        "conv_id string, turn_idx int",
    )

    half = data.filter(F.col("conv_id") != "conv_2")
    r1 = validate_resumable(
        eng, half, contract, store, run_id="r", partition_col="conv_id",
        key_columns=["conv_id", "turn_idx"], ts_col=None,
    )
    assert r1.validated_now == 2

    r2 = validate_resumable(
        eng, data, contract, store, run_id="r", partition_col="conv_id",
        key_columns=["conv_id", "turn_idx"], ts_col=None,
    )
    assert r2.skipped == 2 and r2.validated_now == 1

    # MERGE keyed by (run_id, partition_key, lineage_hash): exactly one
    # checkpoint row per partition even after multiple writes
    prog = store.progress("r").collect()
    assert len(prog) == 3
    assert {r["partition_key"] for r in prog} == {"conv_0", "conv_1", "conv_2"}


def test_iceberg_sql_generation_pinned(spark):
    """The Iceberg path's statements are deterministic text — pin them so
    the seam's contract survives refactors even without the runtime jars."""
    cat = IcebergCatalog(spark, catalog="local", namespace="dce")
    assert cat.qualified("checkpoints") == "local.dce.checkpoints"

    merge = cat.merge_sql(
        "checkpoints", "src",
        keys=("run_id", "partition_key"),
        columns=("run_id", "partition_key", "status"),
    )
    assert merge == (
        "MERGE INTO local.dce.checkpoints t\n"
        "USING src s\n"
        "ON t.run_id = s.run_id AND t.partition_key = s.partition_key\n"
        "WHEN MATCHED THEN UPDATE SET t.status = s.status\n"
        "WHEN NOT MATCHED THEN INSERT (run_id, partition_key, status) "
        "VALUES (s.run_id, s.partition_key, s.status)"
    )
    assert cat.delete_sql("results", "validated_at", "2026-01-01 00:00:00") == (
        "DELETE FROM local.dce.results "
        "WHERE validated_at < TIMESTAMP '2026-01-01 00:00:00'"
    )
    assert cat.expire_snapshots_sql("results", "2026-01-01 00:00:00") == (
        "CALL local.system.expire_snapshots(table => 'dce.results', "
        "older_than => TIMESTAMP '2026-01-01 00:00:00', retain_last => 5)"
    )


def test_iceberg_merge_sql_key_only_table(spark):
    """All columns are keys → no UPDATE SET clause (a bare one is a parse
    error); the upsert degenerates to insert-if-absent, matching the
    ParquetCatalog's behavior for key-presence tables."""
    cat = IcebergCatalog(spark, catalog="local", namespace="dce")
    sql = cat.merge_sql("seen", "src", keys=("k",), columns=("k",))
    assert "UPDATE SET" not in sql
    assert "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)" in sql

"""File sources (CSV/JSON/JSONL + dispatch), sinks, and Structured
Streaming validation."""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from data_contract_engine_spark import ContractEngine, parse_contract_yaml
from data_contract_engine_spark.sources import readers, sinks
from data_contract_engine_spark.streaming.validate import (
    foreach_batch_validator,
    validate_stream,
    windowed_verdicts,
)

CONTRACT = """
contract_version: "1.0"
schema:
  user_id: {type: string, required: true, pattern: "^usr_\\\\d+$"}
  age: {type: integer, required: false, min: 0, max: 120}
"""


def test_read_csv_trims_and_validates_stringly(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("user_id , age\nusr_1,30\nbad,200\nusr_3,x\n")
    df = readers.read_csv(spark, str(p))
    assert df.columns == ["user_id", "age"]  # names trimmed
    run = ContractEngine(spark).validate(
        df, parse_contract_yaml(CONTRACT, name="c"), key_columns=["user_id"]
    )
    viol = run.violations().collect()
    kinds = {(r["user_id"], r["error_type"]) for r in viol}
    # stringly CSV: pattern failure, range failure, cast failure
    assert ("bad", "PATTERN_MISMATCH") in kinds
    assert ("bad", "VALUE_TOO_LARGE") in kinds
    assert ("usr_3", "TYPE_MISMATCH") in kinds


def test_read_json_envelope(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text(json.dumps({"data": [{"a": 1}, {"a": 2}]}))
    df = readers.read_json(spark, str(p))
    assert df.count() == 2 and df.columns == ["a"]
    p2 = tmp_path / "single.json"
    p2.write_text(json.dumps({"a": 7}))
    assert readers.read_json(spark, str(p2)).count() == 1


def test_read_jsonl_skips_corrupt(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"a": 1}\nnot json\n{"a": 3}\n')
    df, n_corrupt = readers.read_jsonl(spark, str(p))
    assert n_corrupt == 1
    assert sorted(r["a"] for r in df.collect()) == [1, 3]


def test_dispatch(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a\n1\n")
    assert readers.read_source(spark, str(p)).count() == 1
    with pytest.raises(ValueError):
        readers.read_source(spark, "file.xml")


def test_sinks_roundtrip_and_retention(spark, tmp_path):
    now = dt.datetime(2025, 6, 1)
    rows = [
        ("c1", now - dt.timedelta(days=200), 1.0),
        ("c1", now - dt.timedelta(days=10), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "contract_id string, validated_at timestamp, v double"
    )
    path = str(tmp_path / "results")
    sinks.append_results(df, path)
    removed = sinks.expire_results(spark, path, retention_days=90, now=now)
    assert removed == 1
    assert spark.read.parquet(path).count() == 1


def test_violations_partitioned_write(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "x", 1), ("b", "y", 2)], "part string, field string, n int"
    )
    path = str(tmp_path / "viol")
    sinks.write_violations(df, path, ["part"])
    back = spark.read.parquet(path)
    assert back.count() == 2 and "part" in back.columns


def test_streaming_validation_available_now(spark, tmp_path):
    # file-source stream over parquet, validated with the SAME compiled rules
    src = tmp_path / "stream_in"
    base = dt.datetime(2025, 1, 1)
    rows = [
        ("usr_1", 10, base),
        ("bad", 20, base + dt.timedelta(seconds=30)),
        ("usr_3", 500, base + dt.timedelta(seconds=90)),
    ]
    batch = spark.createDataFrame(
        rows, "user_id string, age int, ts timestamp"
    )
    batch.write.parquet(str(src))

    contract = parse_contract_yaml(
        CONTRACT + "  ts: {type: timestamp, required: true}\n", name="s"
    )
    stream = (
        spark.readStream.schema(batch.schema).parquet(str(src))
    )
    validated = validate_stream(stream, contract, ts_col="ts")
    q = (
        validated.writeStream.format("memory")
        .queryName("validated_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("select * from validated_stream").collect()
    got = {r["user_id"]: r["passed"] for r in out}
    assert got == {"usr_1": True, "bad": False, "usr_3": False}

    # windowed verdicts over the validated stream
    validated2 = validate_stream(stream, contract, ts_col="ts")
    wv = windowed_verdicts(validated2, ts_col="ts", window="1 minute")
    # complete mode: a single availableNow micro-batch never advances the
    # watermark past the last window, so append would emit nothing
    q2 = (
        wv.writeStream.format("memory")
        .queryName("verdict_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    vrows = spark.sql(
        "select * from verdict_stream order by window_start"
    ).collect()
    assert [r["verdict"] for r in vrows] == ["FAIL", "FAIL"]
    assert [r["total"] for r in vrows] == [2, 1]


def test_foreach_batch_runs_full_engine(spark, tmp_path):
    src = tmp_path / "fb_in"
    spark.createDataFrame(
        [("usr_1", 10), ("bad", 20)], "user_id string, age int"
    ).write.parquet(str(src))
    contract = parse_contract_yaml(CONTRACT, name="fb")
    eng = ContractEngine(spark)
    seen = {}

    def on_batch(batch_id, run):
        rep = run.report()
        seen["total"] = rep.total_records
        seen["failed"] = rep.failed

    stream = spark.readStream.schema("user_id string, age int").parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_validator(eng, contract, on_batch)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert seen == {"total": 2, "failed": 1}

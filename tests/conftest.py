import pytest

from data_contract_engine_spark import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="dce-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def user_contract_yaml():
    # canonical fixture contract, parity with reference tests/conftest.py:63-95
    return """
contract_version: "1.0"
domain: users
schema:
  user_id:
    type: string
    required: true
    pattern: "^usr_\\\\d+$"
  email:
    type: string
    required: true
    format: email
  age:
    type: integer
    required: false
    min: 0
    max: 120
  timestamp:
    type: timestamp
    required: true
quality_rules:
  freshness:
    max_latency_hours: 24
  completeness:
    min_row_count: 1
    max_null_percentage: 5
"""

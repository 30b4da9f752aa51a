"""Change detection + semver bump + registry lifecycle parity
(reference: tests/test_change_detector.py, test_version_controller.py,
integration lifecycle tests)."""

import pytest

from data_contract_engine_spark import parse_contract_yaml
from data_contract_engine_spark.contracts.templates import (
    get_template,
    template_names,
)
from data_contract_engine_spark.versioning.changes import (
    ChangeReport,
    detect_changes,
    next_version,
)
from data_contract_engine_spark.versioning.registry import (
    ContractRegistry,
    DuplicateContract,
)

BASE = """
contract_version: "1.0"
schema:
  user_id: {type: string, required: true, pattern: "^usr_\\\\d+$"}
  age: {type: integer, required: false, min: 10, max: 100}
  status: {type: string, required: true, enum: [a, b, c]}
"""


def _c(yaml_text):
    return parse_contract_yaml(yaml_text, name="t")


def _types(report, breaking=True):
    src = report.breaking if breaking else report.non_breaking
    return sorted(c.change_type for c in src)


def test_no_changes():
    r = detect_changes(_c(BASE), _c(BASE))
    assert r.total == 0 and r.risk_level == "LOW"
    assert next_version("1.2.3", r) == "1.2.4"


def test_field_removed_breaking():
    new = BASE.replace('  age: {type: integer, required: false, min: 10, max: 100}\n', "")
    r = detect_changes(_c(BASE), _c(new))
    assert _types(r) == ["FIELD_REMOVED"]
    assert next_version("1.2.3", r) == "2.0.0"


def test_required_vs_optional_field_added():
    new = BASE + '  extra: {type: string, required: true}\n'
    r = detect_changes(_c(BASE), _c(new))
    assert _types(r) == ["REQUIRED_FIELD_ADDED"]
    new2 = BASE + '  extra: {type: string, required: false}\n'
    r2 = detect_changes(_c(BASE), _c(new2))
    assert not r2.breaking and _types(r2, False) == ["OPTIONAL_FIELD_ADDED"]
    assert next_version("1.2.3", r2) == "1.3.0"


def test_type_and_required_flips():
    new = BASE.replace("type: integer", "type: float")
    assert _types(detect_changes(_c(BASE), _c(new))) == ["TYPE_CHANGED"]
    new = BASE.replace("age: {type: integer, required: false", "age: {type: integer, required: true")
    assert _types(detect_changes(_c(BASE), _c(new))) == ["FIELD_MADE_REQUIRED"]
    new = BASE.replace("user_id: {type: string, required: true", "user_id: {type: string, required: false")
    r = detect_changes(_c(BASE), _c(new))
    assert _types(r, False) == ["FIELD_MADE_OPTIONAL"]


def test_pattern_strictness_heuristic():
    longer = BASE.replace("^usr_\\\\d+$", "^usr_\\\\d{5,10}$")
    r = detect_changes(_c(BASE), _c(longer))
    assert _types(r) == ["PATTERN_STRICTER"]
    r2 = detect_changes(_c(longer), _c(BASE))
    assert _types(r2, False) == ["PATTERN_RELAXED"]


def test_constraints_and_enum():
    tighter = BASE.replace("min: 10, max: 100", "min: 20, max: 100")
    assert _types(detect_changes(_c(BASE), _c(tighter))) == ["CONSTRAINT_TIGHTENED"]
    wider = BASE.replace("min: 10, max: 100", "min: 0, max: 200")
    assert _types(detect_changes(_c(BASE), _c(wider)), ) == []
    assert _types(detect_changes(_c(BASE), _c(wider)), False) == ["CONSTRAINT_RELAXED"]
    fewer = BASE.replace("enum: [a, b, c]", "enum: [a, b]")
    assert _types(detect_changes(_c(BASE), _c(fewer))) == ["ENUM_VALUES_REMOVED"]
    more = BASE.replace("enum: [a, b, c]", "enum: [a, b, c, d]")
    assert _types(detect_changes(_c(BASE), _c(more)), False) == ["ENUM_VALUES_ADDED"]


def test_risk_scoring_and_levels():
    r = ChangeReport(breaking=(), non_breaking=())
    assert r.risk_score == 0 and r.risk_level == "LOW"
    # 2 breaking + 3 soft = 39 → MEDIUM
    new = (
        BASE.replace("type: integer", "type: float")
        .replace("user_id: {type: string, required: true", "user_id: {type: string, required: false")
        .replace("enum: [a, b, c]", "enum: [a, b]")
    )
    rep = detect_changes(_c(BASE), _c(new))
    assert rep.risk_score == 15 * len(rep.breaking) + 3 * len(rep.non_breaking)
    assert "breaking change(s)" in rep.summary


def test_registry_lifecycle(tmp_path):
    path = str(tmp_path / "registry.json")
    reg = ContractRegistry(path)
    rec = reg.create("users", BASE)
    assert rec.version == "1.0.0"
    assert rec.versions[0].change_type == "INITIAL"
    with pytest.raises(DuplicateContract):
        reg.create("USERS", BASE)  # case-insensitive name match

    # minor bump
    v = reg.update(rec.contract_id, BASE + '  note: {type: string, required: false}\n')
    assert v.version == "1.1.0" and v.change_type == "NON_BREAKING"
    # major bump
    v2 = reg.update(rec.contract_id, BASE.replace("type: integer", "type: float"))
    assert v2.version == "2.0.0" and v2.change_type == "BREAKING"

    hist = reg.history(rec.contract_id)
    assert [h.version for h in hist] == ["2.0.0", "1.1.0", "1.0.0"]

    cmp_report = reg.compare(rec.contract_id, "1.0.0", "2.0.0")
    assert cmp_report.total >= 1

    # rollback: content restored, forced major bump
    back = reg.rollback(rec.contract_id, "1.0.0", reason="bad change")
    assert back.version == "3.0.0"
    assert back.yaml_content == BASE
    assert back.versions[-1].change_type == "ROLLBACK"

    # persistence round-trip
    reg2 = ContractRegistry(path)
    assert reg2.get(rec.contract_id).version == "3.0.0"

    reg2.deactivate(rec.contract_id)
    assert reg2.list() == []
    assert reg2.list(active_only=False)[0].name == "users"


def test_templates_parse():
    assert template_names() == ["ecommerce-orders", "iot-sensor", "user-events"]
    for name in template_names():
        t = get_template(name)
        c = parse_contract_yaml(t["yaml"], name=name)
        assert c.fields
    nested = parse_contract_yaml(get_template("ecommerce-orders")["yaml"], name="e")
    items = nested.fields_dict()["items"]
    assert items.items is not None and items.items.type == "object"
    assert "product_id" in items.items.properties_dict()


def test_registry_scale_10k(tmp_path):
    """Registry behavior at 10⁴ contracts (round-2 verdict item #8): bulk
    import defers persistence to ONE save, name lookup is O(1) via the
    index, and list/filter/paginate stay inside a tight latency budget.
    (At 10⁵+ the JSON store should be swapped for a catalog — documented
    on the class.)"""
    import time as _time

    from data_contract_engine_spark.versioning.registry import (
        ContractRegistry,
        DuplicateContract,
    )

    yaml_text = """
contract_version: "1.0"
domain: d{dom}
schema:
  id: {{type: string, required: true}}
"""
    path = str(tmp_path / "reg10k.json")
    reg = ContractRegistry(path)
    t0 = _time.time()
    with reg.bulk():
        for i in range(10_000):
            reg.create(f"contract_{i}", yaml_text.format(dom=i % 7))
    bulk_sec = _time.time() - t0
    assert bulk_sec < 30.0, f"bulk create too slow: {bulk_sec:.1f}s"

    t0 = _time.time()
    page = reg.list(domain="d3", offset=100, limit=50)
    assert len(page) == 50 and all(r.domain == "d3" for r in page)
    assert reg.get_by_name("CONTRACT_9999").name == "contract_9999"
    assert reg.get_by_name("no_such") is None
    assert len(reg.domains()) == 7
    query_sec = _time.time() - t0
    assert query_sec < 1.0, f"list/filter/lookup too slow: {query_sec:.2f}s"

    # duplicate check stays O(1) at scale
    import pytest as _pytest

    with _pytest.raises(DuplicateContract):
        reg.create("contract_0", yaml_text.format(dom=0))

    # reload from disk: one file, all records, index rebuilt
    reg2 = ContractRegistry(path)
    assert len(reg2.list(active_only=False, limit=20_000)) == 10_000
    assert reg2.get_by_name("contract_123") is not None

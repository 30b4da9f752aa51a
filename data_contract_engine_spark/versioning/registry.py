"""Contract registry: CRUD + version history on a JSON file store.

Replaces the reference's PostgreSQL contracts/contract_versions tables
(`app/core/contract_manager.py:29-258`, `version_controller.py:22-219`)
with a driver-side registry — contract metadata is KB-scale and belongs
next to the job config, not in the data plane. The storage file is plain
JSON so it ships with ``spark-submit --files``; swap the ``_load``/
``_save`` pair for an Iceberg/JDBC-backed catalog if shared mutation is
needed.

Semantics carried over:
  * create: duplicate-name check; initial version 1.0.0 with an INITIAL
    version row;
  * update: change detection → semver bump (BREAKING → major,
    NON_BREAKING → minor, else patch) and a version row recording the
    change report;
  * rollback: restores target version's YAML under a FORCED major bump
    with change_type ROLLBACK;
  * soft delete (active flag) vs hard delete; name lookup is
    case-insensitive (reference uses ``ilike``).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, List, Optional

from ..contracts.parser import parse_contract_yaml
from .changes import ChangeReport, change_type, detect_changes, next_version


class RegistryError(Exception):
    pass


class ContractNotFound(RegistryError):
    pass


class DuplicateContract(RegistryError):
    pass


@dataclass
class VersionRecord:
    version: str
    yaml_content: str
    change_type: str
    change_summary: Dict[str, Any]
    created_at: float
    created_by: str = "system"

    def to_dict(self):
        return self.__dict__.copy()


@dataclass
class ContractRecord:
    contract_id: str
    name: str
    domain: str
    yaml_content: str
    version: str
    active: bool = True
    created_at: float = 0.0
    updated_at: float = 0.0
    versions: List[VersionRecord] = dc_field(default_factory=list)

    def to_dict(self):
        d = self.__dict__.copy()
        d["versions"] = [v.to_dict() for v in self.versions]
        return d


class ContractRegistry:
    """Scale note (tested at 10⁴ contracts,
    tests/test_versioning.py::test_registry_scale_10k): lookups by name
    go through an in-memory index (O(1)), ``list`` is one linear pass +
    sort over metadata records, and ``bulk()`` defers the per-mutation
    JSON dump so loading N contracts costs one save, not N. The store
    stays a single JSON document by design — contract metadata is
    KB-scale; at 10⁵+ contracts swap ``_load``/``_save`` for a real
    catalog as the module docstring describes."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._by_id: Dict[str, ContractRecord] = {}
        self._by_name: Dict[str, str] = {}  # name.lower() -> contract_id
        self._defer_save = False
        if path and os.path.exists(path):
            self._load()

    # -- storage ----------------------------------------------------------

    def _load(self) -> None:
        with open(self.path) as f:
            raw = json.load(f)
        self._by_id = {}
        self._by_name = {}
        for item in raw:
            versions = [VersionRecord(**v) for v in item.pop("versions", [])]
            rec = ContractRecord(**item)
            rec.versions = versions
            self._by_id[rec.contract_id] = rec
            self._by_name[rec.name.lower()] = rec.contract_id

    def _save(self) -> None:
        if not self.path or self._defer_save:
            return
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump([r.to_dict() for r in self._by_id.values()], f, indent=1)
        os.replace(tmp, self.path)

    def bulk(self):
        """Context manager deferring persistence to exit: N mutations →
        one atomic save (bulk import at registry scale would otherwise
        rewrite the store N times)."""
        import contextlib

        @contextlib.contextmanager
        def _bulk():
            self._defer_save = True
            try:
                yield self
            finally:
                self._defer_save = False
                self._save()

        return _bulk()

    # -- CRUD -------------------------------------------------------------

    def create(
        self, name: str, yaml_content: str, created_by: str = "system"
    ) -> ContractRecord:
        if self.get_by_name(name) is not None:
            raise DuplicateContract(f"contract named '{name}' already exists")
        contract = parse_contract_yaml(yaml_content, name=name)
        now = time.time()
        rec = ContractRecord(
            contract_id=str(uuid.uuid4()),
            name=name,
            domain=contract.domain,
            yaml_content=yaml_content,
            version="1.0.0",
            created_at=now,
            updated_at=now,
            versions=[
                VersionRecord(
                    version="1.0.0",
                    yaml_content=yaml_content,
                    change_type="INITIAL",
                    change_summary={},
                    created_at=now,
                    created_by=created_by,
                )
            ],
        )
        self._by_id[rec.contract_id] = rec
        self._by_name[rec.name.lower()] = rec.contract_id
        self._save()
        return rec

    def create_from_contract(
        self, name: str, contract, created_by: str = "system"
    ) -> ContractRecord:
        """Persist a programmatically constructed Contract IR: serialized
        to YAML (the registry's storage format) so versioning, diffing and
        rollback keep working on text. Round-trip safety is the
        serializer's property-tested invariant."""
        from ..contracts.parser import serialize_contract_yaml

        return self.create(name, serialize_contract_yaml(contract), created_by)

    def get(self, contract_id: str) -> ContractRecord:
        rec = self._by_id.get(contract_id)
        if rec is None:
            raise ContractNotFound(contract_id)
        return rec

    def get_by_name(self, name: str) -> Optional[ContractRecord]:
        cid = self._by_name.get(name.lower())
        return self._by_id.get(cid) if cid is not None else None

    def list(
        self,
        domain: Optional[str] = None,
        active_only: bool = True,
        offset: int = 0,
        limit: int = 100,
    ) -> List[ContractRecord]:
        rows = [
            r
            for r in self._by_id.values()
            if (not active_only or r.active)
            and (domain is None or r.domain == domain)
        ]
        rows.sort(key=lambda r: r.created_at, reverse=True)
        return rows[offset : offset + limit]

    def domains(self) -> List[str]:
        return sorted({r.domain for r in self._by_id.values() if r.active})

    def deactivate(self, contract_id: str) -> None:
        self.get(contract_id).active = False
        self._save()

    def activate(self, contract_id: str) -> None:
        self.get(contract_id).active = True
        self._save()

    def delete(self, contract_id: str) -> None:
        rec = self.get(contract_id)
        del self._by_id[contract_id]
        self._by_name.pop(rec.name.lower(), None)
        self._save()

    # -- versioning -------------------------------------------------------

    def update(
        self, contract_id: str, new_yaml: str, created_by: str = "system"
    ) -> VersionRecord:
        rec = self.get(contract_id)
        old = parse_contract_yaml(rec.yaml_content, name=rec.name)
        new = parse_contract_yaml(new_yaml, name=rec.name)
        report = detect_changes(old, new)
        version = next_version(rec.version, report)
        vrec = VersionRecord(
            version=version,
            yaml_content=new_yaml,
            change_type=change_type(report),
            change_summary=report.to_dict(),
            created_at=time.time(),
            created_by=created_by,
        )
        rec.versions.append(vrec)
        rec.yaml_content = new_yaml
        rec.version = version
        rec.domain = new.domain
        rec.updated_at = vrec.created_at
        self._save()
        return vrec

    def history(self, contract_id: str, limit: int = 50) -> List[VersionRecord]:
        rec = self.get(contract_id)
        return sorted(rec.versions, key=lambda v: v.created_at, reverse=True)[:limit]

    def get_version(self, contract_id: str, version: str) -> VersionRecord:
        for v in self.get(contract_id).versions:
            if v.version == version:
                return v
        raise ContractNotFound(f"{contract_id}@{version}")

    def compare(
        self, contract_id: str, version_a: str, version_b: str
    ) -> ChangeReport:
        rec = self.get(contract_id)
        a = parse_contract_yaml(
            self.get_version(contract_id, version_a).yaml_content, name=rec.name
        )
        b = parse_contract_yaml(
            self.get_version(contract_id, version_b).yaml_content, name=rec.name
        )
        return detect_changes(a, b)

    def rollback(
        self,
        contract_id: str,
        target_version: str,
        created_by: str = "system",
        reason: str = "",
    ) -> ContractRecord:
        rec = self.get(contract_id)
        target = self.get_version(contract_id, target_version)
        prior = rec.version
        major = int(rec.version.split(".")[0])
        forced = f"{major + 1}.0.0"
        vrec = VersionRecord(
            version=forced,
            yaml_content=target.yaml_content,
            change_type="ROLLBACK",
            change_summary={
                "summary": f"Rolled back from v{prior} to v{target_version}",
                "rollback_info": {
                    "from_version": prior,
                    "to_version": target_version,
                    "reason": reason,
                },
            },
            created_at=time.time(),
            created_by=created_by,
        )
        rec.versions.append(vrec)
        rec.yaml_content = target.yaml_content
        rec.version = forced
        rec.updated_at = vrec.created_at
        self._save()
        return rec

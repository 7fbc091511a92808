"""Schema metadata model — the engine's catalog sidecar.

Mirrors the reference's crawler data model (SchemaMetadata / TableInfo /
ColumnInfo / FKRelationship at NLP_SQLizer/backend/app/schema/crawler.py:18-139)
with JSON round-tripping, because Spark's catalog has no FK graph, synonym
store, or per-column stats; this sidecar carries them (SURVEY.md §1.4).

``generate_schema_id`` is the same pure hash over sorted table/column
names as the reference (app/models/trainer.py:110-117): SHA-256 → first
16 hex chars, so trained artifacts key identically.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class ColumnInfo:
    """Per-column profile (crawler.py:75-113)."""

    name: str
    type_str: str
    nullable: bool = True
    is_primary_key: bool = False
    is_foreign_key: bool = False
    unique_values: list[Any] | None = None  # categorical domain, ≤100 values
    min_value: Any = None
    max_value: Any = None
    avg_value: float | None = None
    distinct_count: int | None = None
    null_count: int | None = None


@dataclass
class FKRelationship:
    """FK edge (crawler.py:116-139)."""

    from_table: str
    from_column: str
    to_table: str
    to_column: str


@dataclass
class TableInfo:
    """Per-table profile (crawler.py:41-72)."""

    name: str
    columns: list[ColumnInfo] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    foreign_keys: list[FKRelationship] = field(default_factory=list)
    sample_rows: list[dict] = field(default_factory=list)
    row_count: int = 0

    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]


@dataclass
class SchemaMetadata:
    """Whole-schema profile (crawler.py:18-38)."""

    tables: dict[str, TableInfo] = field(default_factory=dict)
    relationships: list[FKRelationship] = field(default_factory=list)
    synonyms: dict[str, list[str]] = field(default_factory=dict)

    # ---- JSON round-trip (crawler.py to_dict/from_dict parity) ----
    def to_dict(self) -> dict:
        return {
            "tables": {k: asdict(v) for k, v in self.tables.items()},
            "relationships": [asdict(r) for r in self.relationships],
            "synonyms": self.synonyms,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), default=str, indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> SchemaMetadata:
        tables = {}
        for name, t in d.get("tables", {}).items():
            cols = [ColumnInfo(**c) for c in t.get("columns", [])]
            fks = [FKRelationship(**f) for f in t.get("foreign_keys", [])]
            tables[name] = TableInfo(
                name=t.get("name", name),
                columns=cols,
                primary_key=list(t.get("primary_key", [])),
                foreign_keys=fks,
                sample_rows=list(t.get("sample_rows", [])),
                row_count=int(t.get("row_count", 0)),
            )
        rels = [FKRelationship(**r) for r in d.get("relationships", [])]
        return cls(tables=tables, relationships=rels, synonyms=dict(d.get("synonyms", {})))

    @classmethod
    def from_json(cls, s: str) -> SchemaMetadata:
        return cls.from_dict(json.loads(s))

    def schema_dict(self) -> dict[str, list[str]]:
        """{table: [column names]} — the pruned shape the NL layer consumes
        (nl2sql.py:14-21 load_schema parity)."""
        return {t: info.column_names() for t, info in self.tables.items()}


def generate_schema_id(schema: dict[str, list[str]] | SchemaMetadata) -> str:
    """Deterministic 16-hex schema id (trainer.py:110-117 parity)."""
    if isinstance(schema, SchemaMetadata):
        schema = schema.schema_dict()
    parts = []
    for t in sorted(schema):
        parts.append(t)
        parts.extend(sorted(schema[t]))
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]

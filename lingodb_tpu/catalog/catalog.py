"""Catalog: named tables with schema, keys, and statistics.

TPU-native equivalent of the reference catalog
(reference: src/catalog/Catalog.cpp, include/lingodb/catalog/Catalog.h:14-92 —
versioned serializable name->entry map persisted in the DB directory;
TableCatalogEntry with Sample + per-column distinct-count statistics,
reference: src/catalog/MetaData.h:17-57). We persist a JSON catalog plus one
Arrow IPC file per table.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from ..sql.types import IntervalUnit, K, Type
from ..storage.table import TableStorage

CATALOG_VERSION = 1


def type_to_json(t: Type) -> dict:
    return {
        "kind": t.kind.value,
        "nullable": t.nullable,
        "p": t.p,
        "s": t.s,
        "unit": t.unit.value if t.unit else None,
    }


def type_from_json(d: dict) -> Type:
    return Type(K(d["kind"]), d["nullable"], d["p"], d["s"],
                IntervalUnit(d["unit"]) if d.get("unit") else None)


@dataclass
class TableEntry:
    name: str
    column_names: list[str]
    column_types: list[Type]
    primary_key: list[str] = field(default_factory=list)
    storage: TableStorage | None = None
    stats: list[dict] = field(default_factory=list)
    stats_version: int = -1
    # hash indexes: index name -> key columns (reference: IndexCatalogEntry,
    # LingoDBHashIndex; execution uses cached key->position lookup tables)
    indexes: dict = field(default_factory=dict)

    def index_on(self, cols: list[str]) -> str | None:
        """Name of an index whose key set equals `cols`, if any."""
        want = set(c.lower() for c in cols)
        for iname, icols in self.indexes.items():
            if set(c.lower() for c in icols) == want:
                return iname
        return None

    @property
    def num_rows(self) -> int:
        return self.storage.num_rows if self.storage else 0

    def col_type(self, name: str) -> Type:
        return self.column_types[self.column_names.index(name)]

    def get_stats(self) -> list[dict]:
        if self.storage and self.stats_version != self.storage.version:
            self.stats = self.storage.column_stats()
            self.stats_version = self.storage.version
        return self.stats

    def distinct_count(self, col: str) -> int:
        st = self.get_stats()
        i = self.column_names.index(col)
        return st[i].get("distinct", max(self.num_rows, 1)) if i < len(st) else max(self.num_rows, 1)


@dataclass
class FunctionEntry:
    """User-defined function (reference: FunctionCatalogEntry; C/Python UDFs)."""

    name: str
    arg_types: list[Type]
    return_type: Type
    language: str  # "python" | "sql" | "builtin"
    body: str = ""
    fn: object = None  # compiled callable


class Catalog:
    def __init__(self, db_dir: str | None = None):
        self.db_dir = db_dir
        self.tables: dict[str, TableEntry] = {}
        self.functions: dict[str, FunctionEntry] = {}
        self.persist = bool(db_dir)
        if db_dir and os.path.exists(os.path.join(db_dir, "catalog.json")):
            self._load()

    # ---- table management ---------------------------------------------------
    def create_table(self, name, column_names, column_types, primary_key=()):
        if name in self.tables:
            raise ValueError(f"table '{name}' already exists")
        storage = TableStorage.create(name, column_names, column_types)
        entry = TableEntry(name, list(column_names), list(column_types),
                           list(primary_key), storage)
        self.tables[name] = entry
        return entry

    def drop_table(self, name):
        self.tables.pop(name, None)
        if self.persist:
            p = os.path.join(self.db_dir, f"{name}.arrow")
            if os.path.exists(p):
                os.remove(p)

    def get_table(self, name) -> TableEntry | None:
        return self.tables.get(name.lower()) or self.tables.get(name)

    def create_index(self, index_name, table_name, columns):
        entry = self.get_table(table_name)
        if entry is None:
            raise ValueError(f"table '{table_name}' does not exist")
        for c in columns:
            if c not in entry.column_names and c.lower() not in entry.column_names:
                raise ValueError(f"column '{c}' does not exist in '{table_name}'")
        entry.indexes[index_name] = list(columns)
        return entry

    def create_function(self, entry: FunctionEntry):
        self.functions[entry.name.lower()] = entry

    def get_function(self, name) -> FunctionEntry | None:
        return self.functions.get(name.lower())

    # ---- persistence ----------------------------------------------------------
    def save(self):
        if not self.persist:
            return
        os.makedirs(self.db_dir, exist_ok=True)
        meta = {"version": CATALOG_VERSION, "tables": []}
        for entry in self.tables.values():
            meta["tables"].append(
                {
                    "name": entry.name,
                    "columns": [
                        {"name": n, "type": type_to_json(t)}
                        for n, t in zip(entry.column_names, entry.column_types)
                    ],
                    "primary_key": entry.primary_key,
                    "num_rows": entry.num_rows,
                    "stats": entry.get_stats(),
                    "indexes": entry.indexes,
                }
            )
            if entry.storage:
                entry.storage.save(self.db_dir)
        with open(os.path.join(self.db_dir, "catalog.json"), "w") as f:
            json.dump(meta, f, indent=1)

    def _load(self):
        with open(os.path.join(self.db_dir, "catalog.json")) as f:
            meta = json.load(f)
        for t in meta["tables"]:
            names = [c["name"] for c in t["columns"]]
            types = [type_from_json(c["type"]) for c in t["columns"]]
            storage = TableStorage.load(t["name"], self.db_dir, names, types)
            entry = TableEntry(t["name"], names, types, t.get("primary_key", []), storage)
            entry.indexes = t.get("indexes", {})
            entry.stats = t.get("stats", [])
            entry.stats_version = storage.version
            self.tables[t["name"]] = entry


def arrow_schema_types(schema):
    """Map a pyarrow schema to (names, engine Types) (used by
    Session.add_table; reference: create_create_table_stmt in the pip pkg)."""
    import pyarrow as pa

    from ..sql.types import Type

    names, types = [], []
    for f in schema:
        t = f.type
        if pa.types.is_dictionary(t):
            t = t.value_type
        if pa.types.is_boolean(t):
            ours = Type.bool_(True)
        elif pa.types.is_int8(t) or pa.types.is_int16(t) or pa.types.is_int32(t):
            ours = Type.int_(True)
        elif pa.types.is_integer(t):
            ours = Type.bigint(True)
        elif pa.types.is_float32(t):
            ours = Type.float_(True)
        elif pa.types.is_floating(t):
            ours = Type.double(True)
        elif pa.types.is_decimal(t):
            ours = Type.decimal(t.precision, t.scale, True)
        elif pa.types.is_date(t):
            ours = Type.date(True)
        elif pa.types.is_timestamp(t):
            ours = Type.timestamp(True)
        else:
            ours = Type.string(True)
        names.append(f.name)
        types.append(ours)
    return names, types

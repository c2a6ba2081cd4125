"""Schema registry + lookup classification — the engine's metadata kernel.

Replaces the reference's live *describe* metadata
(`/root/reference/amaxa/api.py:45-70`) with a static catalog: each table
declares a primary-key column and a map of lookup (foreign-key) columns
to their target table(s) (>1 target = polymorphic). Lookup
classification by operation order mirrors
`/root/reference/amaxa/amaxa.py:177-232`:

- **self** lookup: a target is the table itself (drives the transitive
  closure),
- **descendent** lookup: every in-operation target appears *earlier*
  in the step list (child points up-list; extraction semi-joins on
  already-extracted IDs),
- **dependent** lookup: some in-operation target appears *later*
  (parent fetched afterwards via the required-ID set). A polymorphic
  lookup can be both descendent and dependent at once
  (`amaxa/amaxa.py:747-774`).

Targets outside the operation are ignored for classification.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TableMeta:
    """Static description of one table in the catalog."""

    name: str
    pk: str = "Id"
    # lookup column -> list of target table names (len>1 = polymorphic)
    lookups: dict[str, list[str]] = field(default_factory=dict)
    # optional: column -> type name ("boolean","datetime","string",...)
    # used by primitivize; unknown columns pass through
    types: dict[str, str] = field(default_factory=dict)
    # optional: 3-char key prefix for polymorphic discrimination
    key_prefix: str | None = None


@dataclass
class LookupClass:
    """Classification of one step's lookup columns."""

    self_lookups: set[str] = field(default_factory=set)
    descendent_lookups: set[str] = field(default_factory=set)
    dependent_lookups: set[str] = field(default_factory=set)

    @property
    def all_lookups(self) -> set[str]:
        return self.self_lookups | self.descendent_lookups | self.dependent_lookups


# compound / binary types excluded from field-group expansion
# (`/root/reference/amaxa/loader/extract_operation.py:96-108`,
# `loader/core.py:243-248`, docs/limits.rst)
EXCLUDED_FIELD_TYPES = {"address", "location", "base64"}


def expand_field_group(
    meta: "TableMeta", all_columns: list[str], group: str
) -> list[str]:
    """P2 — `readable` / `writeable` / `smart` field-group expansion.

    With describe-style type metadata, compound/binary columns are
    excluded; `writeable`/`smart` also drop system columns that are
    not createable (here: anything flagged type `autonumber` or
    `calculated`). Columns without type metadata are treated as plain
    writeable scalars.
    """
    if group not in ("readable", "writeable", "smart"):
        raise ValueError(f"invalid field-group {group!r}")
    out = []
    for c in all_columns:
        t = (meta.types or {}).get(c, "").lower()
        if t in EXCLUDED_FIELD_TYPES:
            continue
        if group in ("writeable", "smart") and t in ("autonumber", "calculated"):
            continue
        out.append(c)
    return out


class SchemaRegistry:
    """Catalog of TableMeta; answers classification queries."""

    def __init__(self, tables: list[TableMeta]):
        self.tables = {t.name: t for t in tables}
        self.prefix_map = {
            t.key_prefix: t.name for t in tables if t.key_prefix is not None
        }

    def __getitem__(self, name: str) -> TableMeta:
        return self.tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self.tables

    def classify_lookups(self, step_order: list[str]) -> dict[str, LookupClass]:
        """Classify every lookup of every step by list position.

        Mirrors `/root/reference/amaxa/amaxa.py:177-232`: for each
        lookup field of step *i*, targets that are the step itself →
        self; targets all at positions < i → descendent; any target at
        positions > i (or the same table appearing later) → dependent.
        """
        in_op = {name: idx for idx, name in enumerate(step_order)}
        out: dict[str, LookupClass] = {}
        for idx, name in enumerate(step_order):
            meta = self.tables[name]
            cls = LookupClass()
            for col, targets in meta.lookups.items():
                tgt_in_op = [t for t in targets if t in in_op]
                if not tgt_in_op:
                    continue  # all targets outside the operation: ignored
                if name in tgt_in_op:
                    cls.self_lookups.add(col)
                others = [t for t in tgt_in_op if t != name]
                if others:
                    if all(in_op[t] < idx for t in others):
                        cls.descendent_lookups.add(col)
                    if any(in_op[t] > idx for t in others):
                        cls.dependent_lookups.add(col)
                    # targets strictly earlier AND strictly later both
                    # present → both classes (polymorphic case)
                    if any(in_op[t] < idx for t in others) and any(
                        in_op[t] > idx for t in others
                    ):
                        cls.descendent_lookups.add(col)
            out[name] = cls
        return out

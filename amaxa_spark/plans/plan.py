"""Logical plan objects for extract / load operations.

The reference's IR is its `Operation`/`Step` object graph (SURVEY §3.1
step 4; `/root/reference/amaxa/amaxa.py:116-147,164-232`) — there is no
separate logical/physical split because execution is literal. Here the
plan objects are declarative descriptions only; the operators in
`amaxa_spark.operators` compile them to DataFrame DAGs and let
Catalyst pick the physical strategy.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class ExtractScope(enum.Enum):
    """Record-selection rule per step — exactly one per entry
    (`/root/reference/amaxa/loader/schemas.py:412-435`)."""

    ALL_RECORDS = "all"
    QUERY = "query"
    SELECTED_IDS = "ids"
    DESCENDENTS = "descendents"


class SelfLookupBehavior(enum.Enum):
    """`trace-all` walks the full hierarchy closure; `trace-none`
    leaves self-lookups as plain columns
    (`/root/reference/docs/references.rst`)."""

    TRACE_ALL = "trace-all"
    TRACE_NONE = "trace-none"


class OutsideLookupBehavior(enum.Enum):
    """What to do with FK values pointing outside the extracted set
    (`/root/reference/amaxa/amaxa.py:776-800`)."""

    INCLUDE = "include"
    DROP_FIELD = "drop-field"
    ERROR = "error"


def bad_lookup_behavior_error(value: str, table: str, field: str) -> str:
    """Byte-mirror of the reference's lookup-behavior validity error
    (`/root/reference/amaxa/loader/core.py:283-289`): emitted when a
    behavior name is configured on a lookup of the wrong type — a
    self-lookup behavior (trace-all/trace-none) on a dependent lookup,
    or an outside-lookup behavior (include/drop-field/error) on a
    self lookup."""
    return (
        "Lookup behavior '{}' specified for field {}."
        "{} is not valid for this lookup type.".format(value, table, field)
    )


@dataclass
class ExtractStepPlan:
    table: str
    scope: ExtractScope
    fields: list[str] | None = None  # None = all columns
    field_group: str | None = None  # readable | writeable | smart (P2)
    exclude_fields: list[str] = field(default_factory=list)  # P3
    where: str | None = None  # SQL predicate text (scope=QUERY)
    ids: list | None = None  # explicit PK values (scope=SELECTED_IDS)
    self_lookup_behavior: SelfLookupBehavior = SelfLookupBehavior.TRACE_ALL
    # per-field overrides (`/root/reference/amaxa/amaxa.py:638-646`):
    # a trace-none field skips UPWARD dependency registration only —
    # the downward children pass still covers every self-lookup
    self_lookup_overrides: dict[str, SelfLookupBehavior] = field(
        default_factory=dict
    )
    # per-lookup-column outside behavior; "*" = default for all
    outside_lookup_behavior: dict[str, OutsideLookupBehavior] = field(
        default_factory=dict
    )
    # column rename map field->column applied at the sink (F6)
    column_map: dict[str, str] = field(default_factory=dict)
    # transform names (with options) applied per field at the sink
    transforms: dict[str, list] = field(default_factory=dict)
    # step-level `options` — advisory API-tuning knobs
    # (`/root/reference/amaxa/loader/schemas.py:72-114`)
    options: dict = field(default_factory=dict)

    def outside_behavior_for(self, col: str) -> OutsideLookupBehavior:
        return self.outside_lookup_behavior.get(
            col,
            self.outside_lookup_behavior.get("*", OutsideLookupBehavior.INCLUDE),
        )

    def self_behavior_for(self, col: str) -> SelfLookupBehavior:
        return self.self_lookup_overrides.get(col, self.self_lookup_behavior)


@dataclass
class LoadStepPlan:
    table: str
    input_path: str | None = None  # `file:` CSV input; None = catalog table
    # `result-file:` per-step result sink path; None = CLI default
    # (`/root/reference/amaxa/loader/schemas.py:285-293`)
    result_path: str | None = None
    # step-level `options` — advisory API-tuning knobs mapped to Spark
    # equivalents (`/root/reference/amaxa/loader/schemas.py:72-93`)
    options: dict = field(default_factory=dict)
    fields: list[str] | None = None
    field_group: str | None = None  # readable | writeable | smart (P2)
    exclude_fields: list[str] = field(default_factory=list)  # P3
    column_map: dict[str, str] = field(default_factory=dict)  # column->field
    transforms: dict[str, list] = field(default_factory=dict)
    outside_lookup_behavior: dict[str, OutsideLookupBehavior] = field(
        default_factory=dict
    )
    # input-validation: none | default | strict
    # (`/root/reference/amaxa/loader/load_operation.py:151-208`)
    input_validation: str = "default"

    def outside_behavior_for(self, col: str) -> OutsideLookupBehavior:
        return self.outside_lookup_behavior.get(
            col,
            self.outside_lookup_behavior.get("*", OutsideLookupBehavior.INCLUDE),
        )

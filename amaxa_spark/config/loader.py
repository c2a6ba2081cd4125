"""YAML/JSON operation definitions → plan objects.

Keeps the reference's declarative surface (SURVEY §1.3;
`/root/reference/docs/operations.rst`): an operation is an ordered
list of table entries with field scope, record-selection rule, lookup
behaviors, column renames, and transforms. Loading follows the
reference's staged pipeline (`loader/core.py:56-70`): parse →
schema-validate → build plan objects; field-existence validation
happens in the operators against the live DataFrame schema.
"""

from __future__ import annotations

import importlib
import importlib.util
import json
import os

import yaml

from amaxa_spark.config.schema import validate_operation
from amaxa_spark.plans.plan import (
    ExtractScope,
    ExtractStepPlan,
    LoadStepPlan,
    OutsideLookupBehavior,
    SelfLookupBehavior,
)


class ConfigError(ValueError):
    def __init__(self, errors: list[str]):
        super().__init__("; ".join(errors))
        self.errors = errors


def _read(path_or_dict) -> dict:
    if isinstance(path_or_dict, dict):
        return path_or_dict
    ext = os.path.splitext(path_or_dict)[1].lower()
    with open(path_or_dict) as f:
        if ext == ".json":
            return json.load(f)
        return yaml.safe_load(f)


def load_plugin_modules(doc: dict) -> list[str]:
    """F11 — the reference's `plugin-modules` hook
    (`/root/reference/amaxa/loader/schemas.py:37-43,377-380`): each
    named module (dotted name or file path) is imported; modules
    register transforms by calling
    ``amaxa_spark.functions.transforms.register_transform`` at import
    time (the Spark analogue of TransformProvider subclassing).

    A module that fails to import is a VALIDATION error, not a crash
    (the reference routes it through `_validate_import_module`,
    schemas.py:37-43): returns the collected error strings, byte-equal
    to the reference's ``Unable to import module {value}``."""
    errors: list[str] = []
    for mod in doc.get("plugin-modules", []) or []:
        try:
            if os.path.sep in mod or mod.endswith(".py"):
                spec = importlib.util.spec_from_file_location(
                    os.path.splitext(os.path.basename(mod))[0], mod
                )
                if spec is None or spec.loader is None:
                    raise ImportError(mod)
                module = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(module)
            else:
                importlib.import_module(mod)
        except (ImportError, OSError):
            errors.append(f"Unable to import module {mod}")
    return errors


def _validate_transform_specs(doc: dict, errors: list[str]) -> None:
    """Config-time transform validation (names + options; column-type
    gating happens in the operators where live schemas exist) —
    mirrors the reference's per-transform Cerberus option schemas
    (`/root/reference/amaxa/loader/schemas.py:46-68`)."""
    from amaxa_spark.functions.transforms import validate_transforms

    for i, entry in enumerate(doc.get("operation") or []):
        if not isinstance(entry, dict):
            continue
        _, _, transforms = _field_spec(entry)
        for e in validate_transforms(transforms):
            table = entry.get("sobject") or entry.get("table") or "?"
            errors.append(f"operation[{i}] ({table}): {e}")


def _field_spec(entry: dict) -> tuple[list[str] | None, dict, dict]:
    """fields list → (names, column_map, transforms)."""
    fields = entry.get("fields")
    if fields is None:
        return None, {}, {}
    names: list[str] = []
    column_map: dict[str, str] = {}
    transforms: dict[str, list] = {}
    for f in fields:
        if isinstance(f, str):
            names.append(f)
        else:
            name = f["field"]
            names.append(name)
            if f.get("column"):
                column_map[name] = f["column"]
            if f.get("transforms"):
                transforms[name] = f["transforms"]
    exclude = set(entry.get("exclude-fields", []))
    names = [n for n in names if n not in exclude]
    return names, column_map, transforms


def load_extract_config(path_or_dict) -> list[ExtractStepPlan]:
    doc = _read(path_or_dict)
    plugin_errors = load_plugin_modules(doc)
    errors = validate_operation(doc, "extract")
    errors += plugin_errors
    _validate_transform_specs(doc, errors)
    if errors:
        raise ConfigError(errors)
    steps = []
    op_options = dict(doc.get("options", {}) or {})
    for entry in doc["operation"]:
        table = entry.get("sobject") or entry.get("table")
        extract = entry["extract"]
        if "all" in extract:
            scope, where, ids = ExtractScope.ALL_RECORDS, None, None
        elif "query" in extract:
            scope, where, ids = ExtractScope.QUERY, extract["query"], None
        elif "ids" in extract:
            scope, where, ids = ExtractScope.SELECTED_IDS, None, extract["ids"]
        else:
            scope, where, ids = ExtractScope.DESCENDENTS, None, None
        names, column_map, transforms = _field_spec(entry)
        olb = {}
        slb_overrides = {}
        if entry.get("outside-lookup-behavior"):
            olb["*"] = OutsideLookupBehavior(entry["outside-lookup-behavior"])
        for f in entry.get("fields", []) or []:
            if isinstance(f, dict) and f.get("outside-lookup-behavior"):
                olb[f["field"]] = OutsideLookupBehavior(f["outside-lookup-behavior"])
            if isinstance(f, dict) and f.get("self-lookup-behavior"):
                slb_overrides[f["field"]] = SelfLookupBehavior(
                    f["self-lookup-behavior"]
                )
        steps.append(
            ExtractStepPlan(
                table=table,
                scope=scope,
                fields=names,
                field_group=entry.get("field-group"),
                exclude_fields=list(entry.get("exclude-fields", [])),
                where=where,
                ids=ids,
                self_lookup_behavior=SelfLookupBehavior(
                    entry.get("self-lookup-behavior", "trace-all")
                ),
                self_lookup_overrides=slb_overrides,
                outside_lookup_behavior=olb,
                column_map=column_map,
                transforms=transforms,
                # operation-level options are step defaults
                # (`loader/schemas.py:96-114`)
                options={**op_options, **dict(entry.get("options", {}) or {})},
            )
        )
    return steps


_CHECK_KINDS = {
    "completeness", "uniqueness", "min", "max", "mean",
    "match_rate", "in_set_rate",
}


def load_quality_config(path_or_dict) -> list[tuple[str, list]]:
    """Parse a declarative data-quality spec into per-table Rule
    lists (the ``check`` CLI mode). Shape:

        version: 1
        checks:
          - table: customer
            rules:
              - {name: pk_complete, column: c_custkey,
                 check: completeness, min: 1.0}
              - {name: lang_iso2, column: lang, check: match_rate,
                 pattern: '^[a-z]{2}$', min: 0.99}

    ``min``/``max`` bound the metric for the verdict; ``pattern``
    feeds match_rate, ``values`` feeds in_set_rate. All validation
    errors are collected and raised together (reference error-list
    style, `amaxa/loader/core.py:199-248`).
    """
    from amaxa_spark.operators.quality import Rule

    doc = _read(path_or_dict)
    errors: list[str] = []
    entries = doc.get("checks")
    if not isinstance(entries, list) or not entries:
        raise ConfigError(["checks: a non-empty list is required"])
    out: list[tuple[str, list]] = []
    for i, entry in enumerate(entries):
        ctx = f"checks[{i}]"
        table = entry.get("table") or entry.get("sobject")
        if not table:
            errors.append(f"{ctx}: 'table' is required")
            continue
        rules = []
        for j, r in enumerate(entry.get("rules") or []):
            rctx = f"{ctx}.rules[{j}]"
            kind = r.get("check")
            if kind not in _CHECK_KINDS:
                errors.append(
                    f"{rctx}: unknown check {kind!r} "
                    f"(expected one of {sorted(_CHECK_KINDS)})"
                )
                continue
            if not r.get("column"):
                errors.append(f"{rctx}: 'column' is required")
                continue
            if kind == "match_rate" and not r.get("pattern"):
                errors.append(f"{rctx}: match_rate requires 'pattern'")
                continue
            if kind == "in_set_rate" and not r.get("values"):
                errors.append(f"{rctx}: in_set_rate requires 'values'")
                continue
            rules.append(
                Rule(
                    name=r.get("name", f"{table}.{r['column']}.{kind}"),
                    column=r["column"],
                    check=kind,
                    lo=r.get("min"),
                    hi=r.get("max"),
                    pattern=r.get("pattern"),
                    values=tuple(r["values"]) if r.get("values") else None,
                )
            )
        if not rules:
            errors.append(f"{ctx}: no valid rules")
        out.append((table, rules))
    if errors:
        raise ConfigError(errors)
    return out


def load_load_config(path_or_dict) -> list[LoadStepPlan]:
    doc = _read(path_or_dict)
    plugin_errors = load_plugin_modules(doc)
    errors = validate_operation(doc, "load")
    errors += plugin_errors
    _validate_transform_specs(doc, errors)
    if errors:
        raise ConfigError(errors)
    steps = []
    op_options = dict(doc.get("options", {}) or {})
    for entry in doc["operation"]:
        table = entry.get("sobject") or entry.get("table")
        names, column_map, transforms = _field_spec(entry)
        olb = {}
        if entry.get("outside-lookup-behavior"):
            olb["*"] = OutsideLookupBehavior(entry["outside-lookup-behavior"])
        for f in entry.get("fields", []) or []:
            if isinstance(f, dict) and f.get("outside-lookup-behavior"):
                olb[f["field"]] = OutsideLookupBehavior(f["outside-lookup-behavior"])
        steps.append(
            LoadStepPlan(
                table=table,
                input_path=entry.get("file"),
                result_path=entry.get("result-file"),
                options={**op_options, **dict(entry.get("options", {}) or {})},
                fields=names,
                field_group=entry.get("field-group"),
                exclude_fields=list(entry.get("exclude-fields", [])),
                # load direction: column (input) -> field
                column_map={v: k for k, v in column_map.items()},
                transforms=transforms,
                outside_lookup_behavior=olb,
                input_validation=entry.get("input-validation", "default"),
            )
        )
    return steps

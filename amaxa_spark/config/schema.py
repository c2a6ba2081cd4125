"""Lightweight declarative config validation.

The reference validates operation definitions with Cerberus schemas
(`/root/reference/amaxa/loader/schemas.py:115-502`, 6-stage pipeline
`loader/core.py:56-70`). Cerberus is not available in this
environment, so this module implements the small subset the operation
surface needs — typed keys, allowed values, mutual exclusion,
duplicate detection — returning *all* errors (not fail-fast), matching
the reference's error-list style.
"""

from __future__ import annotations

from collections import Counter

EXTRACT_SCOPES = ("all", "query", "ids", "descendents")
VALIDATION_MODES = ("none", "default", "strict")
OUTSIDE_BEHAVIORS = ("include", "drop-field", "error")
SELF_BEHAVIORS = ("trace-all", "trace-none")

# step/operation-level API-tuning `options`
# (`/root/reference/amaxa/loader/schemas.py:72-114`): accepted and
# validated, then mapped to ADVISORY Spark knobs (batch size →
# maxRecordsPerFile, Serial mode → single-partition write) — never
# silently dropped
OPTION_RULES: dict[str, tuple] = {
    # name -> (type, min, max, allowed)
    "bulk-api-batch-size": (int, 0, 10000, None),
    "bulk-api-timeout": (int, 0, None, None),
    "bulk-api-poll-interval": (int, 0, 60, None),
    "bulk-api-mode": (str, None, None, ("Serial", "Parallel")),
}


def _validate_options(options, ctx: str, errors: list[str], top: bool = False) -> None:
    if options is None:
        return
    if not isinstance(options, dict):
        _err(errors, ctx, "'options' must be a mapping")
        return
    rules = dict(OPTION_RULES)
    if top:
        rules["api-version"] = (str, None, None, None)
    for k, v in options.items():
        if k not in rules:
            _err(errors, ctx, f"unknown option {k!r}")
            continue
        typ, lo, hi, allowed = rules[k]
        if not isinstance(v, typ) or isinstance(v, bool):
            _err(errors, ctx, f"option {k!r} must be {typ.__name__}")
        elif lo is not None and v < lo or hi is not None and v > hi:
            _err(errors, ctx, f"option {k!r} out of range [{lo}, {hi}]")
        elif allowed is not None and v not in allowed:
            _err(errors, ctx, f"option {k!r} must be one of {allowed}")


def _err(errors: list[str], ctx: str, msg: str) -> None:
    errors.append(f"{ctx}: {msg}")


def validate_operation(doc: dict, kind: str) -> list[str]:
    """Validate an extract/load operation dict; returns error list."""
    errors: list[str] = []
    if not isinstance(doc, dict):
        return ["operation: must be a mapping"]
    # version handling mirrors the reference's schema stage verbatim —
    # INCLUDING the abort-on-first-stage behavior: `_validate_schema`
    # returns immediately after a version error (`loader/core.py:34-45`,
    # strings asserted by its test_Loader.py), so the error list holds
    # exactly the version string and nothing downstream of it
    if "version" not in doc:
        errors.append("No version number present in schema")
        return errors
    if doc["version"] not in (1, 2):
        errors.append(
            f"Schema version for {kind}-operation not present or unsupported"
        )
        return errors
    _validate_options(doc.get("options"), "operation", errors, top=True)
    ops = doc.get("operation")
    if not isinstance(ops, list) or not ops:
        _err(errors, "operation", "must contain a non-empty 'operation' list")
        return errors
    seen_tables: Counter = Counter()
    for i, entry in enumerate(ops):
        ctx = f"operation[{i}]"
        if not isinstance(entry, dict):
            _err(errors, ctx, "entry must be a mapping")
            continue
        table = entry.get("sobject") or entry.get("table")
        if not table:
            _err(errors, ctx, "missing 'sobject'/'table'")
            continue
        seen_tables[table] += 1
        ctx = f"operation[{i}] ({table})"

        fields = entry.get("fields")
        if fields is not None:
            if not isinstance(fields, list):
                _err(errors, ctx, "'fields' must be a list")
            else:
                names = [
                    f if isinstance(f, str) else f.get("field")
                    for f in fields
                ]
                if None in names:
                    # a dict entry without 'field' is malformed on its
                    # own — report it, and keep it out of the
                    # duplicate-name join below (None is not a name)
                    _err(errors, ctx, "field entry missing 'field' key")
                    names = [n for n in names if n is not None]
                dupes = [n for n, c in Counter(names).items() if c > 1]
                if dupes:
                    # duplicate rejection AND its error string mirror
                    # `loader/core.py:93-131` (asserted by the
                    # reference's test_OperationLoader.py:54)
                    errors.append(
                        f"{table}: One or more fields is specified "
                        f"multiple times: {', '.join(dupes)}"
                    )
                columns = [
                    f.get("column")
                    for f in fields
                    if isinstance(f, dict) and f.get("column")
                ]
                dupes = [n for n, c in Counter(columns).items() if c > 1]
                if dupes:
                    errors.append(
                        f"{table}: One or more columns is specified "
                        f"multiple times: {', '.join(dupes)}"
                    )
                for f in fields:
                    if not isinstance(f, dict):
                        continue
                    fo = f.get("outside-lookup-behavior")
                    if fo is not None and fo not in OUTSIDE_BEHAVIORS:
                        _err(
                            errors, ctx,
                            f"field {f.get('field')}: invalid "
                            f"outside-lookup-behavior {fo!r}",
                        )
                    fs = f.get("self-lookup-behavior")
                    if fs is not None and fs not in SELF_BEHAVIORS:
                        _err(
                            errors, ctx,
                            f"field {f.get('field')}: invalid "
                            f"self-lookup-behavior {fs!r}",
                        )
        fg = entry.get("field-group")
        if fg is not None and fg not in ("readable", "writeable", "smart"):
            _err(errors, ctx, f"invalid field-group {fg!r}")
        if fg is not None and fields is not None:
            _err(errors, ctx, "'fields' and 'field-group' are mutually exclusive")

        iv = entry.get("input-validation", "default")
        if iv not in VALIDATION_MODES:
            _err(errors, ctx, f"invalid input-validation {iv!r}")

        # per-step `file:` / `result-file:` sinks
        # (`loader/schemas.py:285-293`) must be path strings
        for key in ("file", "result-file"):
            val = entry.get(key)
            if val is not None and not isinstance(val, str):
                _err(errors, ctx, f"'{key}' must be a string path")

        _validate_options(entry.get("options"), ctx, errors)

        if kind == "extract":
            extract = entry.get("extract")
            if not isinstance(extract, dict):
                _err(errors, ctx, "missing 'extract' mapping")
            else:
                keys = [k for k in EXTRACT_SCOPES if k in extract]
                # exactly one scope — `loader/schemas.py:412-435`
                if len(keys) != 1:
                    _err(
                        errors,
                        ctx,
                        f"'extract' must have exactly one of {EXTRACT_SCOPES}, got {keys}",
                    )
        slb = entry.get("self-lookup-behavior")
        if slb is not None and slb not in SELF_BEHAVIORS:
            _err(errors, ctx, f"invalid self-lookup-behavior {slb!r}")
        olb = entry.get("outside-lookup-behavior")
        if olb is not None and olb not in OUTSIDE_BEHAVIORS:
            _err(errors, ctx, f"invalid outside-lookup-behavior {olb!r}")
    dupes = [t for t, c in seen_tables.items() if c > 1]
    if dupes:
        _err(errors, "operation", f"duplicate table entries {dupes}")
    return errors

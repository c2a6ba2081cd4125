"""Scalar transform registry — the engine's UDF surface (SURVEY §2.5).

The reference's ``TransformProvider`` framework
(`/root/reference/amaxa/transforms.py:11-49`) registers named scalar
transforms applied per field, composed sequentially, bidirectional
(extract and load). Here each transform is a **Column-expression
builder** — a function ``(Column, options) -> Column`` — so every
built-in transform stays JVM-side inside whole-stage codegen; a plugin
may register a Python/Pandas UDF-backed builder through the same
registry (F11), which is the sanctioned slow path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TransformBuilder = Callable[[Column, dict], Column]

TRANSFORMS: dict[str, TransformBuilder] = {}
# per-transform metadata: name -> (allowed_types, options_schema).
# allowed_types uses registry type names ("string", date", ...; the
# reference's soapType spelling "xsd:string" is normalized away);
# options_schema maps option -> {"type": py_type, "required": bool}
# mirroring the reference's Cerberus per-transform schemas
# (`/root/reference/amaxa/transforms.py:30-49,95-96,108-109`);
# None = options unvalidated (plugin default, matching the reference's
# empty get_options_schema()).
TRANSFORM_META: dict[str, tuple[list[str] | None, dict | None]] = {}


class TransformError(ValueError):
    """All validation errors at once (error-list style, matching the
    reference's `loader/schemas.py:46-68` option validation)."""

    def __init__(self, errors: list[str]):
        super().__init__("; ".join(errors))
        self.errors = errors


def register_transform(
    name: str,
    allowed_types: list[str] | None = None,
    options_schema: dict | None = None,
) -> Callable[[TransformBuilder], TransformBuilder]:
    """Decorator — the Spark analogue of TransformProvider subclass
    auto-registration (`/root/reference/amaxa/transforms.py:11-27`).
    ``allowed_types=None`` means any column type (plugin default)."""

    def deco(fn: TransformBuilder) -> TransformBuilder:
        TRANSFORMS[name] = fn
        TRANSFORM_META[name] = (allowed_types, options_schema)
        return fn

    return deco


def _norm_type(t: str) -> str:
    t = t.lower()
    return t[4:] if t.startswith("xsd:") else t


def parse_transform_entry(entry) -> tuple[str | None, dict]:
    """Normalize a transform-chain entry to ``(name, options)``.

    Accepts the v1 string form (``"strip"``), the inline form
    (``{"name": "prefix", "prefix": "x"}``), and the reference's v2
    nested form ``{"name": "prefix", "options": {"prefix": "x"}}``
    (`/root/reference/amaxa/loader/schemas.py:30-34,445-452`)."""
    if isinstance(entry, str):
        return entry, {}
    d = dict(entry)
    name = d.pop("name", None)
    if set(d) == {"options"} and isinstance(d["options"], dict):
        return name, dict(d["options"])
    return name, d


def validate_transforms(
    spec: dict[str, list],
    types: dict[str, str] | None = None,
    registry: dict[str, TransformBuilder] | None = None,
) -> list[str]:
    """Validate a per-field transform spec: unknown transform names,
    missing/unknown/badly-typed options, and `allowed_types` gating
    against the column's declared registry type. Returns ALL errors.

    Error strings are PARITY-MATCHED to the reference, byte for byte
    after the ``{col}: `` prefix (tests/test_error_parity.py cites
    each): unknown name and option-schema failures mirror
    `/root/reference/amaxa/loader/schemas.py:54-67` (the options
    message carries the failing option NAMES newline-joined — exactly
    what ``"\\n".join(validator.errors)`` produces there), and type
    gating mirrors `TransformException` at
    `/root/reference/amaxa/transforms.py:42-46` (with this engine's
    type names in place of soapTypes)."""
    registry = registry or TRANSFORMS
    errors: list[str] = []
    for col, chain in spec.items():
        for entry in chain:
            name, options = parse_transform_entry(entry)
            if name is None:
                errors.append(f"{col}: transform entry missing 'name'")
                continue
            if name not in registry:
                errors.append(
                    f"{col}: The transform {name} does not exist."
                )
                continue
            allowed, schema = TRANSFORM_META.get(name, (None, None))
            # a transform registered without an options schema accepts
            # NO options (the reference's get_options_schema() default
            # is {}, and Cerberus rejects unknown keys against it)
            schema = schema or {}
            # an ordered SET of failing option names — the reference's
            # message carries only the names ("\n".join over the
            # cerberus error dict), so names are all that's recorded
            bad_opts: dict[str, None] = {}
            for opt, rule in schema.items():
                if rule.get("required") and opt not in options:
                    bad_opts[opt] = None
                elif opt in options and not isinstance(
                    options[opt], rule.get("type", object)
                ):
                    bad_opts[opt] = None
            for opt in options:
                if opt not in schema:
                    bad_opts[opt] = None
            if bad_opts:
                joined = "\n".join(bad_opts)
                errors.append(
                    f"{col}: The options schema for transform {name} "
                    f"failed to validate: {joined}"
                )
            if allowed and types and col in types:
                if _norm_type(types[col]) not in [_norm_type(a) for a in allowed]:
                    errors.append(
                        f"{col}: Transform {name} is not available for "
                        f"fields of type {_norm_type(types[col])}."
                    )
    return errors


@register_transform("lowercase", allowed_types=["string"])
def _lowercase(col: Column, options: dict) -> Column:  # F1
    return F.lower(col)


@register_transform("uppercase", allowed_types=["string"])
def _uppercase(col: Column, options: dict) -> Column:  # F2
    return F.upper(col)


@register_transform("strip", allowed_types=["string"])
def _strip(col: Column, options: dict) -> Column:  # F3
    return F.trim(col)


@register_transform(
    "prefix",
    allowed_types=["string"],
    options_schema={"prefix": {"type": str, "required": True}},
)
def _prefix(col: Column, options: dict) -> Column:  # F4
    return F.concat(F.lit(options["prefix"]), col)


@register_transform(
    "suffix",
    allowed_types=["string"],
    options_schema={"suffix": {"type": str, "required": True}},
)
def _suffix(col: Column, options: dict) -> Column:  # F5
    return F.concat(col, F.lit(options["suffix"]))


def apply_transforms(
    df: DataFrame,
    spec: dict[str, list],
    registry: dict[str, TransformBuilder] | None = None,
    types: dict[str, str] | None = None,
) -> DataFrame:
    """Apply per-field transform chains.

    ``spec`` maps column name → list of transform entries, each a name
    string, an inline ``{"name": ..., **options}``, or the reference's
    nested ``{"name": ..., "options": {...}}`` form. Chains compose in
    order, mirroring the reference's ``functools.reduce``
    (`/root/reference/amaxa/amaxa.py:860-861`). Options and (when
    ``types`` is provided) `allowed_types` are validated up front —
    every problem reported at once, not fail-fast."""
    registry = registry or TRANSFORMS
    errors = validate_transforms(spec, types, registry)
    if errors:
        raise TransformError(errors)
    exprs = []
    for c in df.columns:
        col = F.col(c)
        for entry in spec.get(c, []):
            name, options = parse_transform_entry(entry)
            col = registry[name](col, options)
        exprs.append(col.alias(c))
    return df.select(*exprs)


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """F6 — field↔column rename map
    (`/root/reference/amaxa/amaxa.py:847-858`); direction is handled by
    the caller passing the map already oriented."""
    return df.select(*[F.col(c).alias(mapping.get(c, c)) for c in df.columns])

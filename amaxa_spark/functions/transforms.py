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


def register_transform(name: str) -> Callable[[TransformBuilder], TransformBuilder]:
    """Decorator — the Spark analogue of TransformProvider subclass
    auto-registration (`/root/reference/amaxa/transforms.py:11-27`)."""

    def deco(fn: TransformBuilder) -> TransformBuilder:
        TRANSFORMS[name] = fn
        return fn

    return deco


@register_transform("lowercase")
def _lowercase(col: Column, options: dict) -> Column:  # F1
    return F.lower(col)


@register_transform("uppercase")
def _uppercase(col: Column, options: dict) -> Column:  # F2
    return F.upper(col)


@register_transform("strip")
def _strip(col: Column, options: dict) -> Column:  # F3
    return F.trim(col)


@register_transform("prefix")
def _prefix(col: Column, options: dict) -> Column:  # F4
    return F.concat(F.lit(options["prefix"]), col)


@register_transform("suffix")
def _suffix(col: Column, options: dict) -> Column:  # F5
    return F.concat(col, F.lit(options["suffix"]))


def apply_transforms(
    df: DataFrame, spec: dict[str, list], registry: dict[str, TransformBuilder] | None = None
) -> DataFrame:
    """Apply per-field transform chains.

    ``spec`` maps column name → list of transform entries, each either a
    name string or ``{"name": ..., **options}``. Chains compose in
    order, mirroring the reference's ``functools.reduce``
    (`/root/reference/amaxa/amaxa.py:860-861`).
    """
    registry = registry or TRANSFORMS
    exprs = []
    for c in df.columns:
        col = F.col(c)
        for entry in spec.get(c, []):
            if isinstance(entry, str):
                name, options = entry, {}
            else:
                options = dict(entry)
                name = options.pop("name")
            col = registry[name](col, options)
        exprs.append(col.alias(c))
    return df.select(*exprs)


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """F6 — field↔column rename map
    (`/root/reference/amaxa/amaxa.py:847-858`); direction is handled by
    the caller passing the map already oriented."""
    return df.select(*[F.col(c).alias(mapping.get(c, c)) for c in df.columns])

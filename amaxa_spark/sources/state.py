"""Resumable-state save/restore (S9).

The reference snapshots ``{stage, id-map}`` to YAML on failure
(`/root/reference/amaxa/loader/state.py:10-32`,
`amaxa/__main__.py:117-127`). Here the ID map is already a set of
DataFrames, so state = per-table parquet id-map directories plus a
small YAML marker; resume reads them back and seeds
``LoadOperation(prior_id_map=..., start_stage=...)``, whose P7
resume-filter (anti-join) then skips mapped records.

Snapshots are atomic (SURVEY §7 hard part (d)): each save writes its
id-map tables under a fresh generation token and publishes
``state.yaml`` last via write-temp + ``os.replace`` — a crash mid-save
leaves the previous snapshot fully intact, because nothing it
references is ever overwritten. Rename-free, so the same protocol
holds on object stores.
"""

from __future__ import annotations

import os
import uuid

import yaml
from pyspark.sql import DataFrame, SparkSession


def save_state(
    state_dir: str, stage: str, id_map: dict[str, DataFrame]
) -> None:
    os.makedirs(state_dir, exist_ok=True)
    token = uuid.uuid4().hex[:12]
    tables = sorted(id_map)
    paths = {}
    for t in tables:
        rel = f"idmap_{t}-{token}.parquet"
        id_map[t].write.parquet(os.path.join(state_dir, rel))
        paths[t] = rel
    tmp = os.path.join(state_dir, f".state.yaml.{token}.tmp")
    with open(tmp, "w") as f:
        yaml.safe_dump(
            {"version": 2, "stage": stage, "token": token, "paths": paths}, f
        )
    os.replace(tmp, os.path.join(state_dir, "state.yaml"))


def load_reference_state(
    spark: SparkSession, path_or_dict
) -> tuple[str, DataFrame]:
    """Load a state snapshot SAVED BY THE REFERENCE
    (`/root/reference/amaxa/loader/state.py:10-32`: a YAML/JSON dict
    ``{"version": 1, "state": {"stage", "id-map"}}``), so a user
    migrating mid-operation can resume here. Returns
    ``(stage, DataFrame(old_id, new_id))`` with IDs normalized 15→18
    (the reference round-trips them through ``SalesforceId``).

    Validation PARITY-MATCHES the reference's loader stage byte for
    byte (each string cited in tests/test_error_parity.py):
    - ``No version number present in schema`` and
      ``Schema version for state not present or unsupported``
      (`loader/core.py:34-45`, with ``InputType.STATE.value`` =
      "state" interpolated);
    - Cerberus-shaped field errors exactly as
      ``"{}: {}".format(k, validator.errors[k])`` renders them
      (`loader/core.py:51-53` against the STATE schema,
      `loader/schemas.py:483-500`): ``state: ['required field']``,
      ``state: [{'stage': ['unallowed value X']}]``, …"""
    import json as _json

    from amaxa_spark.config.loader import ConfigError
    from amaxa_spark.ids import normalize_sfid_col

    if isinstance(path_or_dict, dict):
        doc = path_or_dict
    else:
        with open(path_or_dict) as f:
            raw = f.read()
        try:
            doc = _json.loads(raw)
        except ValueError:
            doc = yaml.safe_load(raw)
    if not isinstance(doc, dict) or "version" not in doc:
        raise ConfigError(["No version number present in schema"])
    if doc["version"] != 1:
        raise ConfigError(
            ["Schema version for state not present or unsupported"]
        )
    st = doc.get("state")
    if st is None:
        raise ConfigError(["state: ['required field']"])
    if not isinstance(st, dict):
        raise ConfigError(["state: ['must be of dict type']"])
    nested: dict[str, list[str]] = {}
    stage = st.get("stage")
    if stage is None:
        nested["stage"] = ["required field"]
    elif stage not in ("inserts", "dependents"):  # LoadStage.all_values()
        nested["stage"] = [f"unallowed value {stage}"]
    id_map = st.get("id-map")
    if id_map is None:
        nested["id-map"] = ["required field"]
    elif not isinstance(id_map, dict):
        nested["id-map"] = ["must be of dict type"]
    if nested:
        raise ConfigError([f"state: {[nested]}"])
    rows = [(str(k), str(v)) for k, v in id_map.items()]
    df = spark.createDataFrame(rows, "old_id string, new_id string")
    from pyspark.sql import functions as F

    df = df.select(
        normalize_sfid_col(F.col("old_id")).alias("old_id"),
        normalize_sfid_col(F.col("new_id")).alias("new_id"),
    )
    return stage, df


def load_state(
    spark: SparkSession, state_dir: str
) -> tuple[str, dict[str, DataFrame]]:
    with open(os.path.join(state_dir, "state.yaml")) as f:
        meta = yaml.safe_load(f)
    if meta.get("version", 1) >= 2:
        paths = meta["paths"]
    else:  # v1 snapshots: fixed per-table layout
        paths = {t: f"idmap_{t}.parquet" for t in meta["tables"]}
    id_map = {
        t: spark.read.parquet(os.path.join(state_dir, rel))
        for t, rel in paths.items()
    }
    return meta["stage"], id_map

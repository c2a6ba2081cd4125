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

"""Resumable-state save/restore (S9).

The reference snapshots ``{stage, id-map}`` to YAML on failure
(`/root/reference/amaxa/loader/state.py:10-32`,
`amaxa/__main__.py:117-127`). Here the ID map is already a set of
DataFrames, so state = per-table parquet id-map directories plus a
small YAML marker; resume reads them back and seeds
``LoadOperation(prior_id_map=..., start_stage=...)``, whose P7
resume-filter (anti-join) then skips mapped records.
"""

from __future__ import annotations

import os

import yaml
from pyspark.sql import DataFrame, SparkSession


def save_state(
    state_dir: str, stage: str, id_map: dict[str, DataFrame]
) -> None:
    os.makedirs(state_dir, exist_ok=True)
    tables = sorted(id_map)
    for t in tables:
        id_map[t].write.mode("overwrite").parquet(os.path.join(state_dir, f"idmap_{t}.parquet"))
    with open(os.path.join(state_dir, "state.yaml"), "w") as f:
        yaml.safe_dump({"version": 1, "stage": stage, "tables": tables}, f)


def load_state(
    spark: SparkSession, state_dir: str
) -> tuple[str, dict[str, DataFrame]]:
    with open(os.path.join(state_dir, "state.yaml")) as f:
        meta = yaml.safe_load(f)
    id_map = {
        t: spark.read.parquet(os.path.join(state_dir, f"idmap_{t}.parquet"))
        for t in meta["tables"]
    }
    return meta["stage"], id_map

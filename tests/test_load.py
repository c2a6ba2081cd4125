"""Load-engine semantics: two-phase insert/dependent plan, ID-map
rewrite, resume filter, transforms, primitivize — mirroring the
reference's test_LoadStep.py behavior assertions."""

import pytest
from pyspark.sql import functions as F

from amaxa_spark.metadata import SchemaRegistry, TableMeta
from amaxa_spark.operators.load import LoadOperation, synthesize_new_id
from amaxa_spark.plans.plan import LoadStepPlan, OutsideLookupBehavior


def sf_registry():
    return SchemaRegistry(
        [
            TableMeta(
                "Account",
                lookups={"ParentId": ["Account"]},
                types={"Name": "string", "IsDeleted": "boolean"},
            ),
            TableMeta("Contact", lookups={"AccountId": ["Account"]}),
        ]
    )


def new_id(table, old):
    import hashlib

    return hashlib.sha256(f"{table}:{old}".encode()).hexdigest()[:18].upper()


def test_insert_rewrites_descendent_fk(spark):
    accounts = spark.createDataFrame(
        [("A1", "HQ", None, "no"), ("A2", "Branch", "A1", "yes")],
        "Id: string, Name: string, ParentId: string, IsDeleted: string",
    )
    contacts = spark.createDataFrame(
        [("C1", "A1"), ("C2", "A2"), ("C3", None)],
        "Id: string, AccountId: string",
    )
    steps = [LoadStepPlan("Account"), LoadStepPlan("Contact")]
    res = LoadOperation(
        spark, sf_registry(), steps, {"Account": accounts, "Contact": contacts}
    ).run()

    acc = {r.Id: r for r in res.written["Account"].collect()}
    assert set(acc) == {new_id("Account", "A1"), new_id("Account", "A2")}
    # dependent phase rewires self-lookup ParentId to the NEW parent id
    a2 = acc[new_id("Account", "A2")]
    assert a2.ParentId == new_id("Account", "A1")
    # boolean primitivize applied
    assert acc[new_id("Account", "A1")].IsDeleted is False
    assert a2.IsDeleted is True

    con = {r.Id: r.AccountId for r in res.written["Contact"].collect()}
    assert con[new_id("Contact", "C1")] == new_id("Account", "A1")
    assert con[new_id("Contact", "C3")] is None


def test_id_map_contents(spark):
    accounts = spark.createDataFrame([("A1", "x")], "Id: string, Name: string")
    res = LoadOperation(
        spark, sf_registry(), [LoadStepPlan("Account")], {"Account": accounts}
    ).run()
    m = {r.old_id: r.new_id for r in res.id_map["Account"].collect()}
    assert m == {"A1": new_id("Account", "A1")}


def test_resume_skips_mapped_records(spark):
    accounts = spark.createDataFrame(
        [("A1", "x"), ("A2", "y")], "Id: string, Name: string"
    )
    prior = spark.createDataFrame(
        [("A1", "PRIOR_NEW_ID_000001")], "old_id: string, new_id: string"
    )
    res = LoadOperation(
        spark,
        sf_registry(),
        [LoadStepPlan("Account")],
        {"Account": accounts},
        prior_id_map={"Account": prior},
    ).run()
    written_ids = {r.Id for r in res.written["Account"].collect()}
    # only A2 inserted; A1 already mapped (P7)
    assert written_ids == {new_id("Account", "A2")}
    m = {r.old_id: r.new_id for r in res.id_map["Account"].collect()}
    assert m["A1"] == "PRIOR_NEW_ID_000001" and "A2" in m


def test_unmapped_fk_behaviors(spark):
    accounts = spark.createDataFrame([("A1", "x")], "Id: string, Name: string")
    contacts = spark.createDataFrame(
        [("C1", "A1"), ("C2", "MISSING")], "Id: string, AccountId: string"
    )

    def run(behavior):
        steps = [
            LoadStepPlan("Account"),
            LoadStepPlan("Contact", outside_lookup_behavior={"*": behavior}),
        ]
        return LoadOperation(
            spark, sf_registry(), steps, {"Account": accounts, "Contact": contacts}
        ).run()

    res = run(OutsideLookupBehavior.DROP_FIELD)
    con = {r.Id: r.AccountId for r in res.written["Contact"].collect()}
    assert con[new_id("Contact", "C2")] is None

    res = run(OutsideLookupBehavior.ERROR)
    assert res.errors["Contact"].count() == 1
    written = {r.Id for r in res.written["Contact"].collect()}
    assert written == {new_id("Contact", "C1")}

    res = run(OutsideLookupBehavior.INCLUDE)
    con = {r.Id: r.AccountId for r in res.written["Contact"].collect()}
    assert con[new_id("Contact", "C2")] == "MISSING"


def test_transforms_and_rename_on_load(spark):
    accounts = spark.createDataFrame(
        [("A1", "  Hello  ")], "Id: string, account_name: string"
    )
    steps = [
        LoadStepPlan(
            "Account",
            column_map={"account_name": "Name"},
            transforms={"Name": ["strip", "lowercase", {"name": "suffix", "suffix": "!"}]},
        )
    ]
    res = LoadOperation(
        spark, sf_registry(), steps, {"Account": accounts}
    ).run()
    rows = res.written["Account"].collect()
    assert rows[0].Name == "hello!"


def test_state_roundtrip(spark, tmp_path):
    from amaxa_spark.sources.state import load_state, save_state

    m = spark.createDataFrame([("a", "b")], "old_id: string, new_id: string")
    save_state(str(tmp_path / "st"), "dependents", {"Account": m})
    stage, id_map = load_state(spark, str(tmp_path / "st"))
    assert stage == "dependents"
    assert [(r.old_id, r.new_id) for r in id_map["Account"].collect()] == [("a", "b")]


def test_primitivize_failure_records_error(spark):
    accounts = spark.createDataFrame(
        [("A1", "x", "yes"), ("A2", "y", "maybe"), ("A3", "z", "")],
        "Id: string, Name: string, IsDeleted: string",
    )
    res = LoadOperation(
        spark, sf_registry(), [LoadStepPlan("Account")], {"Account": accounts}
    ).run()
    # A2's unconvertible boolean is a row-level error, not silent null
    errs = {r.old_id for r in res.errors["Account"].collect()}
    assert errs == {"A2"}
    written = {r.Id for r in res.written["Account"].collect()}
    assert written == {new_id("Account", "A1"), new_id("Account", "A3")}
    flags = {r.Id: r.IsDeleted for r in res.written["Account"].collect()}
    assert flags[new_id("Account", "A1")] is True
    assert flags[new_id("Account", "A3")] is False  # "" -> False equivalence


def test_state_save_is_atomic_and_v1_compatible(spark, tmp_path):
    """A save that dies mid-write must leave the previous snapshot
    intact (marker-last protocol); v1 fixed-layout snapshots load."""
    import os

    import yaml

    from amaxa_spark.sources.state import load_state, save_state

    st = str(tmp_path / "st")
    m1 = spark.createDataFrame([("a", "b")], "old_id: string, new_id: string")
    save_state(st, "inserts", {"Account": m1})

    # crash during the second save's table write: marker never moves
    class BoomDF:
        class write:  # noqa: N801
            def parquet(self, *_):
                raise RuntimeError("disk full")

        write = write()

    m2 = spark.createDataFrame([("c", "d")], "old_id: string, new_id: string")
    try:
        save_state(st, "dependents", {"Account": m2, "Contact": BoomDF()})
    except RuntimeError:
        pass
    stage, id_map = load_state(spark, st)
    assert stage == "inserts"
    assert [(r.old_id, r.new_id) for r in id_map["Account"].collect()] == [("a", "b")]

    # v1 snapshot layout (fixed file names, `tables` list) still loads
    v1 = str(tmp_path / "v1")
    os.makedirs(v1)
    m1.write.parquet(os.path.join(v1, "idmap_Account.parquet"))
    with open(os.path.join(v1, "state.yaml"), "w") as f:
        yaml.safe_dump({"version": 1, "stage": "dependents", "tables": ["Account"]}, f)
    stage, id_map = load_state(spark, v1)
    assert stage == "dependents" and id_map["Account"].count() == 1


def test_map_broadcast_gated_by_counted_size(spark):
    """J4 scale contract: the ID-map join carries a broadcast hint only
    when the counted map is under _BROADCAST_MAP_MAX; a huge map must
    fall through to a plain join (AQE/shuffle hash-join at scale)."""
    import amaxa_spark.operators.load as load_mod

    df = spark.createDataFrame([("C1", "A1")], "Id: string, AccountId: string")
    m = spark.createDataFrame([("A1", "N1")], "old_id: string, new_id: string")
    op = LoadOperation(
        spark, sf_registry(), [LoadStepPlan("Contact")], {"Contact": df}
    )

    def analyzed(d):
        return d._jdf.queryExecution().analyzed().toString()

    small = op._rewrite_fk(
        df, "AccountId", m, OutsideLookupBehavior.INCLUDE, [], "Id", map_rows=1
    )
    big = op._rewrite_fk(
        df, "AccountId", m, OutsideLookupBehavior.INCLUDE, [], "Id",
        map_rows=load_mod._BROADCAST_MAP_MAX + 1,
    )
    assert "broadcast" in analyzed(small).lower()
    assert "broadcast" not in analyzed(big).lower()


def test_load_correct_under_shuffle_join_fallback(spark, monkeypatch):
    """Force every map join down the no-hint (shuffle) path and assert
    the two-phase load still produces identical results."""
    import amaxa_spark.operators.load as load_mod

    monkeypatch.setattr(load_mod, "_BROADCAST_MAP_MAX", -1)
    accounts = spark.createDataFrame(
        [("A1", "HQ", None), ("A2", "Branch", "A1")],
        "Id: string, Name: string, ParentId: string",
    )
    contacts = spark.createDataFrame(
        [("C1", "A1"), ("C2", "A2"), ("C3", None)],
        "Id: string, AccountId: string",
    )
    steps = [LoadStepPlan("Account"), LoadStepPlan("Contact")]
    res = LoadOperation(
        spark, sf_registry(), steps, {"Account": accounts, "Contact": contacts}
    ).run()
    acc = {r.Id: r for r in res.written["Account"].collect()}
    assert acc[new_id("Account", "A2")].ParentId == new_id("Account", "A1")
    con = {r.Id: r.AccountId for r in res.written["Contact"].collect()}
    assert con[new_id("Contact", "C2")] == new_id("Account", "A2")
    assert con[new_id("Contact", "C3")] is None

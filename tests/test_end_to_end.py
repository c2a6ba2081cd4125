"""Golden round-trip + polymorphic extraction — the engine analogue of
the reference's test_end_to_end.py and polymorphic ExtractionStep
tests (SURVEY §5.3). Assertions are unordered row-set comparisons."""

import pytest
from pyspark.sql import functions as F

from amaxa_spark.metadata import SchemaRegistry, TableMeta
from amaxa_spark.operators.extract import ExtractOperation
from amaxa_spark.operators.load import LoadOperation
from amaxa_spark.plans.plan import (
    ExtractScope,
    ExtractStepPlan,
    LoadStepPlan,
)
from amaxa_spark.sources.catalog import TableCatalog, write_extract_csv


def sf_graph_registry():
    return SchemaRegistry(
        [
            TableMeta("Account", lookups={"ParentId": ["Account"]}, key_prefix="001"),
            TableMeta(
                "Contact",
                lookups={"AccountId": ["Account"], "ReportsToId": ["Contact"]},
                key_prefix="003",
            ),
            TableMeta(
                "Task",
                lookups={"WhatId": ["Account", "Opportunity"], "WhoId": ["Contact", "Lead"]},
                key_prefix="00T",
            ),
            TableMeta("Opportunity", lookups={"AccountId": ["Account"]}, key_prefix="006"),
        ]
    )


def sf_graph_catalog(spark):
    accounts = spark.createDataFrame(
        [
            ("001000000000001AAA", "Acme", None),
            ("001000000000002AAA", "Acme Sub", "001000000000001AAA"),
            ("001000000000003AAA", "Other", None),
        ],
        "Id: string, Name: string, ParentId: string",
    )
    contacts = spark.createDataFrame(
        [
            ("003000000000001AAA", "001000000000001AAA", None, "Ann"),
            ("003000000000002AAA", "001000000000002AAA", "003000000000001AAA", "Bob"),
            ("003000000000003AAA", "001000000000003AAA", None, "Cid"),
        ],
        "Id: string, AccountId: string, ReportsToId: string, LastName: string",
    )
    opps = spark.createDataFrame(
        [("006000000000001AAA", "001000000000001AAA", "Deal")],
        "Id: string, AccountId: string, Name: string",
    )
    tasks = spark.createDataFrame(
        [
            # WhatId polymorphic: one to Account, one to Opportunity
            ("00T000000000001AAA", "001000000000002AAA", "003000000000002AAA", "call"),
            ("00T000000000002AAA", "006000000000001AAA", "003000000000001AAA", "mail"),
            # reference to an account outside the extracted set
            ("00T000000000003AAA", "001000000000003AAA", "003000000000003AAA", "ping"),
        ],
        "Id: string, WhatId: string, WhoId: string, Subject: string",
    )
    cat = TableCatalog(spark, "/tmp/none")
    cat.register("Account", accounts)
    cat.register("Contact", contacts)
    cat.register("Opportunity", opps)
    cat.register("Task", tasks)
    return cat


def test_polymorphic_descendents_and_dependents(spark):
    """Task sits between Account (earlier) and Opportunity (later):
    WhatId is both descendent (via Account) and dependent (via
    Opportunity) — the J5 discrimination by key prefix."""
    cat = sf_graph_catalog(spark)
    reg = sf_graph_registry()
    steps = [
        ExtractStepPlan("Account", ExtractScope.SELECTED_IDS, ids=["001000000000001AAA"]),
        ExtractStepPlan("Task", ExtractScope.DESCENDENTS),
        ExtractStepPlan("Opportunity", ExtractScope.DESCENDENTS),
    ]
    res = ExtractOperation(spark, cat, reg, steps).run()
    # Account closure pulls the child account 002
    accs = {r.Id for r in res["Account"].collect()}
    assert accs == {"001000000000001AAA", "001000000000002AAA"}
    # Tasks whose WhatId (prefix 001) is in the extracted accounts
    tasks = {r.Id for r in res["Task"].collect()}
    assert "00T000000000001AAA" in tasks
    assert "00T000000000003AAA" not in tasks  # points at unextracted account
    # Opportunity extracted two ways: as descendent of Account AND as
    # dependent target of Task.WhatId (prefix 006)
    opps = {r.Id for r in res["Opportunity"].collect()}
    assert opps == {"006000000000001AAA"}


def test_golden_roundtrip_csv(spark, tmp_path):
    """Extract → CSV → load → compare: the reference's end-to-end
    golden test shape. Name sets must round-trip; FKs must point at
    the new parents' synthesized IDs."""
    cat = sf_graph_catalog(spark)
    reg = sf_graph_registry()
    steps = [
        ExtractStepPlan("Account", ExtractScope.ALL_RECORDS),
        ExtractStepPlan("Contact", ExtractScope.DESCENDENTS),
    ]
    res = ExtractOperation(spark, cat, reg, steps).run()
    for t in ("Account", "Contact"):
        write_extract_csv(res[t], str(tmp_path / f"{t}.csv"), pk="Id", single_file=True)

    inputs = {
        t: spark.read.option("header", True).csv(str(tmp_path / f"{t}.csv"))
        for t in ("Account", "Contact")
    }
    lres = LoadOperation(
        spark, reg, [LoadStepPlan("Account"), LoadStepPlan("Contact")], inputs
    ).run()

    # unordered name-set round-trip (reference asserts on Name sets)
    src_names = {r.Name for r in cat["Account"].collect()}
    out_names = {r.Name for r in lres.written["Account"].collect()}
    assert out_names == src_names
    src_last = {r.LastName for r in cat["Contact"].collect()}
    out_last = {r.LastName for r in lres.written["Contact"].collect()}
    assert out_last == src_last

    # FK integrity in the loaded graph: every Contact.AccountId and
    # every Account.ParentId resolves to a loaded Account's new ID
    new_accs = {r.Id for r in lres.written["Account"].collect()}
    for r in lres.written["Contact"].collect():
        assert r.AccountId in new_accs
    for r in lres.written["Account"].collect():
        assert r.ParentId is None or r.ParentId in new_accs
    # self-lookup rewired through the two-phase plan
    parents = [r.ParentId for r in lres.written["Account"].collect() if r.ParentId]
    assert len(parents) == 1


def test_roundtrip_with_transforms_and_rename(spark, tmp_path):
    """Transform round-trip with column mapping — mirrors the
    reference's transform end-to-end test (test_end_to_end.py:94-120)."""
    cat = sf_graph_catalog(spark)
    reg = sf_graph_registry()
    steps = [
        ExtractStepPlan(
            "Account",
            ExtractScope.ALL_RECORDS,
            fields=["Name"],
            column_map={"Name": "account_name"},
            transforms={"Name": ["lowercase"]},
        ),
    ]
    res = ExtractOperation(spark, cat, reg, steps).run()
    # transforms + rename are applied by the engine at the sink
    write_extract_csv(res["Account"], str(tmp_path / "acc.csv"), pk="Id", single_file=True)
    back = spark.read.option("header", True).csv(str(tmp_path / "acc.csv"))
    assert back.columns == ["Id", "account_name"]
    assert {r.account_name for r in back.collect()} == {"acme", "acme sub", "other"}


def test_atomic_extract_commit_and_read(spark, tmp_path):
    """Manifest protocol: commit is all-or-nothing across tables; a
    failed generation is invisible; vacuum reclaims its orphans."""
    from amaxa_spark.sources.catalog import (
        atomic_extract_write,
        read_committed_extract,
        vacuum_extract,
    )

    cat = sf_graph_catalog(spark)
    reg = sf_graph_registry()
    steps = [
        ExtractStepPlan("Account", ExtractScope.ALL_RECORDS),
        ExtractStepPlan("Contact", ExtractScope.DESCENDENTS),
    ]
    res = ExtractOperation(spark, cat, reg, steps).run()
    out = str(tmp_path / "atomic")

    # no commit yet → reader refuses
    with pytest.raises(FileNotFoundError):
        read_committed_extract(spark, out)

    m1 = atomic_extract_write(res, out, single_file=True, record_counts=True)
    got = read_committed_extract(spark, out)
    assert set(got) == {"Account", "Contact"}
    assert {r.Id for r in got["Account"].collect()} == {
        r.Id for r in res["Account"].collect()
    }
    assert m1["tables"]["Account"]["rows"] == res["Account"].count()

    # a generation that fails mid-write must not disturb the committed one
    class Boom(Exception):
        pass

    class FailingDF:
        columns = ["Id"]

        def select(self, *a, **k):
            raise Boom()

    with pytest.raises(Boom):
        atomic_extract_write(
            {"Account": res["Account"], "Contact": FailingDF()}, out, single_file=True
        )
    got2 = read_committed_extract(spark, out)
    assert {r.Id for r in got2["Contact"].collect()} == {
        r.Id for r in res["Contact"].collect()
    }

    # second successful commit supersedes; vacuum removes generation 1
    m2 = atomic_extract_write(res, out, single_file=True)
    assert m2["token"] != m1["token"]
    removed = vacuum_extract(out)
    assert any(m1["token"] in p for p in removed)
    assert all(m2["token"] not in p for p in removed)
    assert set(read_committed_extract(spark, out)) == {"Account", "Contact"}


def test_extract_time_travel_and_retention(spark, tmp_path):
    """Generation history: past snapshots stay readable by token until
    vacuumed out of the retention window; the window prunes both data
    and history atomically enough that aged-out reads fail cleanly."""
    from amaxa_spark.sources.catalog import (
        atomic_extract_write,
        list_generations,
        read_committed_extract,
        vacuum_extract,
    )

    cat = sf_graph_catalog(spark)
    reg = sf_graph_registry()
    steps = [ExtractStepPlan("Account", ExtractScope.ALL_RECORDS)]
    res = ExtractOperation(spark, cat, reg, steps).run()
    out = str(tmp_path / "tt")

    m1 = atomic_extract_write(res, out, single_file=True)
    # generation 2 drops a record — snapshots must diverge
    res2 = {"Account": res["Account"].limit(2)}
    m2 = atomic_extract_write(res2, out, single_file=True)

    gens = list_generations(out)
    assert [g["token"] for g in gens][0] == m2["token"]
    assert {g["token"] for g in gens} == {m1["token"], m2["token"]}
    assert [g["current"] for g in gens] == [True, False]

    # time travel: the old token still reads generation 1's data
    old = read_committed_extract(spark, out, token=m1["token"])
    cur = read_committed_extract(spark, out)
    assert old["Account"].count() > cur["Account"].count()

    # retention window 2 keeps both generations' data
    assert vacuum_extract(out, keep_last=2) == []
    assert read_committed_extract(spark, out, token=m1["token"])[
        "Account"
    ].count() == old["Account"].count()

    # shrinking to 1 reclaims generation 1 and prunes its history
    removed = vacuum_extract(out, keep_last=1)
    assert any(m1["token"] in p for p in removed)
    with pytest.raises(FileNotFoundError):
        read_committed_extract(spark, out, token=m1["token"])
    assert read_committed_extract(spark, out)["Account"].count() == 2


def test_incremental_delta_against_committed_generation(spark, tmp_path):
    """CDC shape: after an atomic commit, only new/changed rows
    survive the delta; first run (no manifest) passes everything."""
    from amaxa_spark.sources.catalog import (
        atomic_extract_write,
        incremental_delta,
    )

    out = str(tmp_path / "inc")
    v1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "Id string, Name string"
    )
    # first run: no committed generation -> full passthrough
    d0 = incremental_delta(spark, {"Account": v1}, out, {"Account": "Id"})
    assert d0["Account"].count() == 3
    atomic_extract_write({"Account": v1}, out, pk="Id", single_file=True)

    # v2: row 2 changed, row 4 added, rows 1/3 untouched
    v2 = spark.createDataFrame(
        [(1, "alpha"), (2, "BETA2"), (3, "gamma"), (4, "delta")],
        "Id string, Name string",
    )
    d1 = incremental_delta(spark, {"Account": v2}, out, {"Account": "Id"})
    got = {(r["Id"], r["Name"]) for r in d1["Account"].collect()}
    assert got == {("2", "BETA2"), ("4", "delta")}

    # unknown table in current -> treated as all-new
    extra = spark.createDataFrame([(9, "x")], "Id string, V string")
    d2 = incremental_delta(
        spark, {"Other": extra}, out, {"Other": "Id"}
    )
    assert d2["Other"].count() == 1


def test_incremental_delta_typed_columns_roundtrip(spark, tmp_path):
    """Timestamp/double/boolean columns must NOT flag as changed after
    the CSV round-trip: the committed side comes back as strings whose
    rendering differs from Spark's cast-to-string (ISO 'T'/'Z' form vs
    '2020-01-01 00:00:00'), so both sides hash through the same typed
    canonical form. An unchanged typed table yields an EMPTY delta."""
    import datetime

    from amaxa_spark.sources.catalog import (
        atomic_extract_write,
        incremental_delta,
    )

    out = str(tmp_path / "inc_typed")
    rows = [
        ("1", datetime.datetime(2020, 1, 1, 0, 0, 0), 1.5, True),
        ("2", datetime.datetime(2021, 6, 15, 12, 30, 45), -2.25, False),
        ("3", None, None, None),
    ]
    schema = "Id string, Created timestamp, Amount double, Active boolean"
    v1 = spark.createDataFrame(rows, schema)
    atomic_extract_write({"Account": v1}, out, pk="Id", single_file=True)

    # identical typed frame -> nothing changed
    d1 = incremental_delta(
        spark, {"Account": spark.createDataFrame(rows, schema)}, out,
        {"Account": "Id"},
    )
    assert d1["Account"].count() == 0

    # one real change is still detected
    rows2 = list(rows)
    rows2[1] = ("2", datetime.datetime(2021, 6, 15, 12, 30, 45), 9.75, False)
    d2 = incremental_delta(
        spark, {"Account": spark.createDataFrame(rows2, schema)}, out,
        {"Account": "Id"},
    )
    assert [r["Id"] for r in d2["Account"].collect()] == ["2"]

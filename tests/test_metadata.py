"""Lookup classification by operation order — mirrors the reference's
self/descendent/dependent semantics (`amaxa/amaxa.py:177-232`)."""

from amaxa_spark.metadata import SchemaRegistry, TableMeta


def fixtures_registry() -> SchemaRegistry:
    """The FIXTURES.md Salesforce-shaped graph."""
    return SchemaRegistry(
        [
            TableMeta("Account", lookups={"ParentId": ["Account"]}, key_prefix="001"),
            TableMeta(
                "Contact",
                lookups={"AccountId": ["Account"], "ReportsToId": ["Contact"]},
                key_prefix="003",
            ),
            TableMeta(
                "Opportunity", lookups={"AccountId": ["Account"]}, key_prefix="006"
            ),
            TableMeta(
                "Lead",
                lookups={
                    "ConvertedAccountId": ["Account"],
                    "ConvertedContactId": ["Contact"],
                    "ConvertedOpportunityId": ["Opportunity"],
                },
                key_prefix="00Q",
            ),
            TableMeta(
                "Task",
                lookups={
                    "WhoId": ["Contact", "Lead"],
                    "WhatId": ["Account", "Opportunity"],
                    "AccountId": ["Account"],
                },
                key_prefix="00T",
            ),
        ]
    )


def test_self_lookup():
    reg = fixtures_registry()
    cls = reg.classify_lookups(["Account"])
    assert cls["Account"].self_lookups == {"ParentId"}
    assert not cls["Account"].descendent_lookups


def test_descendent_and_self():
    reg = fixtures_registry()
    cls = reg.classify_lookups(["Account", "Contact"])
    assert cls["Contact"].descendent_lookups == {"AccountId"}
    assert cls["Contact"].self_lookups == {"ReportsToId"}


def test_dependent_down_list():
    reg = fixtures_registry()
    cls = reg.classify_lookups(["Lead", "Account", "Contact", "Opportunity"])
    assert cls["Lead"].dependent_lookups == {
        "ConvertedAccountId",
        "ConvertedContactId",
        "ConvertedOpportunityId",
    }


def test_polymorphic_both_classes():
    reg = fixtures_registry()
    # Task before Opportunity: WhatId targets Account (earlier) and
    # Opportunity (later) → both descendent and dependent
    cls = reg.classify_lookups(["Account", "Task", "Opportunity"])
    assert "WhatId" in cls["Task"].descendent_lookups
    assert "WhatId" in cls["Task"].dependent_lookups


def test_outside_operation_targets_ignored():
    reg = fixtures_registry()
    cls = reg.classify_lookups(["Task"])
    # no targets of WhoId/WhatId/AccountId in operation → unclassified
    assert not cls["Task"].all_lookups

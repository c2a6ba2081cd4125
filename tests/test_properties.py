"""Property-based tests (hypothesis) for scalar kernels and the
closure operator — the engine's analogue of fuzzing the reference's
SalesforceId/transform units."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amaxa_spark.ids import normalize_sfid

ID_ALPHABET = string.ascii_letters + string.digits


@given(st.text(alphabet=ID_ALPHABET, min_size=15, max_size=15))
def test_sfid_idempotent_and_stable(s):
    n = normalize_sfid(s)
    assert len(n) == 18
    assert n[:15] == s
    # canonicalization is idempotent
    assert normalize_sfid(n) == n


@given(st.text(alphabet=ID_ALPHABET, min_size=15, max_size=15))
def test_sfid_checksum_case_insensitive_recovery(s):
    """The 18-char form is case-insensitive: two IDs differing only in
    case produce different checksums (the checksum encodes the case)."""
    n = normalize_sfid(s)
    flipped = s.swapcase()
    if flipped != s:
        assert normalize_sfid(flipped)[15:] != n[15:] or not any(
            c.isalpha() for c in s
        )


@st.composite
def forests(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    parents = {}
    for i in range(1, n):
        has_parent = draw(st.booleans())
        if has_parent:
            parents[i] = draw(st.integers(min_value=0, max_value=i - 1))
    return n, parents


def _python_closure(n, parents, seed):
    """Reference closure: BFS over undirected parent edges."""
    adj = {i: set() for i in range(n)}
    for child, parent in parents.items():
        adj[child].add(parent)
        adj[parent].add(child)
    seen, frontier = {seed}, [seed]
    while frontier:
        nxt = []
        for x in frontier:
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    nxt.append(y)
        frontier = nxt
    return seen


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(forests())
def test_closure_matches_bfs(spark, forest):
    from amaxa_spark.metadata import SchemaRegistry, TableMeta
    from amaxa_spark.operators.extract import ExtractOperation
    from amaxa_spark.plans.plan import ExtractScope, ExtractStepPlan
    from amaxa_spark.sources.catalog import TableCatalog

    n, parents = forest
    rows = [(str(i), str(parents[i]) if i in parents else None) for i in range(n)]
    df = spark.createDataFrame(rows, "Id: string, ParentId: string")
    cat = TableCatalog(spark, "/tmp/none")
    cat.register("T", df)
    reg = SchemaRegistry([TableMeta("T", lookups={"ParentId": ["T"]})])
    res = ExtractOperation(
        spark,
        cat,
        reg,
        [ExtractStepPlan("T", ExtractScope.SELECTED_IDS, ids=["0"])],
    ).run()
    got = {int(r.Id) for r in res["T"].collect()}
    assert got == _python_closure(n, parents, 0)

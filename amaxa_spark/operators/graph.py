"""Graph operators over self-lookup (parent-pointer) relations.

Beyond the seeded closure (J3), pipelines need whole-table grouping:
assign every record its hierarchy root / connected component. For a
parent-pointer forest the right distributed algorithm is **pointer
doubling** (path halving): each round replaces every node's pointer
with its pointer's pointer, so path lengths halve and the loop
converges in O(log depth) rounds — at depth 24 that is 5 rounds of
self-joins versus 24 BFS rounds. Each round is one equi-join of the
narrow (node, ptr) frame with itself; `localCheckpoint` truncates
lineage per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_BROADCAST_HOP_MAX = 2_000_000


def pointer_roots(
    nodes: DataFrame, max_rounds: int = 40
) -> tuple[DataFrame, bool]:
    """Pointer-doubling fixpoint over a (node, parent) frame whose
    parent values are null or known-existing node ids. Returns
    ``(ptr_frame(node, ptr), converged)``; when ``converged`` is
    False (a parent cycle, or depth > 2^max_rounds) the pointers are
    NOT roots and callers must fall back to BFS."""
    ptr = (
        nodes.select("node", F.coalesce("parent", "node").alias("ptr"))
        .localCheckpoint(eager=True)
    )
    # the hop side is the whole pointer frame: broadcasting it makes
    # each doubling round a map-only stage (no per-round shuffle of
    # ptr), which measurably halves round latency. Gated by row count
    # — counted once on the checkpointed frame, so it's nearly free —
    # because above ~2M rows the per-round broadcast build/ship cost
    # overtakes the shuffle it saves.
    bcast = ptr.count() <= _BROADCAST_HOP_MAX
    converged = False
    for _ in range(max_rounds):
        hop = ptr.select(F.col("node").alias("__n2"), F.col("ptr").alias("__p2"))
        if bcast:
            hop = F.broadcast(hop)
        # carry a per-row moved flag through the doubling join so
        # convergence is a scan of the checkpointed result, not a
        # second join against the previous round
        doubled = (
            ptr.join(hop, ptr["ptr"] == hop["__n2"], "left_outer")
            .select(
                "node",
                F.coalesce("__p2", "ptr").alias("ptr"),
                (F.col("__p2").isNotNull() & (F.col("__p2") != F.col("ptr"))).alias(
                    "__moved"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = doubled.where(F.col("__moved")).limit(1).count()
        ptr = doubled.drop("__moved")
        if changed == 0:
            converged = True
            break
    return ptr, converged


def hierarchy_roots(
    df: DataFrame, pk: str, parent_col: str, max_rounds: int = 40
) -> DataFrame:
    """Returns (``pk``, root) where root is the top ancestor reached
    by following ``parent_col`` (nodes with null parent are their own
    root). Dangling parent references are treated as roots."""
    nodes = df.select(F.col(pk).alias("node"), F.col(parent_col).alias("parent"))
    # dangling parents (no matching node) behave as if null — ONE
    # left join with an existence flag (the old left_semi +
    # left_outer pair re-derived the same rows in two joins)
    resolved = (
        nodes.join(
            nodes.select(F.col("node").alias("__p")),
            F.col("parent") == F.col("__p"),
            "left_outer",
        )
        .select(
            "node",
            F.when(F.col("__p").isNotNull(), F.col("parent")).alias("parent"),
        )
    )
    ptr, _ = pointer_roots(resolved, max_rounds)
    return ptr.select(F.col("node").alias(pk), F.col("ptr").alias("root"))


def component_sizes(
    df: DataFrame, pk: str, parent_col: str
) -> DataFrame:
    """(root, size) per hierarchy — the grouping reduction on top of
    :func:`hierarchy_roots`."""
    roots = hierarchy_roots(df, pk, parent_col)
    return roots.groupBy("root").agg(F.count(F.lit(1)).alias("size"))


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over an (src, dst) edge frame —
    the canonical iterative-algorithm shape done Spark-right: every
    iteration is one (edges ⋈ ranks) shuffle on the source key plus a
    dst-keyed aggregation, the dangling-node mass is folded back
    through a 1-row broadcast (never a driver round-trip), and
    ``localCheckpoint`` truncates lineage so the plan does not grow
    with the iteration count. Multi-edges should be deduplicated by
    the caller if unweighted semantics are intended.

    Returns (node, rank) with ranks summing to 1 (uniform teleport +
    uniform dangling redistribution). The only driver-side scalar is
    the node COUNT (one number, same bounded-collect contract as the
    IVF codebook); everything row-shaped stays in the plan.

    Scale shape: per iteration, one shuffle of |E| narrow rows keyed
    by src and one |V| aggregation keyed by dst; ranks/outdeg frames
    are (id, double) — at 1B edges the iteration cost is two
    exchanges of 16-byte rows, and AQE's skew handling applies to hub
    nodes. O(log) alternatives (e.g. power iteration on a
    block-partitioned matrix) only pay above ~10^10 edges."""
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .union(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # bounded driver scalar: ONE number
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    outdeg = e.groupBy("e_src").agg(F.count(F.lit(1)).alias("__odeg"))
    # pre-join outdeg once: the per-iteration join then carries
    # (src, dst, odeg) and needs no second lookup
    edeg = e.join(outdeg, "e_src").localCheckpoint(eager=True)
    dangling = nodes.join(
        e.select(F.col("e_src").alias("node")).distinct(), "node", "left_anti"
    ).localCheckpoint(eager=True)
    teleport = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            edeg.join(ranks, edeg["e_src"] == ranks["node"])
            .select(
                F.col("e_dst").alias("node"),
                (F.col("rank") / F.col("__odeg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__contrib"))
        )
        dmass = dangling.join(ranks, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        ranks = (
            nodes.crossJoin(F.broadcast(dmass))
            .join(contribs, "node", "left_outer")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce("__contrib", F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks

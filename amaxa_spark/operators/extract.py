"""Extract engine — graph-slice extraction as DataFrame joins.

Re-expresses the reference's extraction semantics
(`/root/reference/amaxa/amaxa.py:541-844`) Spark-first:

- scopes ALL/QUERY/IDS become scans with Catalyst-pushed predicates
  (S1–S4),
- the descendent pass (J1) is a ``left_semi`` join of the child table
  against the union of already-extracted target IDs,
- dependency resolution (J2) is a semi-join against the required-ID
  set, with missing IDs detected by ``left_anti``,
- the self-lookup transitive closure (J3) is an iterate-to-fixpoint
  driver loop over narrow single-column ID frames with
  ``localCheckpoint`` per round (lineage truncation) and an
  ``isEmpty`` frontier test,
- polymorphic lookups (J5) route by 3-char key prefix against the
  registry's prefix map,
- outside references (J6) are ``left_anti`` joins with
  include/drop-field/error behaviors.

Scale notes: all set algebra happens on *single-column ID frames* —
narrow shuffles, trivially partitioned by the join key; AQE converts
small ID sets to broadcast joins at runtime. The wide row data is
reconstructed once per table at the end with a single semi-join of the
source scan against the final ID set, so column pruning and filter
pushdown reach the parquet scan untouched.
"""

from __future__ import annotations

import logging
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amaxa_spark.ids import KEY_PREFIX_LEN
from amaxa_spark.metadata import SchemaRegistry
from amaxa_spark.plans.plan import (
    ExtractScope,
    ExtractStepPlan,
    OutsideLookupBehavior,
    SelfLookupBehavior,
    bad_lookup_behavior_error,
)
from amaxa_spark.sources.catalog import TableCatalog

log = logging.getLogger(__name__)

_ID = "__id"

# below this many explicit IDs, use an `isin` literal (pushed into the
# scan); above it, a broadcast semi-join (mirrors the reference's need
# to chunk `IN`-lists, `/root/reference/amaxa/api.py:186-191`, which
# Spark does not share)
_ISIN_THRESHOLD = 1000

# closure accelerator crossover: below this many rows, pointer
# doubling (O(log depth) whole-table rounds) beats frontier BFS
# (O(depth) component-sized rounds) because per-round job overhead
# dominates; above it, whole-table doubling shuffles swamp the win
# (measured: 10M nodes / 524k component -> BFS 2.7x faster)
_DOUBLING_MAX_EDGES = 2_000_000
# BFS-frontier broadcast gate: same 2M-row threshold as the pointer-
# doubling hop frame (graph.py) and the cluster label frames (dedup.py)
# — a frontier above it is shuffled, not shipped to every executor
_FRONTIER_BROADCAST_MAX = 2_000_000


class ExtractError(RuntimeError):
    pass


def _id_frame(df: DataFrame, col: str) -> DataFrame:
    """Distinct non-null values of ``col`` as a 1-column frame."""
    return df.select(F.col(col).alias(_ID)).where(F.col(_ID).isNotNull()).distinct()


def _union_ids(frames: list[DataFrame]) -> DataFrame | None:
    frames = [f for f in frames if f is not None]
    if not frames:
        return None
    return reduce(lambda a, b: a.unionByName(b), frames).distinct()


class ExtractOperation:
    """Sequential, fail-stop execution of extract steps
    (`/root/reference/amaxa/amaxa.py:545-567`)."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: TableCatalog,
        registry: SchemaRegistry,
        steps: list[ExtractStepPlan],
    ):
        self.spark = spark
        self.catalog = catalog
        self.registry = registry
        self.steps = steps
        self.step_order = [s.table for s in steps]
        # classify only registered tables — an unknown sObject must
        # surface as _validate's reference-parity error at run(), not
        # a KeyError at plan-build time (the reference, too, reports
        # unknown sObjects from a validation stage, loader/core.py:267)
        self.classification = registry.classify_lookups(
            [t for t in self.step_order if t in registry]
        )
        # per-table accumulated state (all single-column ID frames)
        self.extracted_ids: dict[str, DataFrame] = {}
        self.required_ids: dict[str, DataFrame] = {}
        # |required_ids[table]| — observed for free on the frame's
        # eager checkpoint job (_add_required), consumed by the fused
        # missing-dependency check in _resolve_required
        self.required_counts: dict[str, int] = {}
        self.results: dict[str, DataFrame] = {}
        self.errors: list[str] = []

    # ---- scope selection (S1-S4) -------------------------------------

    def _base_ids(self, step: ExtractStepPlan):
        """Returns ``(ids, check)``. For SELECTED_IDS steps with a
        downstream consumer the all-IDs-exist count rides the step's
        eager ID-frame checkpoint as an Observation (the family-12
        pattern of _resolve_required): the dedicated ``found.count()``
        re-ran the isin filter / broadcast semi-join — one whole extra
        table pass per step at scale. ``check`` (run by run() right
        after the checkpoint materializes, before check_required to
        preserve error precedence) raises the IDENTICAL error string.
        Terminal steps keep the dedicated action — no checkpoint job
        to ride, and the fail-stop contract needs the check to fire
        during run() regardless."""
        t = self.catalog[step.table]
        pk = self.registry[step.table].pk
        if step.scope is ExtractScope.ALL_RECORDS:
            return _id_frame(t, pk), None
        if step.scope is ExtractScope.QUERY:
            return _id_frame(t.filter(F.expr(step.where)), pk), None
        if step.scope is ExtractScope.SELECTED_IDS:
            ids = list(step.ids or [])
            if len(ids) <= _ISIN_THRESHOLD:
                found = _id_frame(t.filter(F.col(pk).isin(ids)), pk)
            else:
                seed = self.spark.createDataFrame([(i,) for i in ids], [_ID])
                found = (
                    t.join(F.broadcast(seed), t[pk] == seed[_ID], "left_semi")
                    .select(F.col(pk).alias(_ID))
                    .distinct()
                )
            # explicit IDs are *required*: all must exist (S3/J2 error).
            # `found` is distinct (pk unique / explicit distinct), so
            # its row count IS n_found exactly.
            n_asked = len(set(ids))

            def _raise(n_found: int) -> None:
                raise ExtractError(
                    f"{step.table}: {n_asked - n_found} of {n_asked} "
                    "requested IDs do not exist"
                )

            if not self._has_consumers(step):
                n_found = found.count()
                if n_found != n_asked:
                    _raise(n_found)
                return found, None
            from pyspark.sql import Observation

            obs = Observation()
            out = found.observe(obs, F.count(F.lit(1)).alias("n"))

            def check() -> None:
                # obs.get blocks until a job has executed the observed
                # node — guaranteed: run() eagerly checkpoints this
                # step's ID frame (has_consumers was True), and any
                # earlier closure-round materialization fires it sooner
                n_found = int(obs.get["n"])
                if n_found != n_asked:
                    _raise(n_found)

            return out, check
        if step.scope is ExtractScope.DESCENDENTS:
            cls = self.classification[step.table]
            meta = self.registry[step.table]
            branches = []
            for col in sorted(cls.descendent_lookups):
                targets = [
                    tt for tt in meta.lookups[col] if tt in self.extracted_ids
                ]
                parent_ids = _union_ids([self.extracted_ids[tt] for tt in targets])
                if parent_ids is None:
                    continue
                # J1: child semi-join against union of extracted target IDs
                branches.append(
                    _id_frame(
                        t.join(parent_ids, t[col] == parent_ids[_ID], "left_semi"),
                        pk,
                    )
                )
            out = _union_ids(branches)
            if out is None:
                # a DESCENDENTS step with no populated parents extracts nothing
                return _id_frame(t.limit(0), pk), None
            return out, None
        raise ExtractError(f"unknown scope {step.scope}")

    # ---- dependency resolution (J2) ----------------------------------

    def _resolve_required(
        self, step: ExtractStepPlan, ids: DataFrame
    ):
        """Returns ``(ids', check)``. The missing-dependency count no
        longer pays its own action when the step's ID frame is about
        to be eagerly checkpointed anyway (every consumed step): both
        `found` (anti-join probe) and the returned union semi-join
        scan the FULL target table, so the dedicated ``missing.count``
        was one whole extra table pass per dependency-resolving step
        at scale. Instead |found| rides the checkpoint job as an
        Observation below the union (``found`` is distinct and ⊆ req,
        so n_missing = |req| − |found| exactly; |req| was observed for
        free on _add_required's checkpoint), and ``check`` — run by
        run() right after the checkpoint materializes, still
        fail-stop before any later step — raises the IDENTICAL error,
        deriving the 5-row sample only on the (rare) error path."""
        req = self.required_ids.pop(step.table, None)
        if req is None:
            return ids, None
        n_req = self.required_counts.pop(step.table, None)
        t = self.catalog[step.table]
        pk = self.registry[step.table].pk
        found = _id_frame(t.join(req, t[pk] == req[_ID], "left_semi"), pk)

        def _raise(n_missing: int) -> None:
            missing = req.join(found, _ID, "left_anti")
            sample = [r[_ID] for r in missing.limit(5).collect()]
            raise ExtractError(
                f"{step.table}: {n_missing} required dependency IDs could not "
                f"be resolved (sample: {sample})"
            )

        if n_req is None or not self._has_consumers(step):
            # no checkpoint job to ride (terminal step) — keep the
            # dedicated action; the fail-stop contract needs the
            # check to fire during run() regardless
            missing = req.join(found, _ID, "left_anti")
            n_missing = missing.count()
            if n_missing:
                _raise(n_missing)
            return ids.unionByName(found).distinct(), None
        from pyspark.sql import Observation

        obs = Observation()
        out = ids.unionByName(
            found.observe(obs, F.count(F.lit(1)).alias("n"))
        ).distinct()

        def check() -> None:
            # obs.get blocks until a job has executed the observed
            # node — guaranteed: run() eagerly checkpoints this
            # step's ID frame (has_consumers was True)
            n_missing = n_req - int(obs.get["n"])
            if n_missing:
                _raise(n_missing)

        return out, check

    # ---- self-lookup transitive closure (J3) -------------------------

    def _self_closure(self, step: ExtractStepPlan, ids: DataFrame) -> DataFrame:
        cls = self.classification[step.table]
        if (
            not cls.self_lookups
            or step.self_lookup_behavior is not SelfLookupBehavior.TRACE_ALL
        ):
            # STEP-level trace-none skips the entire recursion —
            # including the downward children pass — exactly as the
            # reference gates its whole iterate-to-fixpoint loop on
            # the step-level behavior (`amaxa/amaxa.py:697-700`).
            # This intentionally differs from PER-FIELD trace-none
            # below, which (also like the reference,
            # `amaxa/amaxa.py:735-745`) suppresses only the upward
            # dependency registration while the children pass still
            # covers every self-lookup column.
            return ids
        t = self.catalog[step.table]
        pk = self.registry[step.table].pk
        self_cols = sorted(cls.self_lookups)
        # per-field trace-none (`amaxa/amaxa.py:638-646,735-745`): the
        # field is excluded from UPWARD (parent) tracing only; the
        # downward children pass still covers every self-lookup
        up_cols = [
            c
            for c in self_cols
            if step.self_behavior_for(c) is SelfLookupBehavior.TRACE_ALL
        ]
        # count-based fixpoint, one localCheckpoint + one count per
        # round on a narrow ID frame (the count is nearly free on the
        # checkpointed data); mirrors the reference's termination rule
        # (`amaxa/amaxa.py:713-726`) without its per-record refetches
        # build a bidirectional adjacency ONCE from the narrow edge
        # projection — the closure never re-touches the wide table
        # scan, and each BFS round is a single scan of `adj` instead
        # of one per direction per self-column. Dangling parent refs
        # are filtered here (once), not per round. Partition count is
        # sized to the adjacency volume: per-task overhead ×
        # partitions × rounds is the loop's fixed cost.
        from amaxa_spark.operators.graph import observed_checkpoint

        edges, _em = observed_checkpoint(
            t.select(pk, *self_cols), F.count(F.lit(1)).alias("n")
        )
        n_edges = int(_em["n"])
        # pk is unique by definition — no distinct; a semi-join build
        # side tolerates duplicates anyway
        pks = edges.select(F.col(pk).alias("__p"))

        if (
            len(self_cols) == 1
            and up_cols == self_cols  # overrides break the symmetric-
            # component equivalence the root-matching argument needs
            and n_edges <= _DOUBLING_MAX_EDGES
        ):
            # accelerator: a single self-lookup is (usually) a
            # parent-pointer forest, where the up-and-down closure of
            # the seeds is "all nodes sharing a root with a seed".
            # Pointer doubling finds roots in O(log depth) rounds
            # versus O(depth) BFS rounds. The catch: each doubling
            # round self-joins the WHOLE table, while a BFS round only
            # touches the current frontier — measured at 10M nodes
            # with a 5% component, BFS wins 2.7x. So doubling is
            # gated to tables small enough that per-round fixed
            # overhead (job scheduling, not data) dominates; above
            # the threshold the frontier BFS is the scale path.
            # Cycles break doubling: an odd cycle never stabilizes
            # (converged=False), and an even cycle reaches a period-2
            # fixed point whose "roots" split the component. The
            # result is provably complete iff every final pointer is
            # a TRUE root (null resolved parent) — one narrow
            # semi-join to check. Every ptr chain follows real parent
            # edges, so on a failed check the root-match set is still
            # a SUBSET of the true closure and seeds the BFS below,
            # which completes it honestly.
            from amaxa_spark.operators.graph import pointer_roots

            c = self_cols[0]
            resolved = (
                edges.select(F.col(pk).alias("node"), F.col(c).alias("parent"))
                .join(pks, F.col("parent") == F.col("__p"), "left_outer")
                .select(
                    "node",
                    F.when(F.col("__p").isNotNull(), F.col("parent")).alias(
                        "parent"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            ptr, converged = pointer_roots(resolved)
            if converged:
                # seed/root sets can be arbitrarily large (seeds are
                # whatever the scope extracted) — let AQE pick the
                # join strategy from the materialized sizes
                seed_roots = (
                    ptr.join(ids, ptr["node"] == ids[_ID], "left_semi")
                    .select(F.col("ptr").alias("__r"))
                    .distinct()
                )
                members = ptr.join(
                    seed_roots, ptr["ptr"] == seed_roots["__r"], "left_semi"
                ).select(F.col("node").alias(_ID))
                # plain count, not limit(1).count(): executeTake runs
                # 2 incremental jobs when the result is empty (the
                # normal case) — one full count of the semi-join is
                # one job
                non_root_ptrs = (
                    ptr.select(F.col("ptr").alias("node"))
                    .join(
                        resolved.where(F.col("parent").isNotNull()).select("node"),
                        "node",
                        "left_semi",
                    )
                    .count()
                )
                if non_root_ptrs == 0:
                    return members
                ids = members

        elif (
            len(self_cols) == 1
            and not up_cols  # every self-lookup field is per-field
            # trace-none: the closure is DOWNWARD-ONLY (descendants of
            # the seeds), which is exactly the ancestor-or-self-is-a-
            # seed predicate — pointer doubling with a seed-hit flag
            # answers it in O(log depth) rounds vs O(depth) BFS rounds
            and n_edges <= _DOUBLING_MAX_EDGES
        ):
            from amaxa_spark.operators.graph import pointer_seed_hits

            c = self_cols[0]
            resolved = (
                edges.select(F.col(pk).alias("node"), F.col(c).alias("parent"))
                .join(pks, F.col("parent") == F.col("__p"), "left_outer")
                .select(
                    "node",
                    F.when(F.col("__p").isNotNull(), F.col("parent")).alias(
                        "parent"
                    ),
                )
                .localCheckpoint(eager=True)
            )
            hits, converged = pointer_seed_hits(
                resolved, ids.select(F.col(_ID).alias("node"))
            )
            members = hits.where(F.col("hit")).select(
                F.col("node").alias(_ID)
            )
            if converged:
                return members
            # cycle / depth overflow: the hit set is a subset of the
            # closure containing every seed — the BFS below completes
            # it (same fallback contract as the root-match accelerator)
            ids = members

        directions = []
        for c in self_cols:
            nn = edges.where(F.col(c).isNotNull())
            # descendent direction: parent id -> child id (always)
            directions.append(
                nn.select(F.col(c).alias("src"), F.col(pk).alias("dst"))
            )
            # dependent direction: child id -> (existing) parent id —
            # only for fields whose effective behavior traces up
            if c in up_cols:
                directions.append(
                    nn.select(F.col(pk).alias("src"), F.col(c).alias("dst")).join(
                        pks, F.col("dst") == F.col("__p"), "left_semi"
                    )
                )
        adj = directions[0]
        for d in directions[1:]:
            adj = adj.unionByName(d)
        # size partitions from the edge count (~2 adjacency rows per
        # edge) in the same single shuffle; one materialization
        p_target = max(
            4, min(int(2 * len(self_cols) * n_edges / 2_000_000) + 1, 64)
        )
        adj = adj.repartition(p_target).localCheckpoint(eager=True)

        # frontier BFS (the Pregel shape): expand only the newest IDs —
        # anything adjacent to older ones was found in an earlier round
        import time as _time

        known, _fm = observed_checkpoint(ids, F.count(F.lit(1)).alias("n"))
        frontier = known
        frontier_n = int(_fm["n"])
        round_no, t_round = 0, _time.time()
        while True:
            # broadcast hint only while the frontier is genuinely small
            # (counted on the checkpointed frame, so the count is a
            # cheap scan): a narrow ID frame under the gate avoids the
            # size-misestimated sort-merge join that would shuffle the
            # full adjacency every round. On a 100×-scale hierarchy a
            # BFS level can be 10⁸ rows — above the gate fall back to a
            # plain semi-join and let AQE plan from real sizes.
            probe = (
                F.broadcast(frontier)
                if frontier_n <= _FRONTIER_BROADCAST_MAX
                else frontier
            )
            neighbors = (
                adj.join(probe, adj["src"] == frontier[_ID], "left_semi")
                .select(F.col("dst").alias(_ID))
                .distinct()
            )
            frontier, _fm = observed_checkpoint(
                neighbors.join(known, _ID, "left_anti"),
                F.count(F.lit(1)).alias("n"),
            )
            frontier_n = int(_fm["n"])
            round_no += 1
            # per-round telemetry (A4 progress): frontier size is the
            # round's working set, wall is what scale probes chart
            log.info(
                "closure round %d: frontier=%d wall=%.2fs",
                round_no, frontier_n, _time.time() - t_round,
            )
            t_round = _time.time()
            if frontier_n == 0:
                return known
            # frontier is disjoint from known by construction; keep
            # known as a lazy union of checkpointed frontiers — no
            # recompute, no extra materialization action per round
            known = known.unionByName(frontier)

    # ---- dependent-lookup registration (J4 prep, J5 routing) ---------

    def _register_dependencies(self, step: ExtractStepPlan, rows: DataFrame) -> None:
        cls = self.classification[step.table]
        meta = self.registry[step.table]
        later = set(self.step_order[self.step_order.index(step.table) + 1 :])
        for col in sorted(cls.dependent_lookups):
            targets = [tt for tt in meta.lookups[col] if tt in later]
            if not targets:
                continue
            vals = _id_frame(rows, col)
            if len(meta.lookups[col]) > 1:
                # J5: polymorphic — route by key prefix; refs to targets
                # outside the operation are ignored
                # (`/root/reference/amaxa/amaxa.py:756-774`)
                for tt in targets:
                    prefix = self.registry[tt].key_prefix
                    if prefix is None:
                        continue
                    routed = vals.filter(
                        F.substring(F.col(_ID), 1, KEY_PREFIX_LEN) == prefix
                    )
                    self._add_required(tt, routed)
            else:
                self._add_required(targets[0], vals)

    def _add_required(self, table: str, ids: DataFrame) -> None:
        from amaxa_spark.operators.graph import observed_checkpoint

        cur = self.required_ids.get(table)
        merged = ids if cur is None else cur.unionByName(ids).distinct()
        # the frame's row count rides its checkpoint job (free) so
        # _resolve_required's missing check needs no action of its own
        ck, m = observed_checkpoint(
            merged, F.count(F.lit(1)).alias("n")
        )
        self.required_ids[table] = ck
        self.required_counts[table] = int(m["n"])

    # ---- outside references (J6) -------------------------------------

    def _apply_outside_behavior(self, step: ExtractStepPlan, rows: DataFrame) -> DataFrame:
        cls = self.classification[step.table]
        meta = self.registry[step.table]
        for col in sorted(cls.descendent_lookups):
            behavior = step.outside_behavior_for(col)
            if behavior is OutsideLookupBehavior.INCLUDE:
                continue
            targets = [tt for tt in meta.lookups[col] if tt in self.extracted_ids]
            known = _union_ids([self.extracted_ids[tt] for tt in targets])
            if known is None:
                continue
            if behavior is OutsideLookupBehavior.ERROR:
                bad = rows.where(F.col(col).isNotNull()).join(
                    known, rows[col] == known[_ID], "left_anti"
                )
                n_bad = bad.count()
                if n_bad:
                    raise ExtractError(
                        f"{step.table}.{col}: {n_bad} values reference records "
                        "outside the extracted set (outside-lookup-behavior=error)"
                    )
            elif behavior is OutsideLookupBehavior.DROP_FIELD:
                # null the FK where it points outside the extracted set
                in_set = known.withColumnRenamed(_ID, "__known_id")
                rows = (
                    rows.join(
                        in_set, rows[col] == in_set["__known_id"], "left_outer"
                    )
                    .withColumn(
                        col,
                        F.when(F.col("__known_id").isNotNull(), F.col(col)),
                    )
                    .drop("__known_id")
                )
        return rows

    # ---- execution ---------------------------------------------------

    def _validate(self) -> None:
        """Field/table existence validation against the live schema —
        the engine's version of the reference's post-load validation
        stage (`loader/core.py:199-248`); all errors reported at once."""
        errors = []
        for step in self.steps:
            if step.table not in self.registry:
                # error string mirrors the reference verbatim
                # (`loader/core.py:267-270`, asserted by its
                # test_ExtractionOperationLoader.py:125); the registry
                # is this engine's describe, so absence == unqueryable
                errors.append(
                    f"sObject {step.table} does not exist or does not "
                    "have the correct permission (queryable)"
                )
                continue
            cols = set(self.catalog[step.table].columns)
            pk = self.registry[step.table].pk
            if pk not in cols:
                errors.append(f"{step.table}: primary key {pk!r} not in table")
            for f in step.fields or []:
                if f not in cols:
                    # mirrors `loader/core.py:210-218` / its
                    # test_ExtractionOperationLoader.py:142
                    errors.append(
                        f"Field {step.table}.{f} does not exist or does "
                        "not have the correct CRUD permission."
                    )
            for f in step.exclude_fields:
                if f not in cols:
                    errors.append(
                        f"Field {step.table}.{f} does not exist or does "
                        "not have the correct CRUD permission."
                    )
            # lookup-behavior validity (`loader/core.py:272-289`): a
            # self-lookup behavior on a dependent lookup, or an
            # outside-lookup behavior on a self lookup, is invalid —
            # string parity with _validate_lookup_behaviors
            cls = self.classification.get(step.table)
            if cls is not None:
                for f, beh in step.self_lookup_overrides.items():
                    if f in cls.dependent_lookups:
                        errors.append(
                            bad_lookup_behavior_error(beh.value, step.table, f)
                        )
                for f, beh in step.outside_lookup_behavior.items():
                    if f != "*" and f in cls.self_lookups:
                        errors.append(
                            bad_lookup_behavior_error(beh.value, step.table, f)
                        )
        if errors:
            raise ExtractError("; ".join(errors))

    def _has_consumers(self, step: ExtractStepPlan) -> bool:
        """True if any step (incl. later ones or outside-behavior
        passes) joins against this table's extracted-ID frame — only
        then is eager materialization worth a job."""
        for other in self.steps:
            if other.table == step.table:
                continue
            meta = self.registry[other.table]
            for targets in meta.lookups.values():
                if step.table in targets:
                    return True
        return False

    def run(self) -> dict[str, DataFrame]:
        self._validate()
        for step in self.steps:
            log.info("extract step %s scope=%s", step.table, step.scope)
            ids, check_ids = self._base_ids(step)
            ids, check_required = self._resolve_required(step, ids)
            ids = self._self_closure(step, ids)
            # terminal ID frames (no downstream consumer) stay lazy —
            # they are read exactly once by the final row semi-join
            if self._has_consumers(step):
                ids = ids.localCheckpoint(eager=True)
            if check_ids is not None:
                # fused SELECTED_IDS existence check — fired FIRST to
                # preserve the original error precedence (base-ids
                # errors raised before dependency-resolution errors)
                check_ids()
            if check_required is not None:
                # fires the fused missing-dependency check now that a
                # job has executed the observed node (the eager
                # checkpoint above, or a closure-round materialization)
                check_required()
            self.extracted_ids[step.table] = ids

            t = self.catalog[step.table]
            pk = self.registry[step.table].pk
            rows = t.join(ids, t[pk] == ids[_ID], "left_semi")
            self._register_dependencies(step, rows)
            self.results[step.table] = rows

        # outside-behaviors and projections are applied after all steps,
        # when every table's extracted-ID set is final
        final: dict[str, DataFrame] = {}
        for step in self.steps:
            rows = self._apply_outside_behavior(step, self.results[step.table])
            pk = self.registry[step.table].pk
            fields = step.fields
            if fields is None and step.field_group is not None:
                from amaxa_spark.metadata import expand_field_group

                fields = expand_field_group(
                    self.registry[step.table], rows.columns, step.field_group
                )
            if fields is not None:
                fields = [c for c in fields if c not in set(step.exclude_fields)]
                cols = list(dict.fromkeys([pk, *fields]))  # Id always kept (P1)
                rows = rows.select(*cols)
            elif step.exclude_fields:
                rows = rows.drop(*[c for c in step.exclude_fields if c != pk])
            # sink-side transforms + field→column rename, mirroring the
            # reference's store_result (`amaxa/amaxa.py:600-613,847-861`)
            if step.transforms:
                from amaxa_spark.functions.transforms import apply_transforms

                rows = apply_transforms(
                    rows, step.transforms,
                    types=self.registry[step.table].types,
                )
            if step.column_map:
                from amaxa_spark.functions.transforms import rename_columns

                rows = rename_columns(rows, step.column_map)
            final[step.table] = rows
        self.results = final
        return final

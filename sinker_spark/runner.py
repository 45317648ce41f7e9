"""SyncEngine — the engine's Runner (reference runner.py:28-117), built on
Structured Streaming.

Reference control flow → Spark mapping:

| reference (runner.py)                    | here                          |
|------------------------------------------|-------------------------------|
| trigger→todo enqueue w/ dedup (A6-A7)    | dirty-set = distinct tables in |
|                                          | the micro-batch ∩ view deps   |
| 10s poll loop (A9)                       | trigger(processingTime=...)   |
| DELETE..RETURNING pop (A10)              | micro-batch consumption +     |
|                                          | checkpoint offset commit      |
| REFRESH CONCURRENTLY per view (A11)      | recompute → snapshot-diff     |
| slot scan + regex route (A13-A16)        | cdc.parse_* + route_actions   |
| ES bulk upsert/delete (A17-A19)          | sink.apply_actions            |
| backfill via named cursor (A20)          | backfill(): snapshot write +  |
|                                          | initial upsert stream         |

Two change-propagation paths, matching the reference's two lanes:

- **recompute+diff** (the authoritative lane, = REFRESH CONCURRENTLY):
  recompute dirty views, diff against the stored snapshot, emit
  upserts+deletes. Handles every case incl. FK-cascade deletes (B24) —
  the recomputed view simply no longer contains the rows.
- **route_actions** (the streaming fast lane, = slot replay): map MV
  INSERT records to upserts and parent-table DELETE records to deletes
  declaratively — useful when the CDC feed already carries materialized
  documents (the reference's normal mode).

Delivery: checkpointed offsets ⇒ at-least-once replay; per-id idempotent
sinks ⇒ effectively exactly-once — strictly better than the reference's
destructive ``pg_logical_slot_get_changes`` read (at-most-once tail,
bulk_action_generator.py:34-36); divergence documented in SURVEY.md §2.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sinker_spark import ivm_delta
from sinker_spark.cdc import latest_per_key
from sinker_spark.ivm import DELETE, UPSERT, SnapshotStore
from sinker_spark.views import ViewDef

logger = logging.getLogger(__name__)


def route_actions(
    cdc: DataFrame,
    views_to_indices: dict[str, str],
    parent_tables_to_indices: dict[str, str],
) -> DataFrame:
    """Declarative A15-A18: CDC records → (index, id, op, doc) actions.

    MV INSERT → upsert into the view's index; parent-table DELETE →
    delete-by-proxy (the MV's delete records carry no id — reference
    sinker.py:110-120 — so the parent row's id, which equals the doc id
    by the id-from-parent convention, stands in). Everything else drops.
    Batch is compacted to the max-lsn record per key first, so replays
    and intra-batch storms collapse to last-write-wins.
    """
    compacted = latest_per_key(cdc)
    v_map = F.create_map(*[F.lit(x) for kv in views_to_indices.items() for x in kv]) \
        if views_to_indices else F.create_map()
    p_map = F.create_map(*[F.lit(x) for kv in parent_tables_to_indices.items() for x in kv]) \
        if parent_tables_to_indices else F.create_map()
    upserts = (
        compacted.where(v_map.getItem(F.col("table")).isNotNull() & (F.col("op") == "INSERT"))
        .select(
            v_map.getItem(F.col("table")).alias("index"),
            F.col("id"),
            F.lit(UPSERT).alias("op"),
            F.col("payload").alias("doc"),
        )
    )
    deletes = (
        compacted.where(p_map.getItem(F.col("table")).isNotNull() & (F.col("op") == "DELETE"))
        .select(
            p_map.getItem(F.col("table")).alias("index"),
            F.col("id"),
            F.lit(DELETE).alias("op"),
            F.lit(None).cast("string").alias("doc"),
        )
    )
    return upserts.unionByName(deletes)


class SyncEngine:
    def __init__(
        self,
        spark: SparkSession,
        views: list[ViewDef],
        sink,
        store: SnapshotStore,
        max_parallel_views: int = 1,
        on_schema_change: str = "fail",
        maintenance="auto",
    ) -> None:
        self.spark = spark
        self.views = {v.name: v for v in views}
        self.sink = sink
        self.store = store
        # reference parity (runner.py:44-50, 91-99): per-view thread pools.
        # Spark jobs submitted from separate threads run concurrently (use
        # the FAIR scheduler on a real cluster); exceptions re-raise on
        # future.result(), matching the reference's tested propagation
        # (test_e2e.py:35-57).
        self.max_parallel_views = max_parallel_views
        # per-batch observability: view -> {"upserts": n, "deletes": n}
        # (reference logs processed-tuple counts, runner.py:114-117)
        self.last_stats: dict[str, dict[str, int]] = {}
        # breaking-doc-schema policy: 'fail' (default) re-raises
        # SchemaEvolutionError from the snapshot store; 'reset' performs
        # the reference's DROP + CREATE MATERIALIZED VIEW sequence
        # (sinker.py:100-103): drop the snapshot state and re-backfill
        # the view in place (every doc re-emits; the idempotent sink
        # makes the replay safe). Compatible field-adds never reach this
        # policy — the store folds them as a full re-emit either way.
        if on_schema_change not in ("fail", "reset"):
            raise ValueError(f"on_schema_change must be 'fail' or 'reset', got {on_schema_change!r}")
        self.on_schema_change = on_schema_change
        # shared-scan budget: a base table read by >=2 recomputing views
        # in one epoch is cached once and served from memory/disk to all
        # of them — but only below this size, because at 100 TB caching a
        # fact table costs more than the N-1 saved scans (columnar scans
        # are cheap; materializing the cache is not). Above the cap the
        # views simply re-scan, which is the scale-correct choice.
        self.shared_scan_max_bytes: int = 4 << 30
        # key-local lane-state store (state_keyed module): lane state
        # bucketed by the lane's probe key so per-batch state reads and
        # writes touch only the batch's keys' buckets — O(touched
        # buckets), never O(|state|). Rooted under the snapshot store's
        # own root so reset/cleanup lifecycles travel together.
        import os as _os

        from sinker_spark.state_keyed import KeyedStateStore

        self.keyed = KeyedStateStore(
            spark, _os.path.join(store.root, "__keyed_lane_state")
        )
        # every-N-epochs state hygiene (maintenance.MaintenancePolicy):
        # snapshot-version vacuum + lane-state bucket compaction. Default
        # ON — a long-running stream otherwise grows one snapshot version
        # per batch per marker relation without bound. Pass
        # maintenance=None to disable (tests that assert deep time
        # travel), or a MaintenancePolicy to tune cadence/retention.
        from sinker_spark.maintenance import MaintenancePolicy

        self.maintenance = MaintenancePolicy() if maintenance == "auto" else maintenance
        self._epochs_since_maintenance = 0
        # views already checked for a stored-marker spec-fingerprint
        # mismatch (redefinition adopted over an existing store) — once
        # per engine lifetime, see _stale_spec_views
        self._spec_checked: set[str] = set()

    def _apply_counted(self, view: ViewDef, actions: DataFrame) -> dict[str, int]:
        """Persist the actions frame, collect per-op counts (batch
        stats), apply to the sink, unpersist. ONE execution of the
        upstream serve/fold lineage instead of two — without the
        persist, the count collect and the sink write would each
        recompute the whole serve (state reads, joins, doc assembly),
        doubling per-batch latency for every lane. The frame is
        touched-docs-sized (bounded by batch fan-out, never the corpus),
        so caching it is safe at any scale."""
        actions = actions.persist()
        try:
            counts = {
                r["op"]: r["n"]
                for r in actions.groupBy("op").agg(F.count("*").alias("n")).collect()
            }
            self.sink.apply_actions(view.index, actions)
        finally:
            actions.unpersist()
        return counts

    def _refresh_one(self, view: ViewDef, epoch_id: int | None = None) -> None:
        from sinker_spark.ivm import SchemaEvolutionError

        new_df = view.compile(self.spark)
        try:
            delta = self.store.refresh(view.name, new_df, key=view.key)
        except SchemaEvolutionError:
            if self.on_schema_change != "reset" or not hasattr(self.store, "reset"):
                raise
            logger.warning(
                "view %s: breaking doc schema change — resetting snapshot and re-backfilling "
                "(on_schema_change='reset', reference DROP+CREATE parity)", view.name
            )
            # pin the OLD key set before reset destroys it: keys the
            # redefined view no longer produces must get delete actions,
            # or the sink serves old-schema ghost documents forever
            old = self.store.read(view.name)
            old_keys = (
                old.select(view.key).localCheckpoint(eager=True) if old is not None else None
            )
            self.store.reset(view.name)
            delta = self.store.refresh(view.name, new_df, key=view.key)
            if old_keys is not None:
                doc_t = delta.schema["doc"].dataType
                gone = (
                    old_keys.join(
                        new_df.select(F.col(new_df.columns[0]).cast("string").alias(view.key)),
                        view.key,
                        "left_anti",
                    ).select(
                        F.col(view.key),
                        F.lit(DELETE).alias("op"),
                        F.lit(None).cast(doc_t).alias("doc"),
                    )
                )
                delta = delta.unionByName(gone)
        counts = {r["op"]: r["n"] for r in delta.groupBy("op").agg(F.count("*").alias("n")).collect()}
        self.sink.apply_actions(view.index, delta)
        self.last_stats[view.name] = {
            "upserts": counts.get(UPSERT, 0),
            "deletes": counts.get(DELETE, 0),
        }
        logger.info("refreshed view %s (epoch %s): %s", view.name, epoch_id, self.last_stats[view.name])

    def _cache_shared_deps(self, views: list[ViewDef]) -> list[str]:
        """Cache base tables that >=2 of the recomputing views read, so
        one epoch scans each shared relation ONCE (the first view's plan
        materializes the cache; the rest hit InMemoryRelation). Tables
        above ``shared_scan_max_bytes`` (plan-statistics estimate) are
        skipped — re-scanning beats materializing a huge cache."""
        from collections import Counter

        counts = Counter(t for v in views for t in v.deps)
        cached: list[str] = []
        for t, n in counts.items():
            if n < 2:
                continue
            try:
                size = int(
                    str(
                        self.spark.table(t)
                        ._jdf.queryExecution()
                        .optimizedPlan()
                        .stats()
                        .sizeInBytes()
                    )
                )
                if size > self.shared_scan_max_bytes:
                    continue
                self.spark.catalog.cacheTable(t)
                cached.append(t)
            except Exception:  # unresolvable/temp-less table: just re-scan
                continue
        return cached

    def _refresh_views(self, views: list[ViewDef], epoch_id: int | None = None) -> None:
        shared = self._cache_shared_deps(views) if len(views) > 1 else []
        try:
            if self.max_parallel_views <= 1 or len(views) <= 1:
                for v in views:
                    self._refresh_one(v, epoch_id)
                return
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(self.max_parallel_views, len(views))) as pool:
                futures = [pool.submit(self._refresh_one, v, epoch_id) for v in views]
                for f in futures:
                    f.result()  # re-raise worker exceptions
        finally:
            for t in shared:
                try:
                    self.spark.catalog.uncacheTable(t)
                except Exception:
                    pass

    # -- setup / backfill (reference Sinker.setup, sinker.py:37-43) -------
    def backfill(self, index_bodies: dict[str, dict | None] | None = None) -> None:
        """Materialize every view and push the full snapshot as upserts
        (reference backfill_stream, sinker.py:60-72). When ``index_bodies``
        is given (index name → parsed ``{index}.json`` or None), each
        view's sink index is dropped and re-created with its mappings and
        settings first — reference recreate_index, sinker.py:74-86."""
        if index_bodies is not None and hasattr(self.sink, "recreate_index"):
            for v in self.views.values():
                self.sink.recreate_index(v.index, index_bodies.get(v.index))
        self._derive_sql_doctrees()
        self._refresh_views(list(self.views.values()))
        # seed lane states at the snapshot point (the catalog tables the
        # backfill just read) — the only moment the "fact == snapshot"
        # and "fact mirrors applied CDC" contracts coincide, so the
        # first CDC batch folds exactly once even on a live table
        for v in self.views.values():
            if self._has_lane(v):
                self._rebuild_lane_states(v)

    def _derive_sql_doctrees(self) -> None:
        """Opt-in (ViewDef.sql_doctree) SQL→doc-tree derivation
        (ivm_doc_sql): views whose SQL fits the doc grammar get the
        fully-incremental lane; the rest keep the targeted/recompute
        lanes with a logged reason. Needs the catalog registered, so it
        runs at backfill and lazily before the first CDC batch."""
        for v in self.views.values():
            if not getattr(v, "sql_doctree", False) or v.sql is None:
                continue
            if v.doctree is not None or getattr(v, "_sql_doc_attempted", False):
                continue
            v._sql_doc_attempted = True
            from sinker_spark.ivm_doc_sql import derive_sql_doctree

            sd = derive_sql_doctree(self.spark, v.sql)
            if sd is None:
                logger.warning(
                    "view %s: sql_doctree requested but the SQL is outside "
                    "the doc-tree grammar — recompute lanes apply", v.name,
                )
                continue
            v.doctree = sd.spec
            v._sql_doc = sd
            logger.info("view %s: derived doc-tree lane from SQL (%s)",
                        v.name, sorted(sd.spec.all_tables()))

    # -- one micro-batch (reference Runner.iterate, runner.py:73-117) -----
    def dirty_views(self, changed_tables: set[str]) -> list[ViewDef]:
        """A5-A7: dependency-set intersection replaces triggers+todo.
        A view whose own snapshot changed (MV INSERTs in the slot) doesn't
        re-dirty itself — parity with the reference's trigger scope."""
        return [v for v in self.views.values() if v.deps & changed_tables]

    def process_cdc_batch(self, cdc: DataFrame, epoch_id: int | None = None) -> None:
        """Recompute+diff lane. The only driver-side collect here is the
        distinct TABLE NAMES in the batch (schema-bounded, a handful of
        rows); changed IDS stay distributed — targeted-refresh hooks get
        per-table one-column DataFrames and resolve scopes with
        semi-joins, so a backfill-sized batch (availableNow replay) never
        materializes its keys on the driver."""
        # the parsed batch is re-filtered by every lane below (eligibility
        # probes, per-table slices, before-image splits): persist it once
        # per epoch instead of re-parsing the raw feed each time
        cdc = cdc.persist()
        try:
            self._process_cdc_batch(cdc, epoch_id)
        finally:
            cdc.unpersist()
        if self.maintenance is not None:
            self._epochs_since_maintenance += 1
            if self._epochs_since_maintenance >= self.maintenance.every_n_epochs:
                self._epochs_since_maintenance = 0
                self.maintain()

    def maintain(self) -> dict:
        """One maintenance sweep (normally invoked by the every-N-epochs
        policy; callable directly for on-demand hygiene):

        1. snapshot-store version GC — ``vacuum(keep_versions)`` on every
           relation under the store root (view snapshots AND the
           per-view lane markers, which gain one version per batch);
           stores without versioning (bucketed: in-place overwrite) have
           no vacuum and skip;
        2. keyed lane-state bucket compaction — buckets fragmented past
           ``max_files_per_bucket`` are rewritten to one file each, then
           the owning view's replay-guard marker is refreshed so the
           compaction's version bump is not read as a torn fold. A view
           whose states ALREADY mismatch the marker (genuine tear) is
           skipped: the lane fallback must repair it first, and marker
           rewriting here would mask the tear.

        Returns ``{"vacuumed": {name: n_dropped}, "compacted":
        {view: n_buckets}}`` for observability/tests.
        """
        import os as _os

        report: dict = {"vacuumed": {}, "compacted": {}}
        pol = self.maintenance
        if pol is None:
            return report
        vac = getattr(self.store, "vacuum", None)
        if vac is not None and _os.path.isdir(self.store.root):
            for name in sorted(_os.listdir(self.store.root)):
                if name.startswith("__keyed") or not _os.path.isdir(
                    _os.path.join(self.store.root, name)
                ):
                    continue
                dropped = vac(name, keep_last=pol.keep_versions)
                if dropped:
                    report["vacuumed"][name] = len(dropped)
        for view in self.views.values():
            names = [n for n in self._marker_state_names(view) if self.keyed.exists(n)]
            if not names:
                continue
            marker = self._read_lane_marker(view)
            cutoff = None
            if marker is not None:
                cutoff, versions, _fp = marker
                if versions and any(
                    self._state_version(n) != v for n, v in versions.items()
                ):
                    logger.warning(
                        "maintain: view %s lane states mismatch the replay marker "
                        "(torn) — skipping compaction until the fallback repairs",
                        view.name,
                    )
                    continue
            n_buckets = 0
            for n in names:
                n_buckets += len(self.keyed.compact(n, pol.max_files_per_bucket))
            if n_buckets:
                if marker is not None:
                    self._write_lane_marker(view, cutoff)
                report["compacted"][view.name] = n_buckets
        if report["vacuumed"] or report["compacted"]:
            logger.info("maintenance sweep: %s", report)
        return report

    def _stale_spec_views(self) -> list[ViewDef]:
        """Views whose STORED replay marker records a different lane-spec
        fingerprint than the current definition — a redefinition adopted
        by a fresh engine over an existing store. Without this check a
        redefined view heals only when its deps next see traffic; if
        they never do, the sink serves the OLD definition's documents
        forever (found by tools/soak_longhaul.py: an evolution step whose
        subsequent batch touched none of the redrawn view's tables).
        Checked once per view per engine lifetime — the definition
        cannot change within one instance, and the healing fallback
        rewrites the marker with the new fingerprint. Views without a
        marker (no lane states) keep the documented contract:
        redefinition requires a backfill (reference DROP+CREATE)."""
        out = []
        for v in self.views.values():
            if v.name in self._spec_checked:
                continue
            self._spec_checked.add(v.name)
            marker = self._read_lane_marker(v)
            if marker is not None and marker[2] is not None and (
                marker[2] != self._lane_spec_fp(v)
            ):
                out.append(v)
        return out

    def _process_cdc_batch(self, cdc: DataFrame, epoch_id: int | None = None) -> None:
        self._derive_sql_doctrees()  # streaming-without-backfill opt-ins
        # collect_set dedups map-side: one single-stage job per batch
        # where select().distinct() paid a shuffle (2-3 jobs under AQE)
        changed = set(cdc.agg(F.collect_set("table")).first()[0])
        if not changed:
            return
        dirty = self.dirty_views(changed)
        stale = self._stale_spec_views()
        if stale:
            # force-route redefined views THIS batch even when none of
            # their deps changed: the lane guard declines on the
            # fingerprint mismatch and the fallback retracts the old
            # definition's documents
            have = {v.name for v in dirty}
            dirty = dirty + [v for v in stale if v.name not in have]
        ids = None
        if any(v.affected_keys is not None for v in dirty):
            # one shared distinct pass, cached because every hook slices it
            ids = (
                cdc.select("table", F.col("id").cast("string").alias("id"))
                .distinct()
                .persist()
            )
            changed_ids: dict[str, DataFrame] = {
                t: ids.where(F.col("table") == F.lit(t)).select("id") for t in changed
            }
        else:
            changed_ids = {}

        full, targeted, lane_repair = [], [], []
        # per-view routing (lane folds + scope hooks) touches only
        # view-local state — fan it out on the same per-view thread-pool
        # contract the recompute path uses (reference parity,
        # runner.py:44-50: Spark jobs submitted from separate threads run
        # concurrently; exceptions re-raise on future.result()). Serial
        # when max_parallel_views == 1 (default).
        if self.max_parallel_views > 1 and len(dirty) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(self.max_parallel_views, len(dirty))
            ) as pool:
                routed = list(pool.map(
                    lambda v: self._route_one(v, cdc, changed, changed_ids, epoch_id),
                    dirty,
                ))
        else:
            routed = [self._route_one(v, cdc, changed, changed_ids, epoch_id) for v in dirty]
        for v, (kind, scope) in zip(dirty, routed):
            if kind == "repair":
                lane_repair.append(v)
            elif kind == "targeted":
                targeted.append((v, scope))
            elif kind == "full":
                full.append((v, scope))
        self._refresh_views([v for v, _ in full], epoch_id)
        for v, scope in targeted:
            self._targeted_refresh_one(v, scope, epoch_id)
        if lane_repair:
            batch_max_lsn = (
                cdc.agg(F.max("lsn")).collect()[0][0] if "lsn" in cdc.columns else None
            )
            for v in lane_repair:
                self._lane_fallback_refresh(v, epoch_id, max_lsn=batch_max_lsn)
        if ids is not None:
            ids.unpersist()

    def _route_one(self, v: ViewDef, cdc: DataFrame, changed: set,
                   changed_ids: dict, epoch_id: int | None):
        """Route ONE dirty view for this batch: try its delta lane (which
        completes the refresh in place when it folds), else classify for
        the shared downstream passes. Returns ("done"|"repair"|
        "targeted"|"full", scope)."""
        # delta-aggregate lane: fold the batch into stored aggregate
        # state (O(batch), no recompute) — eligible when the only
        # changed dependency is the declared fact table and the batch
        # carries the before-images the fold needs; otherwise fall
        # through to the authoritative lanes below
        if v.agg is not None and (changed & v.deps) <= {v.agg.table}:
            if self._delta_agg_refresh(v, cdc, epoch_id):
                return ("done", None)
        # delta-join lane: bilinear-rule refresh for two-table join
        # views — same eligibility contract as the aggregate lane
        if v.join is not None and (changed & v.deps) <= {v.join.table_a, v.join.table_b}:
            if self._delta_join_refresh(v, cdc, epoch_id):
                return ("done", None)
        # composed lane: aggregate over a join — join delta feeds the
        # aggregate fold through signed multiplicities
        if v.joinagg is not None and (changed & v.deps) <= {v.joinagg.table_a, v.joinagg.table_b}:
            if self._join_agg_refresh(v, cdc, epoch_id):
                return ("done", None)
        # n-way join chain: the bilinear rule cascaded through
        # stored intermediate join states
        if v.joinchain is not None and (changed & v.deps) <= set(v.joinchain.tables):
            if self._join_chain_refresh(v, cdc, epoch_id):
                return ("done", None)
        # nested-document lane: touched parents re-serve their docs
        # from the parent/child states — no base-table rescan
        if v.nesteddoc is not None and (changed & v.deps) <= {
            v.nesteddoc.parent_table, v.nesteddoc.child_table,
        }:
            if self._nested_doc_refresh(v, cdc, epoch_id):
                return ("done", None)
        # doc-tree lane: the complete flagship shape (parent + dim
        # chain + child arrays with element dims) — dim deltas walk
        # reverse indexes to the affected docs, pure delta fold
        if v.doctree is not None and (changed & v.deps) <= v.doctree.all_tables():
            if self._doctree_refresh(v, cdc, epoch_id):
                return ("done", None)
        # distinct-count lanes: exact=True folds signed support
        # counts (delete-maintainable, before-images required);
        # exact=False MAX-merges HLL registers (monotone —
        # deletes/updates fall back)
        if v.distinct is not None and (changed & v.deps) <= {v.distinct.table}:
            refresh = (
                self._exact_distinct_refresh if v.distinct.exact else self._hll_distinct_refresh
            )
            if refresh(v, cdc, epoch_id):
                return ("done", None)
        # Bloom membership lane: INSERT-only batches bit_or into the
        # stored word relation (monotone — deletes/updates fall back)
        if v.membership is not None and (changed & v.deps) <= {v.membership.table}:
            if self._bloom_membership_refresh(v, cdc, epoch_id):
                return ("done", None)
        # top-k lane: buffered top-(k+buffer) fold; buffer-exhausted
        # groups heal via a key-scoped recompute inside the lane
        if v.topk is not None and (changed & v.deps) <= {v.topk.table}:
            if self._topk_refresh(v, cdc, epoch_id):
                return ("done", None)
        # a lane view that could not fold this batch: the generic
        # recompute lanes would leave the lane states (and the doc
        # snapshot the diff trusts) stale — route through the
        # authoritative repair instead
        if self._has_lane(v):
            return ("repair", None)
        # each view's hook sees only the changed tables it depends on
        if v.affected_rows_keys is not None:
            rows = cdc.where(F.col("table").isin(*sorted(v.deps)))
            scope = v.affected_rows_keys(self.spark, rows)
        elif v.affected_keys is not None:
            relevant = {t: ids for t, ids in changed_ids.items() if t in v.deps}
            scope = v.affected_keys(self.spark, relevant)
        else:
            scope = None
        return ("targeted", scope) if scope is not None else ("full", scope)

    def _delta_agg_refresh(self, view: ViewDef, cdc: DataFrame, epoch_id: int | None) -> bool:
        """Delta-maintenance lane for keyed-aggregate views (ivm_delta):
        fold the batch's row images into the stored (count, sums) state
        and emit upserts/deletes for the touched groups only — O(batch)
        compute, never a fact scan. Returns False (caller falls back to
        the recompute lane) when a delete/update arrives without its
        before-image, which the signed fold cannot process.

        State initialization reads the CURRENT fact table, so the lane
        assumes the stream starts at the snapshot point (the same
        backfill-then-stream contract the document lanes use); the state
        snapshot (``{view}__aggstate``) keeps DECIMAL sums exact across
        restarts."""
        spec = view.agg
        rows = cdc.where(F.col("table") == spec.table)
        torn, rows, batch_max_lsn = self._lane_guard(view, rows)
        if torn:
            return False
        has_before = "payload_before" in cdc.columns
        mutating = F.col("op").isin("DELETE", "UPDATE")
        if has_before:
            unfoldable = rows.where(mutating & F.col("payload_before").isNull())
        else:
            unfoldable = rows.where(mutating)
        if unfoldable.limit(1).count():
            return False

        def parsed(col: str, op: str) -> DataFrame:
            return (
                rows.where(F.col(col).isNotNull())
                .where(F.col("op").isin(*(["INSERT", "UPDATE"] if op == ivm_delta.INSERT else ["DELETE", "UPDATE"])))
                .select(F.from_json(F.col(col), spec.row_schema).alias("r"))
                .select("r.*")
                .withColumn(ivm_delta.OP_COL, F.lit(op))
            )

        batch = parsed("payload", ivm_delta.INSERT)
        if has_before:
            batch = batch.unionByName(parsed("payload_before", ivm_delta.DELETE))

        state, stale = self._checked_state(
            f"{view.name}__aggstate",
            [
                *spec.keys,
                ivm_delta._CNT,
                *spec.sums,
                *[ivm_delta._nn(s) for s in spec.sums],
                *spec.maxes,
                *spec.mins,
            ],
        )
        if stale:
            return False
        if state is None:
            state = ivm_delta.initial_agg_state(
                self.spark.table(spec.table), spec.keys, spec.sums, spec.maxes, spec.mins
            )
        n_dirty = 0
        if spec.maxes or spec.mins:
            # hybrid fold: extremes are exact under inserts; a delete
            # reaching a stored extreme marks the group for a key-scoped
            # recompute (healed here, inside the lane — same contract as
            # the top-k heal: the catalog fact mirrors the applied CDC)
            new_state, dirty = ivm_delta.fold_agg_minmax(
                state, batch, spec.keys, spec.sums, spec.maxes, spec.mins
            )
            n_dirty = dirty.count()
            if n_dirty:
                new_state = ivm_delta.recompute_agg_groups(
                    new_state,
                    self.spark.table(spec.table),
                    dirty,
                    spec.keys,
                    spec.sums,
                    spec.maxes,
                    spec.mins,
                )
        else:
            new_state = ivm_delta.apply_agg_delta(state, batch, spec.keys, spec.sums)
        new_state = new_state.localCheckpoint(eager=True)  # pin before the store swap

        group_id = F.concat_ws("|", *[F.col(k).cast("string") for k in spec.keys])
        touched = batch.select(*spec.keys).distinct()
        doc_view = new_state.select(
            *spec.keys,
            F.col(ivm_delta._CNT).alias("n_rows"),
            # SQL parity: SUM over zero non-null inputs serves NULL, not
            # the fold's additive-identity 0 (outer-join re-pad case)
            *[
                F.when(F.col(ivm_delta._nn(s)) > 0, F.col(s))
                .otherwise(F.lit(None))
                .cast("double")
                .alias(s)
                for s in spec.sums
            ],
            *[F.col(m).cast("double").alias(m) for m in spec.maxes],
            *[F.col(m).cast("double").alias(m) for m in spec.mins],
        )
        # HAVING: served set = passing groups only. Evaluated on the
        # doc-visible values (post NULL-ification, post double cast) for
        # parity with the recompute lane's SQL HAVING. Deletes below are
        # touched − served, so a group crossing OUT of the predicate
        # retracts its doc even though it stays in state.
        served = doc_view.where(F.expr(spec.having)) if spec.having else doc_view
        upserts = ivm_delta.null_safe_join(served, touched, spec.keys, "left_semi").select(
            group_id.alias(view.key),
            F.lit(UPSERT).alias("op"),
            F.struct(*[F.col(c) for c in doc_view.columns]).alias("doc"),
        )
        doc_type = upserts.schema["doc"].dataType
        deletes = ivm_delta.null_safe_join(touched, served, spec.keys, "left_anti").select(
            group_id.alias(view.key),
            F.lit(DELETE).alias("op"),
            F.lit(None).cast(doc_type).alias("doc"),
        )
        actions = upserts.unionByName(deletes)
        counts = self._apply_counted(view, actions)

        self._write_agg_state(view, new_state)
        self._write_lane_marker(view, batch_max_lsn)
        self.last_stats[view.name] = {
            "upserts": counts.get(UPSERT, 0),
            "deletes": counts.get(DELETE, 0),
            "delta_agg": 1,
            **({"minmax_dirty": n_dirty} if (spec.maxes or spec.mins) else {}),
        }
        logger.info("delta-agg refreshed view %s (epoch %s): %s", view.name, epoch_id,
                    self.last_stats[view.name])
        return True

    def _topk_refresh(self, view: ViewDef, cdc: DataFrame, epoch_id: int | None) -> bool:
        """Top-k maintenance lane (ivm_topk): fold the batch into the
        buffered top-(k+buffer) row state + delta-maintained group
        totals, heal buffer-exhausted groups with a recompute scoped to
        just those group keys (against the catalog fact table, which the
        lane — like every recompute lane — assumes mirrors the applied
        CDC), and emit one ranked-array document per touched group.
        Returns False when a delete/update arrives without its
        before-image."""
        from sinker_spark import ivm_topk

        spec = view.topk
        rows = cdc.where(F.col("table") == spec.table)
        torn, rows, batch_max_lsn = self._lane_guard(view, rows)
        if torn:
            return False
        has_before = "payload_before" in cdc.columns
        mutating = F.col("op").isin("DELETE", "UPDATE")
        if has_before:
            unfoldable = rows.where(mutating & F.col("payload_before").isNull())
        else:
            unfoldable = rows.where(mutating)
        if unfoldable.limit(1).count():
            return False

        def parsed(col: str, op: str) -> DataFrame:
            return (
                rows.where(F.col(col).isNotNull())
                .where(F.col("op").isin(*(["INSERT", "UPDATE"] if op == ivm_delta.INSERT else ["DELETE", "UPDATE"])))
                .select(F.from_json(F.col(col), spec.row_schema).alias("r"))
                .select("r.*")
                .withColumn(ivm_delta.OP_COL, F.lit(op))
            )

        batch = parsed("payload", ivm_delta.INSERT)
        if has_before:
            batch = batch.unionByName(parsed("payload_before", ivm_delta.DELETE))

        fact_cols = [c for c in batch.columns if c != ivm_delta.OP_COL]
        rows_state, rows_stale = self._checked_state(f"{view.name}__topkrows", fact_cols)
        counts_state, counts_stale = self._checked_state(
            f"{view.name}__topkcounts", [*spec.keys, ivm_topk._N]
        )
        if rows_stale or counts_stale:
            return False
        if rows_state is None or counts_state is None:
            rows_state, counts_state = ivm_topk.initial_topk_state(
                self.spark.table(spec.table).select(*fact_cols),
                spec.keys,
                spec.order_col,
                spec.id_col,
                spec.k,
                spec.buffer,
            )

        new_rows, new_counts, dirty = ivm_topk.apply_topk_delta(
            rows_state, counts_state, batch, spec.keys, spec.order_col, spec.id_col,
            spec.k, spec.buffer,
        )
        n_dirty = dirty.count()
        if n_dirty:
            new_rows = ivm_topk.recompute_groups(
                new_rows,
                self.spark.table(spec.table),
                dirty,
                spec.keys,
                spec.order_col,
                spec.id_col,
                spec.k,
                spec.buffer,
            )
        new_rows = new_rows.localCheckpoint(eager=True)
        new_counts = new_counts.localCheckpoint(eager=True)

        group_id = F.concat_ws("|", *[F.col(k).cast("string") for k in spec.keys])
        touched = batch.select(*spec.keys).distinct()
        served = ivm_topk.topk_view(new_rows, spec.keys, spec.order_col, spec.id_col, spec.k)
        docs = served.groupBy(*spec.keys).agg(
            F.sort_array(
                F.collect_list(F.struct("rank", spec.id_col, spec.order_col))
            ).alias("top")
        )
        sink_doc = F.struct(*[F.col(k).alias(k) for k in spec.keys], F.col("top"))
        upserts = ivm_delta.null_safe_join(docs, touched, spec.keys, "left_semi").select(
            group_id.alias(view.key), F.lit(UPSERT).alias("op"), sink_doc.alias("doc")
        )
        doc_type = upserts.schema["doc"].dataType
        deletes = ivm_delta.null_safe_join(touched, new_counts, spec.keys, "left_anti").select(
            group_id.alias(view.key),
            F.lit(DELETE).alias("op"),
            F.lit(None).cast(doc_type).alias("doc"),
        )
        actions = upserts.unionByName(deletes)
        counts = self._apply_counted(view, actions)

        self._write_topk_states(view, new_rows, new_counts)
        self._write_lane_marker(view, batch_max_lsn)
        self.last_stats[view.name] = {
            "upserts": counts.get(UPSERT, 0),
            "deletes": counts.get(DELETE, 0),
            "topk": 1,
            "dirty_groups": n_dirty,
        }
        logger.info("top-k refreshed view %s (epoch %s): %s", view.name, epoch_id,
                    self.last_stats[view.name])
        return True

    def _hll_distinct_refresh(self, view: ViewDef, cdc: DataFrame, epoch_id: int | None) -> bool:
        """HLL register lane for approximate distinct-count views
        (ivm_hll): MAX-merge the batch's inserted values into stored
        per-(group, bucket) registers and emit upserted estimates for the
        touched groups only — O(batch) compute, never a fact scan, and
        idempotent under replay (MAX-merge). Registers are monotone, so
        a batch containing DELETE or UPDATE rows for the fact table
        returns False and the recompute lane rebuilds registers exactly.

        Same snapshot-point initialization contract as the delta-agg
        lane; state persists as ``{view}__hllstate`` keyed by
        ``group|bucket``."""
        from sinker_spark import ivm_hll

        spec = view.distinct
        rows = cdc.where(F.col("table") == spec.table)
        if rows.where(F.col("op").isin("DELETE", "UPDATE")).limit(1).count():
            return False

        batch = (
            rows.where(F.col("payload").isNotNull())
            .select(F.from_json(F.col("payload"), spec.row_schema).alias("r"))
            .select("r.*")
            .withColumn(ivm_delta.OP_COL, F.lit(ivm_delta.INSERT))
        )

        state, stale = self._checked_state(
            f"{view.name}__hllstate", [*spec.keys, "bucket", "r"]
        )
        if stale:
            return False
        if state is None:
            state = ivm_hll.initial_hll_state(
                self.spark.table(spec.table), spec.keys, spec.value_col
            )
        new_state = ivm_hll.apply_hll_delta(
            state, batch, spec.keys, spec.value_col
        ).localCheckpoint(eager=True)  # pin before the store swap

        group_id = F.concat_ws("|", *[F.col(k).cast("string") for k in spec.keys])
        touched = batch.select(*spec.keys).distinct()
        estimates = ivm_hll.hll_estimate(
            ivm_delta.null_safe_join(new_state, touched, spec.keys, "left_semi"), spec.keys
        )
        upserts = estimates.select(
            group_id.alias(view.key),
            F.lit(UPSERT).alias("op"),
            F.struct(
                *[F.col(k).alias(k) for k in spec.keys],
                F.col("n_distinct_est"),
            ).alias("doc"),
        )
        n_up = self._apply_counted(view, upserts).get(UPSERT, 0)

        self._write_hll_state(view, new_state)
        self.last_stats[view.name] = {"upserts": n_up, "deletes": 0, "hll_distinct": 1}
        logger.info(
            "hll-distinct refreshed view %s (epoch %s): %s",
            view.name, epoch_id, self.last_stats[view.name],
        )
        return True

    def _exact_distinct_refresh(self, view: ViewDef, cdc: DataFrame, epoch_id: int | None) -> bool:
        """Exact distinct-count lane (DistinctViewSpec(exact=True)):
        fold the batch's row images into stored per-(group, value)
        support counts (ivm_delta.apply_distinct_delta) and serve
        ``(keys…, n_rows, n_distinct)`` for the touched groups —
        O(batch) compute, never a fact scan, and unlike the HLL lane
        fully delete-maintainable: a value leaves the distinct set
        exactly when its support reaches 0, a group's doc retracts when
        its last row does. The signed fold demands before-images on
        DELETE/UPDATE and replay protection (the ``__dcstate`` entry in
        the lane marker), same contract as the delta-agg lane; batches
        violating it return False → authoritative fallback."""
        spec = view.distinct
        rows = cdc.where(F.col("table") == spec.table)
        torn, rows, batch_max_lsn = self._lane_guard(view, rows)
        if torn:
            return False
        has_before = "payload_before" in cdc.columns
        mutating = F.col("op").isin("DELETE", "UPDATE")
        if has_before:
            unfoldable = rows.where(mutating & F.col("payload_before").isNull())
        else:
            unfoldable = rows.where(mutating)
        if unfoldable.limit(1).count():
            return False

        def parsed(col: str, op: str) -> DataFrame:
            return (
                rows.where(F.col(col).isNotNull())
                .where(F.col("op").isin(*(["INSERT", "UPDATE"] if op == ivm_delta.INSERT else ["DELETE", "UPDATE"])))
                .select(F.from_json(F.col(col), spec.row_schema).alias("r"))
                .select("r.*")
                .withColumn(ivm_delta.OP_COL, F.lit(op))
            )

        batch = parsed("payload", ivm_delta.INSERT)
        if has_before:
            batch = batch.unionByName(parsed("payload_before", ivm_delta.DELETE))

        state, stale = self._checked_state(
            f"{view.name}__dcstate", [*spec.keys, ivm_delta._VAL, ivm_delta._CNT]
        )
        if stale:
            return False
        if state is None:
            state = ivm_delta.initial_distinct_state(
                self.spark.table(spec.table), spec.keys, spec.value_col
            )
        new_state = ivm_delta.apply_distinct_delta(
            state, batch, spec.keys, spec.value_col
        ).localCheckpoint(eager=True)  # pin before the store swap

        group_id = F.concat_ws("|", *[F.col(k).cast("string") for k in spec.keys])
        touched = batch.select(*spec.keys).distinct()
        served = ivm_delta.distinct_counts(new_state, spec.keys)
        upserts = ivm_delta.null_safe_join(served, touched, spec.keys, "left_semi").select(
            group_id.alias(view.key),
            F.lit(UPSERT).alias("op"),
            F.struct(*[F.col(c) for c in served.columns]).alias("doc"),
        )
        doc_type = upserts.schema["doc"].dataType
        deletes = ivm_delta.null_safe_join(touched, served, spec.keys, "left_anti").select(
            group_id.alias(view.key),
            F.lit(DELETE).alias("op"),
            F.lit(None).cast(doc_type).alias("doc"),
        )
        actions = upserts.unionByName(deletes)
        counts = self._apply_counted(view, actions)

        self._write_dc_state(view, new_state)
        self._write_lane_marker(view, batch_max_lsn)
        self.last_stats[view.name] = {
            "upserts": counts.get(UPSERT, 0),
            "deletes": counts.get(DELETE, 0),
            "exact_distinct": 1,
        }
        logger.info(
            "exact-distinct refreshed view %s (epoch %s): %s",
            view.name, epoch_id, self.last_stats[view.name],
        )
        return True

    def _bloom_membership_refresh(self, view: ViewDef, cdc: DataFrame, epoch_id: int | None) -> bool:
        """Bloom membership lane (ivm_bloom): bit_or the batch's inserted
        values into the stored word relation and upsert only the words
        whose bits changed — O(batch) compute, never a fact scan, and
        idempotent under replay (bit_or). Bits are monotone, so a batch
        containing DELETE or UPDATE rows returns False and the recompute
        lane rebuilds the words exactly.

        The view's documents ARE the filter: (word_idx, word) rows a
        consumer broadcast-joins to probe (operators/bloom.probe). State
        persists as ``{view}__bloomstate`` keyed by word_idx."""
        from sinker_spark import ivm_bloom

        spec = view.membership
        rows = cdc.where(F.col("table") == spec.table)
        if rows.where(F.col("op").isin("DELETE", "UPDATE")).limit(1).count():
            return False

        batch = (
            rows.where(F.col("payload").isNotNull())
            .select(F.from_json(F.col("payload"), spec.row_schema).alias("r"))
            .select("r.*")
            .withColumn(ivm_delta.OP_COL, F.lit(ivm_delta.INSERT))
        )

        state_name = f"{view.name}__bloomstate"
        packed = self.store.read(state_name)
        if packed is None:
            state = ivm_bloom.initial_bloom_state(
                self.spark.table(spec.table), spec.value_col, spec.m_bits
            )
        else:
            state = packed.select("doc.*")
        new_state = ivm_bloom.apply_bloom_delta(
            state, batch, spec.value_col, spec.m_bits
        ).localCheckpoint(eager=True)  # pin before the store swap

        # upsert only words the batch touched (word set of the batch keys)
        touched = (
            ivm_bloom.apply_bloom_delta(
                new_state.limit(0), batch, spec.value_col, spec.m_bits
            )
            .select("word_idx")
            .distinct()
        )
        changed_words = new_state.join(touched, "word_idx", "left_semi")
        upserts = changed_words.select(
            F.col("word_idx").cast("string").alias(view.key),
            F.lit(UPSERT).alias("op"),
            F.struct("word_idx", "word").alias("doc"),
        )
        n_up = self._apply_counted(view, upserts).get(UPSERT, 0)

        self._write_bloom_state(view, new_state)
        self.last_stats[view.name] = {"upserts": n_up, "deletes": 0, "bloom_membership": 1}
        logger.info(
            "bloom-membership refreshed view %s (epoch %s): %s",
            view.name, epoch_id, self.last_stats[view.name],
        )
        return True

    def _delta_join_refresh(self, view: ViewDef, cdc: DataFrame, epoch_id: int | None) -> bool:
        """Delta-maintenance lane for two-table join views
        (ivm_delta.join_delta, the bilinear rule): base relations are
        kept as multiplicity state alongside the join state, a CDC batch
        produces the signed join delta, and actions are emitted for the
        touched doc keys only — O(|Δ|·fan-out) compute, no join-product
        recompute. Same before-image contract and snapshot-point
        initialization as the aggregate lane; returns False to fall back
        to the recompute lane when before-images are missing."""
        spec = view.join
        rows = cdc.where(F.col("table").isin(spec.table_a, spec.table_b))
        torn, rows, batch_max_lsn = self._lane_guard(view, rows)
        if torn:
            return False
        has_before = "payload_before" in cdc.columns
        mutating = F.col("op").isin("DELETE", "UPDATE")
        if has_before:
            unfoldable = rows.where(mutating & F.col("payload_before").isNull())
        else:
            unfoldable = rows.where(mutating)
        if unfoldable.limit(1).count():
            return False

        def parsed(table: str, schema: str, col: str, op: str) -> DataFrame:
            return (
                rows.where(F.col("table") == table)
                .where(F.col(col).isNotNull())
                .where(F.col("op").isin(*(["INSERT", "UPDATE"] if op == ivm_delta.INSERT else ["DELETE", "UPDATE"])))
                .select(F.from_json(F.col(col), schema).alias("r"))
                .select("r.*")
                .withColumn(ivm_delta.OP_COL, F.lit(op))
            )

        def batch_for(table: str, schema: str) -> DataFrame:
            b = parsed(table, schema, "payload", ivm_delta.INSERT)
            if has_before:
                b = b.unionByName(parsed(table, schema, "payload_before", ivm_delta.DELETE))
            return b

        a_ch = batch_for(spec.table_a, spec.row_schema_a)
        b_ch = batch_for(spec.table_b, spec.row_schema_b)

        a_cols = self._schema_cols(spec.row_schema_a)
        b_cols = self._schema_cols(spec.row_schema_b)
        j_cols = list(dict.fromkeys([*spec.on, *a_cols, *b_cols]))
        if spec.how in ("left", "full"):
            j_cols.append(ivm_delta._MATCHED)
        a_state, a_stale = self._checked_state(
            f"{view.name}__a_state", [*a_cols, ivm_delta._MULT]
        )
        b_state, b_stale = self._checked_state(
            f"{view.name}__b_state", [*b_cols, ivm_delta._MULT]
        )
        j_state, j_stale = self._checked_state(
            f"{view.name}__join_state", [*j_cols, ivm_delta._MULT]
        )
        if a_stale or b_stale or j_stale:
            return False
        if a_state is None or b_state is None or j_state is None:
            a_tab, b_tab = self.spark.table(spec.table_a), self.spark.table(spec.table_b)
            a_state = ivm_delta.relation_state(a_tab)
            b_state = ivm_delta.relation_state(b_tab)
            init_fn = {
                "inner": ivm_delta.initial_join_state,
                "left": ivm_delta.initial_left_join_state,
                "full": ivm_delta.initial_full_join_state,
            }[spec.how]
            j_state = init_fn(a_tab, b_tab, spec.on)

        delta_fn = {
            "inner": ivm_delta.join_delta,
            "left": ivm_delta.left_join_delta,
            "full": ivm_delta.full_join_delta,
        }[spec.how]
        delta = delta_fn(a_state, b_state, a_ch, b_ch, spec.on)
        delta = delta.localCheckpoint(eager=True)  # consumed twice (merge + touched)
        new_j = ivm_delta.apply_join_state(j_state, delta).localCheckpoint(eager=True)
        new_a = ivm_delta.apply_join_state(
            a_state, ivm_delta.changes_to_mult(a_ch)
        ).localCheckpoint(eager=True)
        new_b = ivm_delta.apply_join_state(
            b_state, ivm_delta.changes_to_mult(b_ch)
        ).localCheckpoint(eager=True)

        # doc ids join as concat'd STRINGS, not key_cols tuples: a left-
        # outer padded row has NULL b-side key cols (dropped by
        # concat_ws), and a tuple semi-join would never match the NULLs
        key_id = F.concat_ws("|", *[F.col(k).cast("string") for k in spec.key_cols])
        touched_ids = delta.select(key_id.alias("__doc_id")).distinct()
        jd = new_j.withColumn("__doc_id", key_id)
        data_cols = [c for c in new_j.columns if c != ivm_delta._MULT]
        sink_doc = F.struct(
            *[F.col(c) for c in data_cols], F.col(ivm_delta._MULT).alias("n_rows")
        )
        upserts = jd.join(touched_ids, "__doc_id", "left_semi").select(
            F.col("__doc_id").alias(view.key), F.lit(UPSERT).alias("op"), sink_doc.alias("doc")
        )
        doc_type = upserts.schema["doc"].dataType
        deletes = touched_ids.join(jd, "__doc_id", "left_anti").select(
            F.col("__doc_id").alias(view.key),
            F.lit(DELETE).alias("op"),
            F.lit(None).cast(doc_type).alias("doc"),
        )
        actions = upserts.unionByName(deletes)
        counts = self._apply_counted(view, actions)

        self._write_join_states(view, new_a, new_b, new_j)
        self._write_lane_marker(view, batch_max_lsn)
        self.last_stats[view.name] = {
            "upserts": counts.get(UPSERT, 0),
            "deletes": counts.get(DELETE, 0),
            "delta_join": 1,
        }
        logger.info("delta-join refreshed view %s (epoch %s): %s", view.name, epoch_id,
                    self.last_stats[view.name])
        return True

    def _chain_prefix_cols(self, spec, upto: int) -> list[str]:
        """Column set of the chain prefix J_{upto} = tables[0]⋈…⋈
        tables[upto-1] (order-preserving dedup of the schemas' columns;
        join keys appear once)."""
        cols: list[str] = []
        for i in range(upto):
            for c in self._schema_cols(spec.row_schemas[i]):
                if c not in cols:
                    cols.append(c)
        return cols

    def _join_chain_refresh(self, view: ViewDef, cdc: DataFrame, epoch_id: int | None) -> bool:
        """N-way join-chain lane (JoinChainViewSpec): cascade the
        bilinear rule — stage i's signed delta, expanded back into
        change rows, is the left-side change feed of stage i+1 against
        the stored prefix state J_i and base relation R_{i+1} — so an
        arbitrary-arity inner join refreshes in O(|Δ|·total fan-out)
        with no join product recomputed at any stage. Same before-image
        contract, replay guard and snapshot-point initialization as the
        2-table delta-join lane; returns False → authoritative fallback
        on violations."""
        spec = view.joinchain
        n = len(spec.tables)
        rows = cdc.where(F.col("table").isin(*spec.tables))
        torn, rows, batch_max_lsn = self._lane_guard(view, rows)
        if torn:
            return False
        has_before = "payload_before" in cdc.columns
        mutating = F.col("op").isin("DELETE", "UPDATE")
        if has_before:
            unfoldable = rows.where(mutating & F.col("payload_before").isNull())
        else:
            unfoldable = rows.where(mutating)
        if unfoldable.limit(1).count():
            return False

        def parsed(table: str, schema: str, col: str, op: str) -> DataFrame:
            return (
                rows.where(F.col("table") == table)
                .where(F.col(col).isNotNull())
                .where(F.col("op").isin(*(["INSERT", "UPDATE"] if op == ivm_delta.INSERT else ["DELETE", "UPDATE"])))
                .select(F.from_json(F.col(col), schema).alias("r"))
                .select("r.*")
                .withColumn(ivm_delta.OP_COL, F.lit(op))
            )

        def batch_for(table: str, schema: str) -> DataFrame:
            b = parsed(table, schema, "payload", ivm_delta.INSERT)
            if has_before:
                b = b.unionByName(parsed(table, schema, "payload_before", ivm_delta.DELETE))
            return b

        chs = [batch_for(spec.tables[i], spec.row_schemas[i]) for i in range(n)]

        r_states: list[DataFrame | None] = []
        j_states: list[DataFrame | None] = []  # index k ↔ prefix J_{k+2}
        any_stale = any_missing = False
        for i in range(n):
            st, stale = self._checked_state(
                f"{view.name}__jc_r{i}",
                [*self._schema_cols(spec.row_schemas[i]), ivm_delta._MULT],
            )
            any_stale |= stale
            any_missing |= st is None
            r_states.append(st)
        for k in range(n - 1):
            st, stale = self._checked_state(
                f"{view.name}__jc_j{k + 2}",
                [*self._chain_prefix_cols(spec, k + 2), ivm_delta._MULT],
            )
            any_stale |= stale
            any_missing |= st is None
            j_states.append(st)
        agg_state: DataFrame | None = None
        if spec.keys is not None:
            agg_state, agg_stale = self._checked_state(
                f"{view.name}__jc_agg_state",
                [
                    *spec.keys,
                    ivm_delta._CNT,
                    *spec.sums,
                    *[ivm_delta._nn(s) for s in spec.sums],
                ],
            )
            any_stale |= agg_stale
            any_missing |= agg_state is None
        if any_stale:
            return False
        if any_missing:
            r_states, j_states, agg_state = self._initial_chain_states(spec)

        # cascade: ΔJ2 from the first pair, then each stage's delta feeds
        # the next as op-tagged change rows against the stored prefix
        delta = ivm_delta.join_delta(
            r_states[0], r_states[1], chs[0], chs[1], spec.ons[0]
        ).localCheckpoint(eager=True)
        new_js = [ivm_delta.apply_join_state(j_states[0], delta)]
        for k in range(2, n):
            delta = ivm_delta.join_delta(
                j_states[k - 2],
                r_states[k],
                ivm_delta.join_delta_to_changes(delta),
                chs[k],
                spec.ons[k - 1],
            ).localCheckpoint(eager=True)
            new_js.append(ivm_delta.apply_join_state(j_states[k - 1], delta))
        new_js = [j.localCheckpoint(eager=True) for j in new_js]
        new_rs = [
            ivm_delta.apply_join_state(
                r_states[i], ivm_delta.changes_to_mult(chs[i])
            ).localCheckpoint(eager=True)
            for i in range(n)
        ]

        new_agg: DataFrame | None = None
        if spec.keys is not None:
            # aggregate mode: the final stage's signed delta pipes into
            # the linear aggregate fold (same composition as joinagg)
            new_agg = ivm_delta.apply_agg_delta(
                agg_state, ivm_delta.join_delta_to_changes(delta), spec.keys, spec.sums
            ).localCheckpoint(eager=True)
            group_id = F.concat_ws("|", *[F.col(k).cast("string") for k in spec.keys])
            touched = delta.select(*spec.keys).distinct()
            doc_view = new_agg.select(
                *spec.keys,
                F.col(ivm_delta._CNT).alias("n_rows"),
                # SQL parity: SUM over zero non-null inputs serves NULL
                *[
                    F.when(F.col(ivm_delta._nn(sm)) > 0, F.col(sm))
                    .otherwise(F.lit(None))
                    .cast("double")
                    .alias(sm)
                    for sm in spec.sums
                ],
            )
            served = doc_view.where(F.expr(spec.having)) if spec.having else doc_view
            upserts = ivm_delta.null_safe_join(served, touched, spec.keys, "left_semi").select(
                group_id.alias(view.key),
                F.lit(UPSERT).alias("op"),
                F.struct(*[F.col(c) for c in doc_view.columns]).alias("doc"),
            )
            doc_type = upserts.schema["doc"].dataType
            deletes = ivm_delta.null_safe_join(touched, served, spec.keys, "left_anti").select(
                group_id.alias(view.key),
                F.lit(DELETE).alias("op"),
                F.lit(None).cast(doc_type).alias("doc"),
            )
        else:
            final = new_js[-1]
            key_id = F.concat_ws("|", *[F.col(k).cast("string") for k in spec.key_cols])
            touched_ids = delta.select(key_id.alias("__doc_id")).distinct()
            jd = final.withColumn("__doc_id", key_id)
            data_cols = [c for c in final.columns if c != ivm_delta._MULT]
            sink_doc = F.struct(
                *[F.col(c) for c in data_cols], F.col(ivm_delta._MULT).alias("n_rows")
            )
            upserts = jd.join(touched_ids, "__doc_id", "left_semi").select(
                F.col("__doc_id").alias(view.key), F.lit(UPSERT).alias("op"), sink_doc.alias("doc")
            )
            doc_type = upserts.schema["doc"].dataType
            deletes = touched_ids.join(jd, "__doc_id", "left_anti").select(
                F.col("__doc_id").alias(view.key),
                F.lit(DELETE).alias("op"),
                F.lit(None).cast(doc_type).alias("doc"),
            )
        actions = upserts.unionByName(deletes)
        counts = self._apply_counted(view, actions)

        self._write_chain_states(view, new_rs, new_js, new_agg)
        self._write_lane_marker(view, batch_max_lsn)
        self.last_stats[view.name] = {
            "upserts": counts.get(UPSERT, 0),
            "deletes": counts.get(DELETE, 0),
            "join_chain": 1,
        }
        logger.info("join-chain refreshed view %s (epoch %s): %s", view.name, epoch_id,
                    self.last_stats[view.name])
        return True

    def _nested_doc_refresh(self, view: ViewDef, cdc: DataFrame, epoch_id: int | None) -> bool:
        """Nested-document lane (NestedDocViewSpec): fold the batch into
        the parent/child multiplicity states, then re-serve ONLY the
        touched parents' documents by joining the restricted states
        (ivm_doc.build_docs) — the child array is an order-sorted
        collect over the touched keys' child state rows, so neither
        base table is rescanned and refresh is O(|Δ|·max children per
        touched parent). Same before-image contract, replay guard and
        snapshot-point initialization as the other delta lanes; returns
        False → authoritative fallback on violations."""
        from sinker_spark import ivm_doc

        spec = view.nesteddoc
        rows = cdc.where(F.col("table").isin(spec.parent_table, spec.child_table))
        torn, rows, batch_max_lsn = self._lane_guard(view, rows)
        if torn:
            return False
        has_before = "payload_before" in cdc.columns
        mutating = F.col("op").isin("DELETE", "UPDATE")
        if has_before:
            unfoldable = rows.where(mutating & F.col("payload_before").isNull())
        else:
            unfoldable = rows.where(mutating)
        if unfoldable.limit(1).count():
            return False

        def parsed(table: str, schema: str, col: str, op: str) -> DataFrame:
            return (
                rows.where(F.col("table") == table)
                .where(F.col(col).isNotNull())
                .where(F.col("op").isin(*(["INSERT", "UPDATE"] if op == ivm_delta.INSERT else ["DELETE", "UPDATE"])))
                .select(F.from_json(F.col(col), schema).alias("r"))
                .select("r.*")
                .withColumn(ivm_delta.OP_COL, F.lit(op))
            )

        def batch_for(table: str, schema: str) -> DataFrame:
            b = parsed(table, schema, "payload", ivm_delta.INSERT)
            if has_before:
                b = b.unionByName(parsed(table, schema, "payload_before", ivm_delta.DELETE))
            return b

        # NULL-key rows can never contribute to any document (SQL join
        # equality is null-unsafe): a child with a NULL FK joins no
        # parent, and a NULL parent key is out of the PK contract.
        # Filter them from the fold AND from the initial state (below),
        # so state stays exactly the doc-relevant projection — letting
        # them through would put NULL tuples in the touched set (emitting
        # a spurious DELETE for a doc that never existed) and duplicate
        # rows in the key-local merge (whose semi/anti joins are
        # null-unsafe and cannot address them).
        notnull = F.lit(True)
        for k in spec.on:
            notnull = notnull & F.col(k).isNotNull()
        p_ch = batch_for(spec.parent_table, spec.row_schema_parent).where(notnull)
        c_ch = batch_for(spec.child_table, spec.row_schema_child).where(notnull)

        # states live in the KEY-LOCAL store (bucketed by spec.on):
        # reads AND writes below touch only the batch's keys' buckets —
        # per-batch state I/O is O(touched buckets), never O(|state|)
        p_name, c_name = f"{view.name}__nd_p_state", f"{view.name}__nd_c_state"
        for name, schema in (
            (p_name, spec.row_schema_parent),
            (c_name, spec.row_schema_child),
        ):
            cur = self.keyed.read(name)
            if cur is not None:
                required = {*self._schema_cols(schema), ivm_delta._MULT}
                if required - set(cur.columns):
                    logger.warning(
                        "view state %s lacks columns for the current spec — "
                        "declining to fold so the fallback rebuilds", name,
                    )
                    return False
        if not (self.keyed.exists(p_name) and self.keyed.exists(c_name)):
            p0, c0 = self._initial_nested_doc_states(spec)
            self._write_nested_doc_states(view, p0, c0)

        touched = (
            p_ch.select(*spec.on).unionByName(c_ch.select(*spec.on)).distinct()
        ).localCheckpoint(eager=True)
        p_k = self.keyed.read_for_keys(p_name, touched, spec.on).join(
            touched, spec.on, "left_semi"
        )
        c_k = self.keyed.read_for_keys(c_name, touched, spec.on).join(
            touched, spec.on, "left_semi"
        )
        new_p = ivm_delta.apply_join_state(
            p_k, ivm_delta.changes_to_mult(p_ch)
        ).localCheckpoint(eager=True)
        new_c = ivm_delta.apply_join_state(
            c_k, ivm_delta.changes_to_mult(c_ch)
        ).localCheckpoint(eager=True)

        docs = ivm_doc.build_docs(
            new_p,
            new_c,
            spec.on,
            child_alias=spec.child_alias,
            child_order=spec.child_order,
        )
        doc_id = F.concat_ws("|", *[F.col(k).cast("string") for k in spec.on])
        upserts = docs.select(
            doc_id.alias(view.key),
            F.lit(UPSERT).alias("op"),
            F.struct(*[F.col(c) for c in docs.columns]).alias("doc"),
        )
        doc_type = upserts.schema["doc"].dataType
        deletes = touched.join(new_p, spec.on, "left_anti").select(
            doc_id.alias(view.key),
            F.lit(DELETE).alias("op"),
            F.lit(None).cast(doc_type).alias("doc"),
        )
        actions = upserts.unionByName(deletes)
        counts = self._apply_counted(view, actions)

        # key-local merge: only the touched keys' buckets are rewritten
        self.keyed.merge_for_keys(p_name, touched, new_p, spec.on)
        self.keyed.merge_for_keys(c_name, touched, new_c, spec.on)
        self._write_lane_marker(view, batch_max_lsn)
        self.last_stats[view.name] = {
            "upserts": counts.get(UPSERT, 0),
            "deletes": counts.get(DELETE, 0),
            "nested_doc": 1,
        }
        logger.info("nested-doc refreshed view %s (epoch %s): %s", view.name, epoch_id,
                    self.last_stats[view.name])
        return True

    def _initial_nested_doc_states(self, spec) -> tuple[DataFrame, DataFrame]:
        # NULL-key rows are excluded to mirror the fold's filter (see
        # _nested_doc_refresh): they can never join into a document
        notnull = F.lit(True)
        for k in spec.on:
            notnull = notnull & F.col(k).isNotNull()
        p = self._schema_select(
            self.spark.table(spec.parent_table), spec.row_schema_parent
        ).where(notnull)
        c = self._schema_select(
            self.spark.table(spec.child_table), spec.row_schema_child
        ).where(notnull)
        return ivm_delta.relation_state(p), ivm_delta.relation_state(c)

    def _write_nested_doc_states(self, view: ViewDef, p: DataFrame, c: DataFrame) -> None:
        # full overwrite (init / fallback rebuild) into the KEY-LOCAL
        # store, bucketed by the lane's parent key
        on = view.nesteddoc.on
        self.keyed.write(f"{view.name}__nd_p_state", p, on)
        self.keyed.write(f"{view.name}__nd_c_state", c, on)

    def _doctree_refresh(self, view: ViewDef, cdc: DataFrame, epoch_id: int | None) -> bool:
        """Doc-tree lane (DocTreeViewSpec / ivm_flagship): the COMPLETE
        reference document shape — parent + to-one dim chain + N child
        arrays with per-element dim chains (course_mv.sql:1-26) —
        refreshed as a PURE DELTA FOLD on every constituent table.

        Per relation occurrence the lane keeps a multiplicity state in
        the KEY-LOCAL store (bucketed by that state's own probe key),
        plus one reverse index per to-one hop bucketed by the hop's dim
        key. A batch folds into each state O(its changes); dim deltas
        walk the reverse indexes back to the affected parent keys
        (O(affected docs) bucket-pruned reads — never a scoped
        recompute); documents are re-served by joining the states
        restricted to the reachable keys. State merges run FIRST
        (state-before-action): the walk and serve then read the merged
        files plain, with no per-read change overlay — the walk's
        semantics were post-fold anyway, and the overlay's union+groupBy
        per state read dominated the batch's stage count. Crash
        discipline: a crash between the first merge and the marker write
        leaves state versions ahead of the marker → next delivery reads
        torn → authoritative fallback (the mirror image of the old
        action-first window). Same before-image contract, replay guard
        and fallback behavior as the other delta lanes."""
        import os as _os
        import time as _time

        from sinker_spark import ivm_flagship
        from sinker_spark.ivm_flagship import _notnull, doc_tree_states

        spec = view.doctree
        states = doc_tree_states(spec)
        sdefs = {s.suffix: s for s in states}
        names = {s.suffix: f"{view.name}__dt_{s.suffix}" for s in states}

        # opt-in phase decomposition (SINKER_SPARK_LANE_TIMING=1):
        # surfaces where a batch's wall time goes (parse/fold vs reverse
        # walk vs serve+sink vs state merge) in last_stats["phases"] —
        # the bench's ivm section embeds it so refresh-latency
        # regressions are attributable without a profiler
        _timing = bool(_os.environ.get("SINKER_SPARK_LANE_TIMING"))
        _phases: dict[str, float] = {}
        _tprev = _time.perf_counter()

        def _mark(name: str) -> None:
            nonlocal _tprev
            if _timing:
                now = _time.perf_counter()
                _phases[name] = round(now - _tprev, 3)
                _tprev = now

        # driver-only guard precheck (marker sidecar + version compare —
        # no Spark job); the suppression filter folds into the batch
        # checkpoint and the batch aggregates fuse into ONE stats job
        # below where guard-agg + unfoldable-probe + present-tables ran
        # three driver round-trips each batch
        torn, cutoff = self._lane_guard_precheck(view)
        _mark("guard")
        if torn:
            return False
        rows = cdc.where(F.col("table").isin(*sorted(spec.all_tables())))
        has_lsn = "lsn" in rows.columns
        if cutoff is not None and has_lsn:
            rows = rows.where(F.col("lsn").isNull() | (F.col("lsn") > F.lit(cutoff)))
        # ONE materialization of the (bounded) batch; every per-state
        # change frame below is a lazy from_json slice of it — a leaf
        # inside any downstream plan — instead of a checkpointed frame
        # of its own (2 Spark jobs per base state, r6's parse phase)
        rows = rows.localCheckpoint(eager=True)
        has_before = "payload_before" in cdc.columns
        mutating = F.col("op").isin("DELETE", "UPDATE")
        unfold_cond = (
            mutating & F.col("payload_before").isNull() if has_before else mutating
        )
        stats = rows.agg(
            (F.max("lsn") if has_lsn else F.lit(None)).alias("__mx"),
            F.max(F.when(unfold_cond, F.lit(1))).alias("__unf"),
            F.collect_set("table").alias("__tbl"),
            F.count(F.lit(1)).alias("__n"),
        ).collect()[0]
        # a SMALL batch spread over many checkpoint partitions makes
        # every downstream scan pay one task per partition — and the
        # fold re-scans the batch ~20+ times (per-state change frames,
        # walk probes): measured 24 map stages × 64 tasks each over a
        # 1000-row batch (the 2-branch payload/payload_before union
        # doubles the partition count). Coalesce the CHECKPOINTED frame
        # (narrow, no re-materialization) so each scan is one task; a
        # large batch keeps its partitioning (row-count cutover, not a
        # core-count constant)
        if (stats["__n"] or 0) <= int(
            _os.environ.get("SINKER_SPARK_SMALL_BATCH_ROWS", "250000")
        ):
            rows = rows.coalesce(1)
        batch_max_lsn = (
            max(x for x in (cutoff, stats["__mx"]) if x is not None)
            if (cutoff is not None or stats["__mx"] is not None)
            else None
        )
        if stats["__unf"]:
            return False

        def parsed(table: str, schema: str, col: str, op: str) -> DataFrame:
            return (
                rows.where(F.col("table") == table)
                .where(F.col(col).isNotNull())
                .where(F.col("op").isin(*(["INSERT", "UPDATE"] if op == ivm_delta.INSERT else ["DELETE", "UPDATE"])))
                .select(F.from_json(F.col(col), schema).alias("r"))
                .select("r.*")
                .withColumn(ivm_delta.OP_COL, F.lit(op))
            )

        def batch_for(table: str, schema: str) -> DataFrame:
            b = parsed(table, schema, "payload", ivm_delta.INSERT)
            if has_before:
                b = b.unionByName(parsed(table, schema, "payload_before", ivm_delta.DELETE))
            return b

        # one change frame per BASE state (NULL-probe-key rows can never
        # contribute to a document — same rationale as the nested-doc
        # lane's filter); both images enter, so re-pointed references
        # cover their old targets' fan-out. Membership comes from the
        # fused stats job's collect_set (a table whose every row has a
        # NULL probe key yields an empty change frame — sound: empty
        # walks, an empty-key merge)
        present = set(stats["__tbl"] or [])
        base_states = [s for s in states if s.source is None]
        changes = {
            s.suffix: batch_for(s.table, s.schema).where(_notnull(s.key_cols))
            for s in base_states
            if s.table in present
        }
        if not changes:
            # every row was replay-suppressed / irrelevant: nothing to fold
            self._write_lane_marker(view, batch_max_lsn)
            self.last_stats[view.name] = {"upserts": 0, "deletes": 0, "doc_tree": 1}
            return True

        # state presence + column checks (spec-evolution guard) — from
        # the sidecar schema file, not a per-state parquet-footer read
        # (N serial spark.read.parquet calls dominated r6's parse phase)
        missing = False
        for s in states:
            cols = self.keyed.columns(names[s.suffix])
            if cols is None:
                missing = True
                continue
            required = {*s.cols, ivm_delta._MULT}
            if required - set(cols):
                logger.warning(
                    "view state %s lacks columns for the current spec — "
                    "declining to fold so the fallback rebuilds", names[s.suffix],
                )
                return False
        if missing:
            # streaming-without-backfill initialization: the catalog must
            # still be at the snapshot point (same contract as the other
            # lanes' in-hook init)
            self._write_doctree_states(view)
        _mark("parse_fold")

        change_keys = {
            sfx: ch.select(sdefs[sfx].key_cols[0]).distinct()
            for sfx, ch in changes.items()
        }

        # ---- merge FIRST (state-before-action): every state folds its
        # delta into its own buckets, then the reverse walk and the doc
        # serve read the MERGED state directly — no per-read overlay
        # (the union+groupBy the overlay costs per state read was the
        # largest stage count in the batch; the walk's semantics were
        # already post-fold). Crash discipline is unchanged in kind:
        # a crash anywhere between the first merge and the marker write
        # leaves state versions ahead of the marker → the next delivery
        # reads torn → authoritative fallback (the old action-first
        # order had the mirror-image window, after the sink write).
        merge_work = []
        for s in states:
            if s.source is None:
                ch = changes.get(s.suffix)
                if ch is None:
                    continue
                skeys = change_keys[s.suffix]
            else:
                src_ch = changes.get(s.source)
                if src_ch is None:
                    continue
                skeys = src_ch.where(_notnull(s.cols)).select(s.key_cols[0]).distinct()
            merge_work.append((s, skeys))

        # ONE union write job for every state instead of one job per
        # state (8 concurrent single-task writes paid the driver's
        # per-job floor 8 times — ~4 s wall each under mutual contention
        # at sf0.1 vs ~1 s alone; the 8-core near-parity in BENCH_r07's
        # scaling block is the same signature). With the OVERLAY on top,
        # the walk and serve read the OLD files plus the batch's signed
        # delta as a lazy group-sum — row-identical to the post-merge
        # files by apply_join_state's own identity — so the fold's
        # critical path never waits on the merge write at all; the
        # destructive dir swap runs after the sink (reads never race
        # file replacement). Both knobs are A/B kill-switches.
        _union_merge = _os.environ.get("SINKER_SPARK_UNION_MERGE", "1") != "0"
        _overlay = _union_merge and (
            _os.environ.get("SINKER_SPARK_FOLD_OVERLAY", "1") != "0"
        )

        # raw signed delta per state (insert +1 / delete −1, no netting
        # groupBy — every consumer group-sums, which nets identical rows
        # anyway): shared by the merge rebuilds AND the overlay reads
        _sign = (
            F.when(F.col(ivm_delta.OP_COL) == ivm_delta.DELETE, F.lit(-1))
            .otherwise(F.lit(1))
            .cast("bigint")
        )
        deltas: dict[str, DataFrame] = {}
        for s, _sk in merge_work:
            if s.source is None:
                ch = changes[s.suffix]
            else:
                ch = changes[s.source].where(_notnull(s.cols)).select(
                    *s.cols, ivm_delta.OP_COL
                )
            deltas[s.suffix] = ch.withColumn(ivm_delta._MULT, _sign).drop(
                ivm_delta.OP_COL
            )

        if merge_work:
            # ONE batched bucket-id job for every state (tagged union)
            # instead of two driver round-trips per state (the read
            # inside rows_for + the merge's own collect) — at ~8 states
            # per view the round-trips, not the I/O, dominated r6's
            # merge phase
            tagged = None
            bmap: dict[str, list[int]] = {}
            for s, skeys in merge_work:
                if not self.keyed.prunable(names[s.suffix]):
                    # small state: rewriting every (tiny) bucket beats a
                    # bucket-id job — ids from a driver dir listing
                    bmap[s.suffix] = self.keyed.all_buckets(names[s.suffix])
                    continue
                part = self.keyed.buckets_for(
                    names[s.suffix], skeys, list(s.key_cols)
                ).withColumn(
                    "__st", F.lit(s.suffix)
                )
                tagged = part if tagged is None else tagged.unionByName(part)
            if tagged is not None:
                for r in tagged.collect():
                    bmap.setdefault(r["__st"], []).append(r["b"])

            _merge_detail: dict[str, float] = {}

            def _merge_item(work):
                """(name, rebuild, key_cols, buckets) for one state —
                fold the signed delta into the affected buckets. The
                delta is RAW signed rows (insert +1 / delete −1, no
                netting groupBy — apply_join_state's group-sum nets
                identical rows anyway, so the changes_to_mult shuffle
                per state was pure overhead). A SMALL state (bucket set
                = the whole grid) folds as one group-sum over
                old ∪ delta — untouched rows group with nothing and
                pass through unchanged, no anti/semi broadcasts. A
                LARGE state keeps the keep/hit split so untouched
                bucket rows are never re-grouped."""
                s, skeys = work
                bks = bmap.get(s.suffix, [])
                delta = deltas[s.suffix]
                kc = list(s.key_cols)

                if self.keyed.prunable(names[s.suffix]):
                    def rebuild(old, d=delta, k=skeys, kc=kc):
                        keep = old.join(F.broadcast(k), kc, "left_anti")
                        hit = old.join(F.broadcast(k), kc, "left_semi")
                        return keep.unionByName(ivm_delta.apply_join_state(hit, d))
                else:
                    # small state: one group-sum over old ∪ delta (an
                    # identity on untouched rows) — measured FASTER in
                    # the union write job than the anti/semi broadcasts
                    # (fewer stage waves; the whole state is one task's
                    # worth of rows anyway)
                    def rebuild(old, d=delta):
                        return ivm_delta.apply_join_state(old, d)

                return (names[s.suffix], rebuild, kc, bks)

            def _merge_group(label: str, work_list) -> None:
                _m0 = _time.perf_counter()
                self.keyed.rewrite_buckets_many(
                    [_merge_item(w) for w in work_list]
                )
                if _timing:
                    _merge_detail[label] = round(_time.perf_counter() - _m0, 3)

            def _one_merge(work) -> None:
                _m0 = _time.perf_counter()
                name, rebuild, kc, bks = _merge_item(work)
                self.keyed.rewrite_buckets(name, rebuild, kc, bks)
                if _timing:
                    _merge_detail[work[0].suffix] = round(
                        _time.perf_counter() - _m0, 3
                    )

        def rows_for_merged(
            sdef, keys: DataFrame, buckets: "list[int] | None" = None
        ) -> DataFrame:
            """Post-merge state rows for ``keys``: a plain bucket-pruned
            read + broadcast semi-join — the batch is already folded
            into the files. ``keys=None`` serves the FULL state (the
            serve's skip_restrict path for states too small to be worth
            a probe job)."""
            if keys is None:
                return self.keyed._read_parquet(names[sdef.suffix]).drop("__bucket")
            keys = keys.distinct()
            kc = list(sdef.key_cols)
            return self.keyed.read_for_keys(
                names[sdef.suffix], keys, kc, buckets=buckets
            ).join(F.broadcast(keys), kc, "left_semi")

        def _walk(rows_for=None) -> DataFrame:
            return ivm_flagship.touched_parent_keys(
                spec, change_keys, rows_for or rows_for_merged
            ).localCheckpoint(eager=True)

        # Scheduling. DEFERRED-SWAP (default): the merge runs as TWO
        # concurrent union write jobs (index group / base group) into
        # temp dirs while the walk runs on the caller thread against the
        # UNTOUCHED old files — sound with the identical touched-key
        # set, by the mirror of the post-fold-walk induction: a parent
        # that referenced the changed row's chain BEFORE the batch is
        # reached through the old indexes, and one that newly references
        # it had a nearer row change IN this batch (the edge lives in
        # the referrer's own row), so it is reached directly via that
        # relation's Δ — both images of every change enter the walk.
        # After the walk, the fold waits out the writes (usually already
        # done — they ran under the walk), runs the destructive dir
        # swaps, and the serve reads the MERGED files plain:
        # state-before-action, the same order and crash discipline as
        # before. Legacy shapes kept for A/B: eager union-merge (walk
        # waits for the index-group job) and the per-state 8-job pool.
        # Phase accounting: deferred-swap "reverse_walk" is the pure
        # walk and "state_merge" the residual write wait + swap; legacy
        # "reverse_walk" spans index-merge wait + walk as before.
        n_workers = int(_os.environ.get("SINKER_SPARK_MERGE_WORKERS", "8"))
        if merge_work and _overlay:
            idx_items = [
                _merge_item(w) for w in merge_work if w[0].source is not None
            ]
            base_items = [
                _merge_item(w) for w in merge_work if w[0].source is None
            ]

            def _write_group(label: str, items):
                _m0 = _time.perf_counter()
                swap = self.keyed.rewrite_buckets_many(items, defer_swap=True)
                if _timing:
                    _merge_detail[f"write_{label}"] = round(
                        _time.perf_counter() - _m0, 3
                    )
                return swap

            with ThreadPoolExecutor(max_workers=2) as _merge_pool:
                futs = [
                    _merge_pool.submit(_write_group, label, items)
                    for label, items in (
                        ("index", idx_items), ("base", base_items)
                    )
                    if items
                ]
                touched = _walk()
                _mark("reverse_walk")
                swaps = [f.result() for f in futs]
            for swap in swaps:
                swap()
            if _timing and _merge_detail:
                _phases["state_merge_detail"] = dict(  # type: ignore[assignment]
                    sorted(_merge_detail.items(), key=lambda kv: -kv[1])
                )
            _mark("state_merge")
        elif merge_work:
            idx_work = [w for w in merge_work if w[0].source is not None]
            base_work = [w for w in merge_work if w[0].source is None]
            if _union_merge:
                with ThreadPoolExecutor(max_workers=2) as pool:
                    idx_futs = (
                        [pool.submit(_merge_group, "index", idx_work)]
                        if idx_work else []
                    )
                    base_futs = (
                        [pool.submit(_merge_group, "base", base_work)]
                        if base_work else []
                    )
                    for f in idx_futs:
                        f.result()
                    touched = _walk()
                    _mark("reverse_walk")
                    for f in base_futs:
                        f.result()
            else:
                with ThreadPoolExecutor(
                    max_workers=min(max(1, n_workers), len(merge_work))
                ) as pool:
                    idx_futs = [pool.submit(_one_merge, w) for w in idx_work]
                    base_futs = [pool.submit(_one_merge, w) for w in base_work]
                    for f in idx_futs:
                        f.result()
                    touched = _walk()
                    _mark("reverse_walk")
                    for f in base_futs:
                        f.result()
            if _timing and _merge_detail:
                _phases["state_merge_detail"] = dict(  # type: ignore[assignment]
                    sorted(_merge_detail.items(), key=lambda kv: -kv[1])
                )
            _mark("state_merge")
        else:
            touched = _walk()
            _mark("reverse_walk")
        sql_doc = getattr(view, "_sql_doc", None)
        if sql_doc is not None:
            # SQL-declared doc tree (ivm_doc_sql): serve the TRANSPILED
            # compile's nested shape — NULL first-hop objects instead of
            # chain retraction, unconditional deeper structs, []-not-NULL
            # arrays, decimals already canonicalized
            from sinker_spark import ivm_doc_sql

            docs = ivm_doc_sql.serve_docs_sql(sql_doc, touched, rows_for_merged)
        else:
            # size-based probe skip: a state below the store's pruning
            # threshold is one cheap full scan — the probe's eager
            # materialization job costs more than the restriction saves
            # (restriction is correctness-required only for the parent,
            # which serve_docs always restricts; a 2 MB child-specific
            # threshold was also measured — the smaller array groupBy
            # only repaid the probe jobs it added, a wash)
            docs = ivm_flagship.serve_docs(
                spec, touched, rows_for_merged,
                skip_restrict=lambda sd: not self.keyed.prunable(names[sd.suffix]),
            )
        _serve_detail: dict[str, float] = {}
        if _timing:
            _serve_detail["plan"] = round(_time.perf_counter() - _tprev, 3)
        # the serve lineage (state reads + dim joins + array assembly) is
        # referenced by BOTH action branches (upserts, and the retraction
        # anti-join) — persist AND materialize it eagerly: inside the
        # union's single job the two branches race, and a partition the
        # anti-join reaches before the upsert branch cached it executes
        # the whole serve a second time
        docs = docs.persist()
        n_docs = docs.count()
        if _timing:
            _serve_detail["count"] = round(
                _time.perf_counter() - _tprev - _serve_detail["plan"], 3
            )
        if sql_doc is not None:
            upserts = docs.select(
                F.col(spec.key).cast("string").alias(view.key),
                F.lit(UPSERT).alias("op"),
                F.col("doc"),
            )
        else:
            upserts = docs.select(
                F.col(spec.key).cast("string").alias(view.key),
                F.lit(UPSERT).alias("op"),
                F.struct(*[F.col(c) for c in docs.columns]).alias("doc"),
            )
        doc_type = upserts.schema["doc"].dataType
        deletes = touched.join(docs.select(spec.key), [spec.key], "left_anti").select(
            F.col(spec.key).cast("string").alias(view.key),
            F.lit(DELETE).alias("op"),
            F.lit(None).cast(doc_type).alias("doc"),
        )
        actions = upserts.unionByName(deletes)
        try:
            # action counts are arithmetic over already-materialized
            # frames — serve emits exactly one row per touched key that
            # still yields a doc (n_docs, counted when docs cached) and
            # retracts the rest (touched is checkpointed; its count is a
            # cache scan) — so the sink applies straight from the docs
            # cache with no _apply_counted persist + groupBy-collect pass
            self.sink.apply_actions(view.index, actions)
            counts = {UPSERT: n_docs, DELETE: touched.count() - n_docs}
        finally:
            docs.unpersist()
        if _timing:
            _serve_detail["sink"] = round(
                _time.perf_counter() - _tprev
                - _serve_detail["plan"] - _serve_detail["count"], 3
            )
            _phases["serve_detail"] = _serve_detail  # type: ignore[assignment]
        _mark("serve_sink")
        self._write_lane_marker(view, batch_max_lsn)
        _mark("marker")
        self.last_stats[view.name] = {
            "upserts": counts.get(UPSERT, 0),
            "deletes": counts.get(DELETE, 0),
            "doc_tree": 1,
            **({"phases": _phases} if _timing else {}),
        }
        logger.info("doc-tree refreshed view %s (epoch %s): %s", view.name, epoch_id,
                    self.last_stats[view.name])
        return True

    def _initial_doctree_state_frames(self, spec) -> dict[str, DataFrame]:
        """Every doc-tree state derived from the CURRENT catalog tables:
        base relations as multiplicity states (NULL probe keys excluded,
        as in the fold), reverse indexes as multiplicity-summed
        projections of their source base state."""
        from sinker_spark.ivm_flagship import _notnull, doc_tree_states

        frames: dict[str, DataFrame] = {}
        for s in doc_tree_states(spec):
            if s.source is None:
                rel = self._schema_select(self.spark.table(s.table), s.schema)
                frames[s.suffix] = ivm_delta.relation_state(rel.where(_notnull(s.key_cols)))
            else:
                src = frames[s.source]
                frames[s.suffix] = (
                    src.where(_notnull(s.cols))
                    .groupBy(*s.cols)
                    .agg(F.sum(ivm_delta._MULT).alias(ivm_delta._MULT))
                )
        return frames

    def _write_doctree_states(self, view: ViewDef) -> None:
        from sinker_spark.ivm_flagship import doc_tree_states

        frames = self._initial_doctree_state_frames(view.doctree)
        states = doc_tree_states(view.doctree)
        # the per-state writes are independent Spark jobs — submit from
        # a small pool so one write's task tail back-fills with the next
        # write's tasks (guide §2.6) instead of a serial ~N-job chain
        with ThreadPoolExecutor(max_workers=min(4, max(1, len(states)))) as pool:
            list(
                pool.map(
                    lambda s: self.keyed.write(
                        f"{view.name}__dt_{s.suffix}",
                        frames[s.suffix],
                        list(s.key_cols),
                    ),
                    states,
                )
            )

    def _initial_chain_states(
        self, spec
    ) -> tuple[list[DataFrame], list[DataFrame], DataFrame | None]:
        """Derive every chain state from the CURRENT catalog tables:
        base relations as multiplicity states, one prefix join state per
        arity (the running raw join, multiplicity-compressed), plus the
        aggregate state over the full chain in aggregate mode."""
        tabs = [
            self._schema_select(self.spark.table(spec.tables[i]), spec.row_schemas[i])
            for i in range(len(spec.tables))
        ]
        r_states = [ivm_delta.relation_state(t) for t in tabs]
        j_states = []
        running = tabs[0]
        for k in range(1, len(tabs)):
            running = running.join(tabs[k], spec.ons[k - 1])
            j_states.append(ivm_delta.relation_state(running))
        agg_state = (
            ivm_delta.initial_agg_state(running, spec.keys, spec.sums)
            if spec.keys is not None
            else None
        )
        return r_states, j_states, agg_state

    def _join_agg_refresh(self, view: ViewDef, cdc: DataFrame, epoch_id: int | None) -> bool:
        """Composed maintenance lane for γ_keys(A ⋈ B) views: the
        bilinear join delta (signed multiplicities) expands into change
        rows and folds into the stored (count, sums) aggregate state —
        O(|Δ|·fan-out), with base relations kept as multiplicity state
        so no table is ever rescanned. Same before-image contract and
        snapshot-point initialization as the other delta lanes; returns
        False (→ recompute lane) when before-images are missing."""
        spec = view.joinagg
        rows = cdc.where(F.col("table").isin(spec.table_a, spec.table_b))
        torn, rows, batch_max_lsn = self._lane_guard(view, rows)
        if torn:
            return False
        has_before = "payload_before" in cdc.columns
        mutating = F.col("op").isin("DELETE", "UPDATE")
        if has_before:
            unfoldable = rows.where(mutating & F.col("payload_before").isNull())
        else:
            unfoldable = rows.where(mutating)
        if unfoldable.limit(1).count():
            return False

        def parsed(table: str, schema: str, col: str, op: str) -> DataFrame:
            return (
                rows.where(F.col("table") == table)
                .where(F.col(col).isNotNull())
                .where(F.col("op").isin(*(["INSERT", "UPDATE"] if op == ivm_delta.INSERT else ["DELETE", "UPDATE"])))
                .select(F.from_json(F.col(col), schema).alias("r"))
                .select("r.*")
                .withColumn(ivm_delta.OP_COL, F.lit(op))
            )

        def batch_for(table: str, schema: str) -> DataFrame:
            b = parsed(table, schema, "payload", ivm_delta.INSERT)
            if has_before:
                b = b.unionByName(parsed(table, schema, "payload_before", ivm_delta.DELETE))
            return b

        a_ch = batch_for(spec.table_a, spec.row_schema_a)
        b_ch = batch_for(spec.table_b, spec.row_schema_b)

        a_state, a_stale = self._checked_state(
            f"{view.name}__ja_a_state",
            [*self._schema_cols(spec.row_schema_a), ivm_delta._MULT],
        )
        b_state, b_stale = self._checked_state(
            f"{view.name}__ja_b_state",
            [*self._schema_cols(spec.row_schema_b), ivm_delta._MULT],
        )
        agg_state, agg_stale = self._checked_state(
            f"{view.name}__ja_agg_state",
            [
                *spec.keys,
                ivm_delta._CNT,
                *spec.sums,
                *[ivm_delta._nn(s) for s in spec.sums],
            ],
        )
        if a_stale or b_stale or agg_stale:
            return False
        if a_state is None or b_state is None or agg_state is None:
            a_tab, b_tab = self.spark.table(spec.table_a), self.spark.table(spec.table_b)
            a_state = ivm_delta.relation_state(a_tab)
            b_state = ivm_delta.relation_state(b_tab)
            agg_state = ivm_delta.initial_agg_state(
                a_tab.join(b_tab, spec.on, spec.how), spec.keys, spec.sums
            )

        ja_delta_fn = {
            "inner": ivm_delta.join_delta,
            "left": ivm_delta.left_join_delta,
            "full": ivm_delta.full_join_delta,
        }[spec.how]
        delta = ja_delta_fn(a_state, b_state, a_ch, b_ch, spec.on)
        delta = delta.localCheckpoint(eager=True)  # consumed twice (fold + touched)
        new_agg = ivm_delta.apply_agg_delta(
            agg_state, ivm_delta.join_delta_to_changes(delta), spec.keys, spec.sums
        ).localCheckpoint(eager=True)
        new_a = ivm_delta.apply_join_state(
            a_state, ivm_delta.changes_to_mult(a_ch)
        ).localCheckpoint(eager=True)
        new_b = ivm_delta.apply_join_state(
            b_state, ivm_delta.changes_to_mult(b_ch)
        ).localCheckpoint(eager=True)

        group_id = F.concat_ws("|", *[F.col(k).cast("string") for k in spec.keys])
        touched = delta.select(*spec.keys).distinct()
        doc_view = new_agg.select(
            *spec.keys,
            F.col(ivm_delta._CNT).alias("n_rows"),
            # SQL parity: SUM over zero non-null inputs serves NULL
            *[
                F.when(F.col(ivm_delta._nn(sm)) > 0, F.col(sm))
                .otherwise(F.lit(None))
                .cast("double")
                .alias(sm)
                for sm in spec.sums
            ],
        )
        # HAVING semantics: see _delta_agg_refresh — served = passing
        # groups; touched − served retracts boundary-crossing docs.
        served = doc_view.where(F.expr(spec.having)) if spec.having else doc_view
        upserts = ivm_delta.null_safe_join(served, touched, spec.keys, "left_semi").select(
            group_id.alias(view.key),
            F.lit(UPSERT).alias("op"),
            F.struct(*[F.col(c) for c in doc_view.columns]).alias("doc"),
        )
        doc_type = upserts.schema["doc"].dataType
        deletes = ivm_delta.null_safe_join(touched, served, spec.keys, "left_anti").select(
            group_id.alias(view.key),
            F.lit(DELETE).alias("op"),
            F.lit(None).cast(doc_type).alias("doc"),
        )
        actions = upserts.unionByName(deletes)
        counts = self._apply_counted(view, actions)

        self._write_joinagg_states(view, new_a, new_b, new_agg)
        self._write_lane_marker(view, batch_max_lsn)
        self.last_stats[view.name] = {
            "upserts": counts.get(UPSERT, 0),
            "deletes": counts.get(DELETE, 0),
            "join_agg": 1,
        }
        logger.info("join-agg refreshed view %s (epoch %s): %s", view.name, epoch_id,
                    self.last_stats[view.name])
        return True

    # -- lane-state lifecycle ---------------------------------------------
    # The delta lanes above maintain per-view auxiliary state snapshots
    # (__aggstate, __topkrows/__topkcounts, __a_state/__b_state/
    # __join_state, __ja_*, __hllstate, __bloomstate) and write sink
    # actions directly, WITHOUT refreshing the view's doc snapshot. That
    # is the O(batch) hot path — but it means that whenever a lane view
    # is refreshed through the recompute lane instead (a batch without
    # before-images, a change on a non-lane dependency), two things go
    # stale at once: the lane states (the fallback batch never folded
    # into them) and the doc snapshot (diffing against it would miss
    # every key the lanes changed since it was written). The helpers
    # below keep both honest: `_rebuild_lane_states` re-derives lane
    # state from the catalog tables (at backfill and after a fallback),
    # and `_lane_fallback_refresh` is the authoritative repair path the
    # dispatcher routes lane views through instead of the generic
    # recompute lanes.

    _LANE_FIELDS = (
        "agg", "join", "joinagg", "joinchain", "nesteddoc", "doctree", "distinct",
        "membership", "topk",
    )

    def _has_lane(self, view: ViewDef) -> bool:
        return any(getattr(view, f) is not None for f in self._LANE_FIELDS)

    # -- replay guard for the algebraic folds -----------------------------
    # The agg/topk/join/joinagg folds apply SIGNED deltas, so unlike the
    # recompute lanes (diff), the HLL lane (MAX-merge) and the Bloom lane
    # (bit_or), they are NOT idempotent: an at-least-once redelivery — a
    # foreachBatch epoch replayed after a crash, or a pg_slot peek
    # re-serving a tail that was processed but not yet advanced — would
    # fold the same rows twice. Guard: a per-view marker snapshot records
    # the highest change position (lsn — WAL-derived and globally
    # monotone in every source lane) folded into the lane states, plus
    # the store version of each state at the moment the fold committed.
    # On the next batch, rows at or below the marker are dropped from
    # the FOLD (their effects are already in the state, and — because
    # every lane applies sink actions BEFORE writing state — their
    # actions were already delivered). A version mismatch means a crash
    # interrupted the multi-snapshot state write (torn fold): the lane
    # declines and the authoritative fallback rebuilds everything.
    # Sources that cannot supply a monotone lsn should leave it null —
    # null-lsn rows always fold (guard disabled for them).

    def _marker_state_names(self, view: ViewDef) -> list[str]:
        names: list[str] = []
        if view.agg is not None:
            names.append(f"{view.name}__aggstate")
        if view.topk is not None:
            names += [f"{view.name}__topkrows", f"{view.name}__topkcounts"]
        if view.join is not None:
            names += [f"{view.name}__a_state", f"{view.name}__b_state", f"{view.name}__join_state"]
        if view.joinagg is not None:
            names += [
                f"{view.name}__ja_a_state",
                f"{view.name}__ja_b_state",
                f"{view.name}__ja_agg_state",
            ]
        if view.joinchain is not None:
            nt = len(view.joinchain.tables)
            names += [f"{view.name}__jc_r{i}" for i in range(nt)]
            names += [f"{view.name}__jc_j{k}" for k in range(2, nt + 1)]
            if view.joinchain.keys is not None:
                names.append(f"{view.name}__jc_agg_state")
        if view.nesteddoc is not None:
            names += [f"{view.name}__nd_p_state", f"{view.name}__nd_c_state"]
        if view.doctree is not None:
            from sinker_spark.ivm_flagship import doc_tree_states

            names += [f"{view.name}__dt_{s.suffix}" for s in doc_tree_states(view.doctree)]
        # the exact-distinct fold is signed (not idempotent) → guarded;
        # the HLL lane's MAX-merge is idempotent and needs no marker
        if view.distinct is not None and view.distinct.exact:
            names.append(f"{view.name}__dcstate")
        return names

    def _lane_spec_fp(self, view: ViewDef) -> str:
        """Fingerprint of the view's lane spec + doc key. A redefinition
        whose stored lane states happen to stay schema-compatible (e.g.
        a chain view flipping between aggregate and raw-join mode keeps
        the same relation/join state schemas) must still DECLINE the
        fold: folding under the new spec serves the new shape for
        touched keys but never retracts the old shape's documents —
        they stay in the sink forever (found by tools/soak_longhaul.py,
        evolution step: orphaned aggregate docs). The guard compares
        this fingerprint against the marker's recorded one and routes a
        mismatch through the authoritative fallback, which deletes every
        key known to the old snapshot/states. Semantic edits invisible
        to the spec (a changed sum EXPRESSION under the same alias)
        remain the manual-reset contract documented on _checked_state."""
        import hashlib

        payload = repr((
            view.key, view.agg, view.join, view.distinct, view.membership,
            view.topk, view.joinagg, view.joinchain, view.nesteddoc, view.doctree,
        ))
        return hashlib.md5(payload.encode()).hexdigest()

    def _marker_file(self, view_name: str) -> str:
        # next to the keyed lane states the marker guards, so the
        # reset/cleanup lifecycles travel together
        import os as _os

        return _os.path.join(self.keyed.root, f"{view_name}__lane_wm.json")

    def _read_lane_marker(
        self, view: ViewDef
    ) -> tuple[int | None, dict[str, int], str | None] | None:
        # the marker is ONE tiny row of driver-known values: a JSON
        # sidecar read costs ~0 where the former snapshot-store read was
        # a Spark job per fold (and the store write per batch grew one
        # snapshot version per epoch that maintenance had to vacuum)
        import json as _json

        try:
            with open(self._marker_file(view.name)) as fh:
                d = _json.load(fh)
            return (
                d.get("lsn"),
                dict(zip(d["state_names"], d["state_versions"])),
                d.get("spec_fp"),
            )
        except (OSError, ValueError, KeyError, TypeError):
            pass
        # legacy fallback: markers written by older engines live in the
        # snapshot store — honored until the first sidecar write
        packed = self.store.read(f"{view.name}__lane_wm")
        if packed is None:
            return None
        rows = packed.limit(1).collect()
        if not rows:
            return None
        doc = rows[0]["doc"]
        d = doc.asDict()
        return (
            doc["lsn"],
            dict(zip(doc["state_names"], doc["state_versions"])),
            d.get("spec_fp"),  # pre-fingerprint markers lack the field
        )

    def _state_version(self, name: str) -> int:
        """Version of a lane state wherever it lives: the key-local
        store's counter when the state is keyed, else the snapshot
        store's version (0 for stores without versioning)."""
        v = self.keyed.current_version(name)
        if v is not None:
            return int(v)
        getv = getattr(self.store, "current_version", None)
        return int(getv(name) or 0) if getv is not None else 0

    def _write_lane_marker(self, view: ViewDef, lsn: int | None) -> None:
        names = self._marker_state_names(view)
        if not names:
            return
        import json as _json
        import os as _os

        versions = [self._state_version(n) for n in names]
        path = self._marker_file(view.name)
        _os.makedirs(_os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump(
                {
                    "lsn": lsn,
                    "state_names": names,
                    "state_versions": versions,
                    "spec_fp": self._lane_spec_fp(view),
                },
                fh,
            )
        # atomic swap — same crash discipline as the store's _CURRENT
        # pointer: a crash mid-write never corrupts the readable marker
        _os.replace(tmp, path)

    def _lane_guard_precheck(self, view: ViewDef) -> tuple[bool, int | None]:
        """Driver-only half of :meth:`_lane_guard` → (torn, cutoff).
        The marker sidecar, spec fingerprint and state-version
        comparisons are all driver-known values — no Spark job. A lane
        that fuses its own batch aggregates (the doc-tree fold) calls
        this directly and folds the max-lsn into its single stats job;
        composing ``max(cutoff, post_suppression_max_lsn)`` yields the
        same marker lsn as _lane_guard's pre-suppression aggregate
        (every suppressed row's lsn is ≤ cutoff by construction)."""
        marker = self._read_lane_marker(view)
        if marker is None:
            return False, None
        cutoff, versions, spec_fp = marker
        if spec_fp is not None and spec_fp != self._lane_spec_fp(view):
            logger.warning(
                "view %s: lane spec changed since the marker was written — "
                "declining to fold; fallback rebuilds states and retracts the "
                "old shape's documents", view.name
            )
            return True, cutoff
        if versions:
            if any(self._state_version(n) != v for n, v in versions.items()):
                logger.warning(
                    "view %s: lane states do not match the replay marker (torn fold "
                    "after a crash) — declining to fold; fallback will rebuild", view.name
                )
                return True, cutoff
        return False, cutoff

    def _lane_guard(self, view: ViewDef, rows: DataFrame) -> tuple[bool, DataFrame, int | None]:
        """→ (torn, fold_rows, new_marker_lsn). ``fold_rows`` drops
        already-folded redeliveries; ``torn`` means the stored lane
        states do not match the marker's recorded versions (a crash
        interrupted a previous fold mid-write) and the caller must
        decline so the fallback rebuilds."""
        torn, cutoff = self._lane_guard_precheck(view)
        batch_max = rows.agg(F.max("lsn")).collect()[0][0] if "lsn" in rows.columns else None
        if torn:
            return True, rows, batch_max
        if cutoff is not None and "lsn" in rows.columns:
            rows = rows.where(F.col("lsn").isNull() | (F.col("lsn") > F.lit(cutoff)))
        new_lsn = max(x for x in (cutoff, batch_max) if x is not None) if (
            cutoff is not None or batch_max is not None
        ) else None
        return False, rows, new_lsn

    def _schema_cols(self, ddl: str) -> list[str]:
        return self.spark.createDataFrame([], ddl).columns

    def _schema_select(self, df: DataFrame, ddl: str) -> DataFrame:
        """Project ``df`` onto the DDL's columns CAST to the DDL's
        types. Initial lane states must carry exactly the spec's types:
        catalog parquet often stores narrower physical types (int32
        nation keys) than the spec declares (bigint), and a state dir
        mixing widths — catalog-typed seed files next to spec-typed
        merge output — makes later reads schema-nondeterministic
        (parquet inference samples one footer)."""
        fields = self.spark.createDataFrame([], ddl).schema.fields
        return df.select(*[F.col(f.name).cast(f.dataType) for f in fields])

    def _checked_state(self, name: str, required: list[str]) -> tuple[DataFrame | None, bool]:
        """Stored lane state unpacked → ``(state, stale)``. ``stale``
        means the state exists but no longer carries the columns the
        view's CURRENT lane spec requires — i.e. the spec was edited
        (sum added, key renamed) since the state was written. The fold
        must then DECLINE rather than crash mid-plan or re-derive state
        from the live fact table (which, under the live-table contract,
        already reflects the batch — re-deriving here would double-apply
        it): the caller returns False and the authoritative fallback
        rebuilds every lane state under the new spec from the post-batch
        catalog. A spec edit that keeps the same column names (a changed
        sum EXPRESSION) is not detectable from schema — that requires a
        manual reset + re-backfill, as any semantic redefinition does
        (reference parity: DROP + CREATE MATERIALIZED VIEW,
        sinker.py:100-103)."""
        packed = self.store.read(name)
        if packed is None:
            return None, False
        state = packed.select("doc.*")
        missing = set(required) - set(state.columns)
        if missing:
            logger.warning(
                "view state %s lacks column(s) %s — lane spec changed since it "
                "was written; declining to fold so the fallback rebuilds",
                name, sorted(missing),
            )
            return None, True
        return state, False

    @staticmethod
    def _state_row_id(cols: list) -> F.Column:
        """NULL-unambiguous row id for INTERNAL lane-state stores (same
        scheme as ``_write_mult_state``): md5 of the key struct's JSON.
        concat_ws silently drops NULLs, so with nullable multi-column
        group keys ('a', NULL, 'b') and ('a', 'b', NULL) would collide
        on one store row and clobber each other's state. Sink doc ids
        are NOT changed — they must keep matching the view's recompute
        sql/fn, which builds them itself."""
        return F.md5(F.to_json(F.struct(*[F.col(c) if isinstance(c, str) else c for c in cols])))

    def _write_agg_state(self, view: ViewDef, state: DataFrame) -> None:
        spec = view.agg
        group_id = self._state_row_id(list(spec.keys))
        state_doc = F.struct(
            *[F.col(k).alias(k) for k in spec.keys],
            F.col(ivm_delta._CNT).alias(ivm_delta._CNT),
            *[F.col(s) for s in spec.sums],
            *[F.col(ivm_delta._nn(s)) for s in spec.sums],
            *[F.col(m) for m in spec.maxes],
            *[F.col(m) for m in spec.mins],
        )
        self.store.write(
            f"{view.name}__aggstate",
            state.select(group_id.alias(view.key), state_doc.alias("doc")),
            key=view.key,
        )

    def _write_topk_states(self, view: ViewDef, rows: DataFrame, counts: DataFrame) -> None:
        from sinker_spark import ivm_topk

        spec = view.topk
        group_id = self._state_row_id(list(spec.keys))
        row_id = self._state_row_id([*spec.keys, spec.id_col])
        self.store.write(
            f"{view.name}__topkrows",
            rows.select(row_id.alias(view.key), F.struct(*rows.columns).alias("doc")),
            key=view.key,
        )
        self.store.write(
            f"{view.name}__topkcounts",
            counts.select(
                group_id.alias(view.key),
                F.struct(*spec.keys, F.col(ivm_topk._N)).alias("doc"),
            ),
            key=view.key,
        )

    def _write_hll_state(self, view: ViewDef, state: DataFrame) -> None:
        spec = view.distinct
        self.store.write(
            f"{view.name}__hllstate",
            state.select(
                self._state_row_id([*spec.keys, "bucket"]).alias(view.key),
                F.struct(*spec.keys, "bucket", "r").alias("doc"),
            ),
            key=view.key,
        )

    def _write_dc_state(self, view: ViewDef, state: DataFrame) -> None:
        """Support-count state for the exact-distinct lane: row identity
        is (keys…, value) — the count must NOT participate in the id or
        a count change would strand the old row in the store."""
        spec = view.distinct
        ident = [F.col(k) for k in spec.keys] + [F.col(ivm_delta._VAL)]
        rid = F.md5(F.to_json(F.struct(*ident)))
        self.store.write(
            f"{view.name}__dcstate",
            state.select(rid.alias(view.key), F.struct(*state.columns).alias("doc")),
            key=view.key,
        )

    def _write_bloom_state(self, view: ViewDef, state: DataFrame) -> None:
        self.store.write(
            f"{view.name}__bloomstate",
            state.select(
                F.col("word_idx").cast("string").alias(view.key),
                F.struct("word_idx", "word").alias("doc"),
            ),
            key=view.key,
        )

    def _write_mult_state(self, view: ViewDef, name: str, df: DataFrame) -> None:
        data = [c for c in df.columns if c != ivm_delta._MULT]
        rid = F.md5(F.to_json(F.struct(*[F.col(c) for c in data])))
        self.store.write(
            name,
            df.select(rid.alias(view.key), F.struct(*df.columns).alias("doc")),
            key=view.key,
        )

    def _write_join_states(self, view: ViewDef, a: DataFrame, b: DataFrame, j: DataFrame) -> None:
        self._write_mult_state(view, f"{view.name}__a_state", a)
        self._write_mult_state(view, f"{view.name}__b_state", b)
        self._write_mult_state(view, f"{view.name}__join_state", j)

    def _write_chain_states(
        self,
        view: ViewDef,
        r_states: list[DataFrame],
        j_states: list[DataFrame],
        agg_state: DataFrame | None = None,
    ) -> None:
        for i, r in enumerate(r_states):
            self._write_mult_state(view, f"{view.name}__jc_r{i}", r)
        for k, j in enumerate(j_states):
            self._write_mult_state(view, f"{view.name}__jc_j{k + 2}", j)
        if agg_state is not None:
            spec = view.joinchain
            group_id = self._state_row_id(list(spec.keys))
            agg_doc = F.struct(
                *[F.col(k).alias(k) for k in spec.keys],
                F.col(ivm_delta._CNT).alias(ivm_delta._CNT),
                *[F.col(sm) for sm in spec.sums],
                *[F.col(ivm_delta._nn(sm)) for sm in spec.sums],
            )
            self.store.write(
                f"{view.name}__jc_agg_state",
                agg_state.select(group_id.alias(view.key), agg_doc.alias("doc")),
                key=view.key,
            )

    def _write_joinagg_states(self, view: ViewDef, a: DataFrame, b: DataFrame, agg: DataFrame) -> None:
        spec = view.joinagg
        self._write_mult_state(view, f"{view.name}__ja_a_state", a)
        self._write_mult_state(view, f"{view.name}__ja_b_state", b)
        group_id = self._state_row_id(list(spec.keys))
        agg_doc = F.struct(
            *[F.col(k).alias(k) for k in spec.keys],
            F.col(ivm_delta._CNT).alias(ivm_delta._CNT),
            *[F.col(sm) for sm in spec.sums],
            *[F.col(ivm_delta._nn(sm)) for sm in spec.sums],
        )
        self.store.write(
            f"{view.name}__ja_agg_state",
            agg.select(group_id.alias(view.key), agg_doc.alias("doc")),
            key=view.key,
        )

    def _rebuild_lane_states(self, view: ViewDef, lsn: int | None = None) -> None:
        """(Re)derive every lane state for ``view`` from the CURRENT
        catalog tables and install it. Called at backfill (fact ==
        snapshot point — the one unambiguous moment) and at the end of a
        fallback refresh (fact == post-batch, the new snapshot point;
        ``lsn`` then carries the batch's max change position so a
        redelivery of that batch is suppressed by the replay guard).
        With states seeded here, the first CDC batch folds exactly once
        even when the live table already reflects it; the in-hook
        initialization path remains only for engines that stream without
        a backfill (then the first batch must arrive with the fact still
        at the snapshot point, as the lane tests do)."""
        from sinker_spark import ivm_bloom, ivm_hll, ivm_topk

        if view.agg is not None:
            spec = view.agg
            self._write_agg_state(
                view,
                ivm_delta.initial_agg_state(
                    self.spark.table(spec.table), spec.keys, spec.sums, spec.maxes, spec.mins
                ),
            )
        if view.topk is not None:
            spec = view.topk
            fact = self._schema_select(self.spark.table(spec.table), spec.row_schema)
            rows, counts = ivm_topk.initial_topk_state(
                fact, spec.keys, spec.order_col, spec.id_col, spec.k, spec.buffer
            )
            self._write_topk_states(view, rows, counts)
        if view.join is not None:
            spec = view.join
            a = self._schema_select(self.spark.table(spec.table_a), spec.row_schema_a)
            b = self._schema_select(self.spark.table(spec.table_b), spec.row_schema_b)
            init_j = {
                "inner": ivm_delta.initial_join_state,
                "left": ivm_delta.initial_left_join_state,
                "full": ivm_delta.initial_full_join_state,
            }[spec.how]
            self._write_join_states(
                view,
                ivm_delta.relation_state(a),
                ivm_delta.relation_state(b),
                init_j(a, b, spec.on),
            )
        if view.joinagg is not None:
            spec = view.joinagg
            a = self._schema_select(self.spark.table(spec.table_a), spec.row_schema_a)
            b = self._schema_select(self.spark.table(spec.table_b), spec.row_schema_b)
            self._write_joinagg_states(
                view,
                ivm_delta.relation_state(a),
                ivm_delta.relation_state(b),
                ivm_delta.initial_agg_state(
                    a.join(b, spec.on, spec.how), spec.keys, spec.sums
                ),
            )
        if view.joinchain is not None:
            r_states, j_states, agg_state = self._initial_chain_states(view.joinchain)
            self._write_chain_states(view, r_states, j_states, agg_state)
        if view.nesteddoc is not None:
            p, c = self._initial_nested_doc_states(view.nesteddoc)
            self._write_nested_doc_states(view, p, c)
        if view.doctree is not None:
            self._write_doctree_states(view)
        if view.distinct is not None:
            spec = view.distinct
            if spec.exact:
                self._write_dc_state(
                    view,
                    ivm_delta.initial_distinct_state(
                        self.spark.table(spec.table), spec.keys, spec.value_col
                    ),
                )
            else:
                self._write_hll_state(
                    view,
                    ivm_hll.initial_hll_state(
                        self.spark.table(spec.table), spec.keys, spec.value_col
                    ),
                )
        if view.membership is not None:
            spec = view.membership
            self._write_bloom_state(
                view,
                ivm_bloom.initial_bloom_state(
                    self.spark.table(spec.table), spec.value_col, spec.m_bits
                ),
            )
        # record the rebuilt states' versions (and the change position
        # the rebuild incorporates) so the replay guard starts clean
        self._write_lane_marker(view, lsn)

    def _lane_doc_keys(self, view: ViewDef) -> list[DataFrame]:
        """One-column (view.key) frames of every doc id the lanes may
        have upserted and not yet deleted — the sink's possible key set
        beyond the doc snapshot. Sound because each lane emits a DELETE
        action in the same batch a key leaves its state, so any key
        still live in the sink is in the snapshot or in a current lane
        state."""
        frames: list[DataFrame] = []

        def stored_keys(name: str) -> None:
            packed = self.store.read(name)
            if packed is not None:
                frames.append(packed.select(F.col(view.key).cast("string").alias(view.key)))

        def stored_doc_ids(name: str, keys: list[str]) -> None:
            # the store's physical key is the NULL-unambiguous md5 row id
            # (_state_row_id), NOT the sink doc id — rebuild the doc id
            # the lane serves (concat_ws over the group keys) from the
            # state's own columns. Spec-key edits need a manual reset,
            # per the _checked_state contract (surviving subset used).
            packed = self.store.read(name)
            if packed is not None:
                state = packed.select("doc.*")
                cols = [k for k in keys if k in state.columns]
                frames.append(
                    state.select(
                        F.concat_ws("|", *[F.col(k).cast("string") for k in cols]).alias(view.key)
                    ).distinct()
                )

        if view.agg is not None:
            stored_doc_ids(f"{view.name}__aggstate", view.agg.keys)
        if view.topk is not None:
            stored_doc_ids(f"{view.name}__topkcounts", view.topk.keys)
        if view.joinagg is not None:
            stored_doc_ids(f"{view.name}__ja_agg_state", view.joinagg.keys)
        if view.membership is not None:
            stored_keys(f"{view.name}__bloomstate")
        if view.distinct is not None:
            spec = view.distinct
            packed = self.store.read(
                f"{view.name}__dcstate" if spec.exact else f"{view.name}__hllstate"
            )
            if packed is not None:
                # doc ids were built from the keys of the spec IN FORCE
                # when the state was written; after a spec edit those are
                # the state's own non-reserved columns, not spec.keys
                state = packed.select("doc.*")
                reserved = (
                    {ivm_delta._VAL, ivm_delta._CNT} if spec.exact else {"bucket", "r"}
                )
                old_keys = [c for c in state.columns if c not in reserved]
                frames.append(
                    state.select(
                        F.concat_ws("|", *[F.col(k).cast("string") for k in old_keys]).alias(view.key)
                    )
                    .distinct()
                )
        if view.joinchain is not None:
            spec = view.joinchain
            if spec.keys is not None:
                # aggregate mode: rebuild doc ids from the group keys
                stored_doc_ids(f"{view.name}__jc_agg_state", spec.keys)
            else:
                packed = self.store.read(f"{view.name}__jc_j{len(spec.tables)}")
                if packed is not None:
                    state = packed.select("doc.*")
                    cols = [k for k in spec.key_cols if k in state.columns]
                    frames.append(
                        state.select(
                            F.concat_ws("|", *[F.col(k).cast("string") for k in cols]).alias(view.key)
                        )
                        .distinct()
                    )
        if view.nesteddoc is not None:
            spec = view.nesteddoc
            state = self.keyed.read(f"{view.name}__nd_p_state")
            if state is not None:
                cols = [k for k in spec.on if k in state.columns]
                frames.append(
                    state.select(
                        F.concat_ws("|", *[F.col(k).cast("string") for k in cols]).alias(view.key)
                    )
                    .distinct()
                )
        if view.doctree is not None:
            state = self.keyed.read(f"{view.name}__dt_p")
            if state is not None and view.doctree.key in state.columns:
                frames.append(
                    state.select(
                        F.col(view.doctree.key).cast("string").alias(view.key)
                    ).distinct()
                )
        if view.join is not None:
            packed = self.store.read(f"{view.name}__join_state")
            if packed is not None:
                spec = view.join
                state = packed.select("doc.*")
                # after a spec edit the state may predate new key_cols:
                # use the surviving subset (exact whenever key_cols are
                # unchanged; a key_cols EDIT needs a manual reset, as the
                # _checked_state contract documents)
                cols = [k for k in spec.key_cols if k in state.columns]
                frames.append(
                    state.select(
                        F.concat_ws("|", *[F.col(k).cast("string") for k in cols]).alias(view.key)
                    )
                    .distinct()
                )
        return frames

    def _lane_fallback_refresh(
        self, view: ViewDef, epoch_id: int | None = None, max_lsn: int | None = None
    ) -> None:
        """Authoritative repair for a lane view that could not fold this
        batch (missing before-images, or a non-lane dependency changed).
        The normal recompute-and-diff is UNSOUND here: the delta lanes
        write the sink directly without refreshing the doc snapshot, so
        a key they changed since the last snapshot write diffs as
        unchanged (the sink keeps a stale value) or is missed entirely
        (ghost doc). Repair: full recompute, upsert EVERY doc (the sink
        is idempotent by contract), delete every key known to the old
        snapshot or any lane state that the recompute no longer
        produces, install the fresh snapshot, and rebuild the lane
        states from the post-batch catalog tables so the next fold is
        exact. Costs one backfill of the view — the reference's
        EVERY-refresh cost (query_templates.py:13) — paid only on this
        exceptional path."""
        from sinker_spark.ivm import SchemaEvolutionError, check_doc_schema_evolution

        new_df = view.compile(self.spark).localCheckpoint(eager=True)
        old = self.store.read(view.name)
        old_keys = None
        if old is not None:
            old_keys = old.select(F.col(view.key).cast("string").alias(view.key))
            try:
                check_doc_schema_evolution(
                    view.name, old.schema["doc"].dataType, new_df.schema["doc"].dataType
                )
            except SchemaEvolutionError:
                if self.on_schema_change != "reset" or not hasattr(self.store, "reset"):
                    raise
                logger.warning(
                    "view %s: breaking doc schema change on lane fallback — resetting "
                    "snapshot (on_schema_change='reset')", view.name
                )
                old_keys = old_keys.localCheckpoint(eager=True)
                self.store.reset(view.name)
        known = ([old_keys] if old_keys is not None else []) + self._lane_doc_keys(view)
        doc_type = new_df.schema["doc"].dataType
        upserts = new_df.select(
            F.col(view.key), F.lit(UPSERT).alias("op"), F.col("doc")
        )
        actions = upserts
        if known:
            allk = known[0]
            for k in known[1:]:
                allk = allk.unionByName(k)
            deletes = (
                allk.distinct()
                .join(new_df, view.key, "left_anti")
                .select(
                    F.col(view.key),
                    F.lit(DELETE).alias("op"),
                    F.lit(None).cast(doc_type).alias("doc"),
                )
            )
            actions = upserts.unionByName(deletes)
        counts = self._apply_counted(view, actions)
        self.store.write(view.name, new_df, key=view.key)
        # post-batch tables already include every change up to max_lsn,
        # so the rebuilt states carry that watermark for replay suppression
        self._rebuild_lane_states(view, lsn=max_lsn)
        self.last_stats[view.name] = {
            "upserts": counts.get(UPSERT, 0),
            "deletes": counts.get(DELETE, 0),
            "lane_fallback": 1,
        }
        logger.info("lane-fallback refreshed view %s (epoch %s): %s", view.name, epoch_id,
                    self.last_stats[view.name])

    def _targeted_refresh_one(self, view: ViewDef, scope: DataFrame, epoch_id: int | None) -> None:
        """Partial recompute: only docs whose keys are in scope are
        re-joined, diffed, pushed, and merged into the snapshot
        (SnapshotStore.refresh_partial — beyond the reference, whose
        CONCURRENTLY refresh always re-runs the full view query).

        A doc schema change makes the targeted merge illegal (mixed-
        schema snapshot): the store raises; under
        ``on_schema_change='reset'`` escalate to the full-refresh lane,
        which applies the reset+backfill policy in one place."""
        from sinker_spark.ivm import SchemaEvolutionError

        new_partial = view.compile_scoped(self.spark, scope)
        try:
            delta = self.store.refresh_partial(view.name, new_partial, scope, key=view.key)
        except SchemaEvolutionError:
            if self.on_schema_change != "reset":
                raise
            self._refresh_one(view, epoch_id)
            return
        counts = {r["op"]: r["n"] for r in delta.groupBy("op").agg(F.count("*").alias("n")).collect()}
        self.sink.apply_actions(view.index, delta)
        self.last_stats[view.name] = {
            "upserts": counts.get(UPSERT, 0),
            "deletes": counts.get(DELETE, 0),
            "targeted": 1,
        }
        logger.info("targeted-refreshed view %s (epoch %s): %s", view.name, epoch_id,
                    self.last_stats[view.name])

    # -- continuous run (reference Runner.run, runner.py:68-71) ----------
    def run_stream(
        self,
        cdc_stream: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int = 10,
        available_now: bool = False,
    ):
        """Structured Streaming driver: the 10s processingTime trigger is
        the reference's SINKER_POLL_INTERVAL (settings.py:20);
        ``available_now`` drains the backlog then stops (initial sync)."""
        writer = (
            cdc_stream.writeStream.foreachBatch(self.process_cdc_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()

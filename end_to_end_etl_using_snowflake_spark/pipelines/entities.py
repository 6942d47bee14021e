"""The three reference entity pipelines (customer / item / order),
wired exactly as the 5-task chains in
reference etl_script/{customer,item,order}-end-to-end-pipeline-script.sql:

    pause_pipe_<e>  (WHEN stage stream has data; customer-...sql:62-68)
      -> <e>_raw_tsk       MERGE stage-stream -> raw       (customer-...sql:71-114)
      -> dim_<e>_tsk       MERGE raw-stream   -> dim       (customer-...sql:118-165)
         / fact_order_tsk  INSERT OVERWRITE fact rebuild   (order-...sql:173-212)
      -> truncate_staging_table_<e>                        (customer-...sql:168-172)
      -> play_pipe_<e>                                     (customer-...sql:175-179)

Reference bugs intentionally fixed, not replicated (SURVEY §7.5): the
item pause task pauses the ITEM pipe (item-...sql:61 pauses customer's
by copy-paste), task names use the systematic ``<layer>_<entity>_stm``
convention, and AFTER chains reference tasks that exist.

The clock is injectable so ``current_timestamp()`` defaults
(customer-...sql:42-43) are testable against golden outputs.

Scale: dims merge via broadcast-anti-join (CDC batches are tiny);
fact_order is INSERT OVERWRITE like the reference (order-...sql:179) —
at 100 TB the same task body runs with ``overwrite_partitions`` on
order_date so a daily batch rewrites only touched dates.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import merge as M
from ..plans.catalog import ManagedTable, Warehouse
from ..sources import csv_format as CF
from ..sources.pipe import Pipe
from ..streaming.tasks import Task, TaskDag

Clock = Callable[[], datetime]


def _utc_now() -> datetime:
    return datetime.now(timezone.utc)


class EntityPipelines:
    """Builds the warehouse tables, pipes, and task DAGs for all three
    entities over a landing directory tree ``<landing>/<entity>/*.csv``."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: Warehouse,
        landing_root: str,
        clock: Clock = _utc_now,
        fact_mode: str = "rebuild",
    ):
        """``fact_mode``:

        - ``"rebuild"`` (reference parity): INSERT OVERWRITE the whole
          fact from all of raw_order every cycle (order-...sql:179) —
          O(history) per cycle.
        - ``"incremental"`` (100 TB posture): raw_order AND fact are
          partitioned by a derived ``__month`` key (a prefix of the
          order_date business key, never in the logical schema); a
          cycle partition-prunes the raw MERGE to the months the batch
          carries, recomputes ONLY those months of the fact, and
          dynamic-partition-overwrites them — O(touched partitions),
          exact even when the batch *updates* an existing order (the
          whole affected month is recomputed from raw, so no
          delta-vs-old bookkeeping). Assumes dim key mappings are
          stable (SCD-1 in-place updates — true here); a dim key
          reassignment requires one full rebuild.
        """
        if fact_mode not in ("rebuild", "incremental"):
            raise ValueError(f"unknown fact_mode {fact_mode!r}")
        self.spark = spark
        self.wh = warehouse
        self.landing_root = landing_root
        self.clock = clock
        self.fact_mode = fact_mode

        self.stage: dict[str, ManagedTable] = {}
        self.raw: dict[str, ManagedTable] = {}
        self.pipes: dict[str, Pipe] = {}
        for entity, schema in CF.STAGE_SCHEMAS.items():
            self.stage[entity] = warehouse.table("stg", f"stg_{entity}", schema)
            # incremental posture: raw_order partitions on a derived
            # __month key (prefix of order_date, part of its business
            # key), enabling the partition-pruned MERGE in _raw_task —
            # the Snowflake micro-partition-pruning analog. Month, not
            # day: partition granularity is chosen by volume (a month
            # of orders ≈ one healthy partition at warehouse scale; a
            # partition-per-day layout at test SF degenerates to
            # thousands of near-empty directories and the listing tax
            # swamps the pruning win). __month never enters the logical
            # schema — it exists only as a directory key (read()
            # suppresses it via the explicit schema).
            raw_parts = (
                ("__month",)
                if entity == "order" and fact_mode == "incremental"
                else ()
            )
            self.raw[entity] = warehouse.table(
                "raw", f"raw_{entity}", schema, partition_by=raw_parts
            )
            self.pipes[entity] = Pipe(
                spark,
                f"stg_{entity}_pipe",
                os.path.join(landing_root, entity),
                self.stage[entity],
                schema,
            )
        self.dim_customer = warehouse.table("transformed", "dim_customer", CF.DIM_CUSTOMER)
        self.dim_item = warehouse.table("transformed", "dim_item", CF.DIM_ITEM)
        self.fact_order = warehouse.table(
            "transformed",
            "fact_order",
            CF.FACT_ORDER,
            partition_by=("__month",) if fact_mode == "incremental" else (),
        )

        # post-state of the most recent FULL fact rebuild (rebuild mode
        # only): the written table's exact rows, persisted, so the
        # backfill audit aggregates memory instead of re-scanning the
        # fact from disk (VERDICT r16 #3). None until a rebuild runs;
        # never set in incremental mode (a delta cycle's frame holds
        # only the touched months). A cycle that SKIPS the fact task
        # leaves the table untouched, so an existing stash stays valid.
        self._fact_post_state: DataFrame | None = None

        self.dags = {
            "customer": self._build_dag("customer", self._dim_customer_task),
            "item": self._build_dag("item", self._dim_item_task),
            "order": self._build_dag("order", self._fact_order_task),
        }

    # ------------------------------------------------------------------
    # task DAG assembly (identical 5-task shape x3, README.md:61-65)
    # ------------------------------------------------------------------
    def _build_dag(self, entity: str, transform_body: Callable[[], None]) -> TaskDag:
        dag = TaskDag(self.spark, entity)
        pipe = self.pipes[entity]
        stage = self.stage[entity]
        transform_name = {
            "customer": "dim_customer_tsk",
            "item": "dim_item_tsk",
            "order": "fact_order_tsk",
        }[entity]

        dag.add(
            Task(
                f"pause_pipe_{entity}",
                body=pipe.pause,
                when=lambda: stage.changelog.stream_has_data("raw_tsk"),
            )
        )
        dag.add(
            Task(
                f"{entity}_raw_tsk",
                body=lambda: self._raw_task(entity),
                after=f"pause_pipe_{entity}",
            )
        )
        dag.add(Task(transform_name, body=transform_body, after=f"{entity}_raw_tsk"))
        dag.add(
            Task(
                f"truncate_staging_table_{entity}",
                body=stage.truncate,
                after=transform_name,
            )
        )
        dag.add(
            Task(
                f"play_pipe_{entity}",
                body=pipe.resume,
                after=f"truncate_staging_table_{entity}",
                # order variant guards resume on the stage stream being
                # fully drained (order-...sql:226-227)
                when=lambda: not stage.changelog.stream_has_data("raw_tsk"),
            )
        )
        return dag

    # ------------------------------------------------------------------
    # task bodies
    # ------------------------------------------------------------------
    MERGE_KEYS = {
        "customer": ["customer_id"],
        "item": ["item_id"],
        # composite business key (order-...sql:113-116)
        "order": ["order_date", "order_time", "item_id", "item_desc"],
    }

    def _raw_task(self, entity: str) -> None:
        """MERGE stage-stream -> raw (M1; customer-...sql:77-114).

        The item variant dedups the batch latest-per-key first
        (item-...sql:72-75); we apply latest-wins dedup on the
        changelog version for every entity — same semantics, and
        required for multi-file batches that touch one key twice.
        """
        stage = self.stage[entity]
        src, version = stage.changelog.stream_read("raw_tsk")
        if src is None:
            return
        keys = self.MERGE_KEYS[entity]
        order_cols = [F.col("_version").desc()]
        if entity == "item":
            # reference order: start_date desc (item-...sql:74), version as tie-break
            order_cols = [F.col("start_date").desc(), F.col("_version").desc()]
        # total tiebreak: a multi-file batch can carry two rows with the
        # SAME key and version (e.g. composite-key collisions in a bulk
        # backfill); Snowflake would raise a nondeterministic-merge
        # error, we pick the lexicographically greatest row instead so
        # the outcome never depends on file/partition layout
        order_cols += [
            F.col(c).desc()
            for c in sorted(self.raw[entity].schema.names)
            if c not in keys
        ]
        # one dedup pass serves both the merge source and the changelog
        # record (it was previously computed for each) — except on the
        # unpartitioned initial load, where the shared-write path
        # consumes it exactly once and a persist would only add a cache
        # materialization pass (r17)
        raw = self.raw[entity]
        single_use = not raw.storage.partition_by and not raw.storage.exists()
        deduped = M.dedup_latest(src.drop("_action"), keys, order_cols)
        if not single_use:
            deduped = deduped.persist()
        try:
            month = F.substring(F.col("order_date"), 1, 7)
            if raw.storage.partition_by and raw.storage.exists():
                # partition-pruned MERGE (the Snowflake micro-partition
                # pruning analog): the __month partition key is a prefix
                # of the business key's order_date, so a batch can only
                # touch partitions it carries values for. Read ONLY
                # those directories (path-pruned — the rest of the
                # table is never listed), merge against that subset,
                # and rewrite only those partitions. Per-cycle cost is
                # O(touched partitions), not O(history) — the property
                # that keeps a continuously-merged 100 TB raw table
                # maintainable. The touched list is O(distinct months),
                # a bounded driver-side list — never row data.
                touched = [
                    r[0] for r in deduped.select(month.alias("m")).distinct().collect()
                ]
                target = raw.read_partitions(touched)
                merged = M.merge_dataframes(
                    target,
                    deduped,
                    keys=keys,
                    update_cols=[c for c in raw.schema.names if c not in keys],
                )
                raw.overwrite_partitions(
                    merged.select(*raw.schema.names).withColumn("__month", month),
                    changes=deduped.drop("_version"),
                )
            else:
                target_empty = not raw.storage.exists()
                merged = M.merge_dataframes(
                    raw.read(),
                    deduped,
                    keys=keys,
                    update_cols=[c for c in raw.schema.names if c not in keys],
                    target_known_empty=target_empty,
                )
                out = merged.select(*raw.schema.names)
                if raw.storage.partition_by:  # incremental initial load
                    out = out.withColumn("__month", month)
                    raw.overwrite(out, changes=deduped.drop("_version"))
                elif target_empty:
                    # initial load: the post-state IS the deduped batch
                    # (same rows, same column order), so let the
                    # shared-write path compute and write it once and
                    # hardlink the changelog version (r16) instead of
                    # running the record job + the overwrite job
                    raw.overwrite(out, changes=None)
                else:
                    raw.overwrite(out, changes=deduped.drop("_version"))
        finally:
            if not single_use:
                deduped.unpersist()
        stage.changelog.stream_commit("raw_tsk", version)

    def _now_lit(self):
        return F.lit(self.clock().replace(tzinfo=None)).cast("timestamp")

    def _dim_customer_task(self) -> None:
        """MERGE raw-stream -> typed dim_customer (M2;
        customer-...sql:118-165): implicit varchar casts become explicit,
        updated_timestamp refreshes on match (customer-...sql:139),
        identity + both timestamps assigned on insert."""
        raw = self.raw["customer"]
        src, version = raw.changelog.stream_read("dim_tsk")
        if src is None:
            return
        src = M.dedup_latest(src, ["customer_id"], [F.col("_version").desc()])
        typed = src.select(
            "customer_id",
            "salutation",
            "first_name",
            "last_name",
            F.col("birth_day").cast("int").alias("birth_day"),
            F.col("birth_month").cast("int").alias("birth_month"),
            F.col("birth_year").cast("int").alias("birth_year"),
            "birth_country",
            "email_address",
            "is_active",
        ).persist()  # reused: merge source + changelog record
        now = self._now_lit()
        target_empty = not self.dim_customer.storage.exists()
        merged = M.merge_dataframes(
            self.dim_customer.read(),
            typed,
            keys=["customer_id"],
            matched_set={"updated_timestamp": now},
            insert_defaults={"added_timestamp": now, "updated_timestamp": now},
            target_known_empty=target_empty,
        )
        if not target_empty:
            # fill_identity + write = multiple passes; cache the merge
            # once. On the initial load the merge is a pure projection
            # over the (already cached) typed batch — a second persist
            # would only add a cache materialization pass (r17).
            merged = merged.persist()
        try:
            out = M.fill_identity(
                merged,
                "customer_dim_key",
                order_by=["customer_id"],
                # initial load: every key is NULL by construction — skip
                # fill_identity's max() pass (one fewer job per cycle)
                # and its isNull/isNotNull split + union (r17, all_new)
                existing_max=0 if target_empty else None,
                all_new=target_empty,
            )
            self.dim_customer.overwrite(
                out.select(*self.dim_customer.schema.names), changes=typed
            )
        finally:
            if not target_empty:
                merged.unpersist()
            typed.unpersist()
        raw.changelog.stream_commit("dim_tsk", version)

    def _dim_item_task(self) -> None:
        """MERGE raw-stream -> typed dim_item (item-...sql:111-151);
        empty END_DATE stays NULL = current row."""
        raw = self.raw["item"]
        src, version = raw.changelog.stream_read("dim_tsk")
        if src is None:
            return
        src = M.dedup_latest(
            src, ["item_id"], [F.col("start_date").desc(), F.col("_version").desc()]
        )
        typed = src.select(
            "item_id",
            "item_desc",
            F.col("start_date").cast("date").alias("start_date"),
            F.col("end_date").cast("date").alias("end_date"),
            F.col("price").cast("decimal(7,2)").alias("price"),
            "item_class",
            "item_category",
            "is_active",
        ).persist()  # reused: merge source + changelog record
        now = self._now_lit()
        target_empty = not self.dim_item.storage.exists()
        merged = M.merge_dataframes(
            self.dim_item.read(),
            typed,
            keys=["item_id"],
            matched_set={"updated_timestamp": now},
            insert_defaults={"added_timestamp": now, "updated_timestamp": now},
            target_known_empty=target_empty,
        )
        if not target_empty:
            # see _dim_customer_task: persist only when the merge
            # actually joins (r17)
            merged = merged.persist()
        try:
            out = M.fill_identity(
                merged,
                "item_dim_key",
                order_by=["item_id"],
                existing_max=0 if target_empty else None,
                all_new=target_empty,
            )
            self.dim_item.overwrite(out.select(*self.dim_item.schema.names), changes=typed)
        finally:
            if not target_empty:
                merged.unpersist()
            typed.unpersist()
        raw.changelog.stream_commit("dim_tsk", version)

    def _fact_order_task(self) -> None:
        """INSERT OVERWRITE fact_order rebuild (M3; order-...sql:179-212):
        star join raw_order x dim_customer x dim_item(end_date IS NULL),
        3-key group, count + 7 implicit-cast SUMs, ordered by order_date.
        Reads the raw TABLE (not the stream) — the stream only triggers
        (order-...sql:176-177) and is consumed to reset it.

        In ``fact_mode="incremental"`` the batch's distinct months
        restrict the recompute (path-pruned read of raw's __month
        partitions) and only those fact partitions are rewritten —
        same result, O(touched partitions)."""
        raw = self.raw["order"]
        # drop the previous rebuild's persisted post-state BEFORE
        # building this cycle's plan: the new rebuild reads the same
        # table paths, so its logical plan is structurally identical
        # to the cached one and Spark's CacheManager would substitute
        # the STALE cycle-N-1 rows for the cycle-N computation (the
        # read-after-swap cache-collision hazard; caught by
        # test_step2_delta1_inserts when the stash outlived the task).
        if self._fact_post_state is not None:
            self._fact_post_state.unpersist()
            self._fact_post_state = None
        src, version = raw.changelog.stream_read("fact_tsk")
        ro = raw.read()
        incremental = self.fact_mode == "incremental"
        if incremental:
            if src is None:
                return
            # the recompute unit is the __month partition (the
            # overwrite granularity): every month the batch touches is
            # rebuilt whole from raw — exact even when the batch
            # updates existing orders. Path-pruned read: only the
            # touched month directories of raw are listed/scanned.
            # O(distinct months) driver-side, never row data.
            touched = [
                r[0]
                for r in src.select(
                    F.substring(F.col("order_date"), 1, 7).alias("m")
                )
                .distinct()
                .collect()
            ]
            ro = self.raw["order"].read_partitions(touched)
        dc = self.dim_customer.read().select("customer_dim_key", "customer_id")
        di = (
            self.dim_item.read()
            .filter(F.col("end_date").isNull())  # current SCD row (order-...sql:207)
            .select("item_dim_key", "item_id")
        )
        money = lambda c: F.col(c).cast("decimal(20,2)")  # noqa: E731
        agg = (
            ro.join(F.broadcast(dc), "customer_id")
            .join(F.broadcast(di), "item_id")
            .groupBy(
                F.col("order_date").cast("date").alias("order_date"),
                "customer_dim_key",
                "item_dim_key",
            )
            .agg(
                F.count(F.lit(1)).alias("order_count"),
                F.sum(F.col("order_quantity").cast("long")).alias("order_quantity"),
                F.sum(money("sale_price")).cast("decimal(20,2)").alias("sale_price"),
                F.sum(money("disount_amt")).cast("decimal(20,2)").alias("disount_amt"),
                F.sum(money("coupon_amt")).cast("decimal(20,2)").alias("coupon_amt"),
                F.sum(money("net_paid")).cast("decimal(20,2)").alias("net_paid"),
                F.sum(money("net_paid_tax")).cast("decimal(20,2)").alias("net_paid_tax"),
                F.sum(money("net_profit")).cast("decimal(20,2)").alias("net_profit"),
            )
            # The reference's ORDER BY order_date (O1, order-...sql:212)
            # is dropped here (r16): fill_identity's bucketed rank
            # re-shuffles by hash(__bkt) and unions afterwards, so the
            # sort never reached the stored layout — it was a pure
            # range-exchange + sort cost (Snowflake likewise treats
            # INSERT ... SELECT ORDER BY as a clustering hint, not a
            # semantic guarantee). The audit oracle is order-insensitive
            # and the identity assignment orders by (order_date,
            # customer_dim_key, item_dim_key) independently of input
            # order, so the final state is bit-identical.
        )
        agg = agg.withColumn("order_fact_key", F.lit(None).cast("long")).persist()
        try:
            # full rebuild: order_fact_key was literally just added as
            # NULL — its max() is provably None; skip the pass
            existing_max = 0
            if incremental and self.fact_order.storage.exists():
                # exact max from the parquet footer statistics (r17):
                # O(files) driver metadata instead of a full fact scan
                # + one Spark job per delta cycle — and unlike the
                # rejected lazy in-plan seed (r16), the footers are
                # read BEFORE the partition overwrite, so there is no
                # read-while-write hazard. Falls back to the scan when
                # any row group lacks stats.
                m = self.fact_order.storage.column_max("order_fact_key")
                if m is None:
                    row = self.fact_order.read().agg(F.max("order_fact_key")).first()
                    m = row[0] if row else None
                existing_max = int(m) if m is not None else 0
            rebuilt = M.fill_identity(
                agg,
                "order_fact_key",
                order_by=["order_date", "customer_dim_key", "item_dim_key"],
                existing_max=existing_max,
                # every key was literally just added as lit(NULL): skip
                # the isNull/isNotNull split + union (r17, all_new)
                all_new=True,
            )
            out = rebuilt.select(*self.fact_order.schema.names)
            fact_month = F.date_format(F.col("order_date"), "yyyy-MM")
            if incremental and self.fact_order.storage.exists():
                # rewrite only the touched month partitions; changelog
                # records the rewritten groups (UPSERT granularity)
                self.fact_order.overwrite_partitions(
                    out.withColumn("__month", fact_month), changes=out
                )
            elif incremental:
                self.fact_order.overwrite(
                    out.withColumn("__month", fact_month), changes=out
                )
            else:
                # full rebuild: the written table IS this frame — keep a
                # persisted handle so the post-cycle audit can aggregate
                # the in-memory rows instead of re-scanning the table
                # from disk (VERDICT r16 #3; one full fact scan per
                # cycle saved — at 100 TB that is a whole table pass).
                # The cache materializes during the write job itself; a
                # recompute after eviction replays the same
                # deterministic plan over raw/dims. Incremental cycles
                # never stash (their `out` holds only touched months).
                out = out.persist()
                self.fact_order.overwrite(out)
                self._fact_post_state = out
        finally:
            agg.unpersist()
        raw.changelog.stream_commit("fact_tsk", version)

    # ------------------------------------------------------------------
    # cycle driver (T5: pause -> merge -> truncate -> resume)
    # ------------------------------------------------------------------
    def run_cycle(self, entity: str) -> list:
        """One scheduled wake-up for one entity: poll the pipe, then walk
        the 5-task chain. Order cycles must run after customer/item
        (cross-entity dependency, order-...sql:204-207)."""
        self.pipes[entity].refresh()
        return self.dags[entity].run_cycle()

    def run_all(self) -> dict[str, list]:
        """One wake-up for all three entities.

        customer and item are fully independent (disjoint pipes,
        manifests, stage/raw tables, dims, changelog metas, task DAGs),
        so their cycles run CONCURRENTLY from a 2+1-thread pool — each
        entity's chain of small jobs back-fills executor slots the
        other's stragglers leave idle (Spark schedules concurrent jobs
        FIFO; job submission is thread-safe). The order pipe refresh
        (landing-CSV ingest, touches only stg_order) overlaps too; the
        order TASK CHAIN still runs strictly after both dim cycles —
        its fact task joins dim_customer x dim_item (the cross-entity
        dependency, order-...sql:204-207). Results are unchanged: the
        overlapped work shares no tables, and each DAG's own
        pause->merge->truncate->resume ordering is preserved inside
        its thread (r16; steady-state full cycle 13.9 -> 9.5 s at
        sf0.1, same warehouse state and audit).

        Failure semantics (changed from the sequential form, ADVICE
        r16): if the customer cycle raises, its exception propagates
        from ``fc.result()`` only after the pool's shutdown lets the
        item/order-refresh futures finish — item side effects land
        even when customer fails (previously the sequential loop
        short-circuited), and an order-refresh exception surfaces
        only after both dim results are consumed. Each cycle is
        individually idempotent (T1), so a partial wake-up re-runs
        safely. An injected ``clock`` callable is now invoked from
        multiple threads — the default ``_utc_now`` is thread-safe;
        a stateful test Clock must be too."""
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            fc = pool.submit(self.run_cycle, "customer")
            fi = pool.submit(self.run_cycle, "item")
            fo = pool.submit(self.pipes["order"].refresh)
            out = {"customer": fc.result(), "item": fi.result()}
            fo.result()
        out["order"] = self.dags["order"].run_cycle()
        return out

    def run_streaming(
        self,
        entity: str,
        checkpoint_dir: str,
        processing_time: str | None = None,
    ):
        """Continuous mode (T3): one Structured Streaming query per
        entity whose micro-batch IS the reference's 5-task cycle.

        The root task's ``schedule = '1 minute'`` (customer-...sql:64)
        maps to ``processing_time="60 seconds"``; ``None`` = drain the
        backlog with ``availableNow`` and stop (the test/batch mode).
        The pause->merge->truncate->resume discipline (T5) needs no
        actual pausing here: a micro-batch is stable by construction,
        so the task chain runs inside ``foreachBatch`` after the stage
        append, and the WHEN gates (stream-has-data) still apply.
        Exactly-once per file across restarts comes from the stream
        checkpoint; the merge bodies are idempotent (T1), so a crash
        between stage append and offset commit replays safely.

        Cross-entity ordering still matters (order joins both dims,
        order-...sql:204-207): start customer/item queries before the
        order query, or drive order in batch mode after them.
        """
        dag = self.dags[entity]
        return self.pipes[entity].start_stream(
            checkpoint_dir,
            available_now=processing_time is None,
            processing_time=processing_time,
            on_batch=dag.run_cycle,
        )

    def layer_tables(self) -> dict[str, DataFrame]:
        """P1 layer-inspection surface (customer-...sql:212-216)."""
        out = {}
        for e in CF.STAGE_SCHEMAS:
            out[f"stg.stg_{e}"] = self.stage[e].read()
            out[f"raw.raw_{e}"] = self.raw[e].read()
        out["transformed.dim_customer"] = self.dim_customer.read()
        out["transformed.dim_item"] = self.dim_item.read()
        out["transformed.fact_order"] = self.fact_order.read()
        return out

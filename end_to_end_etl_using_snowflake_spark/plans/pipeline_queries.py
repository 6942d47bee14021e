"""Pipeline-surface driver queries: run the full reference replay
(history -> delta_1 -> delta_2, FIXTURES.md §A.2) inside a scratch
warehouse and expose each layer / observability surface as a DataFrame.

These are rows-only entries (no oracle SQL): the pipeline is stateful
multi-step ingest, not a single SQL expression over the pre-registered
views. Value-level correctness is enforced elsewhere — golden
assertions in tests/test_pipeline_replay.py (row counts, SCD-1 update
semantics, frozen-clock timestamps, fact measure values) and the
SQL-oracled MERGE state equations (m1/m2 queries).

Timestamp columns are frozen via the injected clock and identity keys
are contiguous-by-construction, so even the rows-only outputs are
deterministic run to run.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register

_REFERENCE_DATA = "/root/reference/source_data"
_STEPS = {
    1: ["customer_history.csv", "item_history.csv", "order_history.csv"],
    2: ["customer_delta_1.csv", "item_delta_1.csv", "order_delta_1.csv"],
    3: ["customer_delta_2.csv", "item_delta_2.csv"],
}
_memo: dict[int, object] = {}


def _replayed(spark: SparkSession):
    """Run the 3-step replay once per process; memoized."""
    key = id(spark)
    if key in _memo:
        return _memo[key]
    from ..pipelines.entities import EntityPipelines
    from ..plans.catalog import Warehouse

    base = tempfile.mkdtemp(prefix="etl_replay_", dir=tempfile.gettempdir())
    landing = os.path.join(base, "landing")
    for e in ("customer", "item", "order"):
        os.makedirs(os.path.join(landing, e))
    clocks = {s: datetime(2020, 1, s, tzinfo=timezone.utc) for s in _STEPS}
    state = {"step": 1}
    pipelines = EntityPipelines(
        spark,
        Warehouse(spark, os.path.join(base, "warehouse")),
        landing,
        clock=lambda: clocks[state["step"]],
    )
    for step, files in _STEPS.items():
        state["step"] = step
        for f in files:
            shutil.copy(
                os.path.join(_REFERENCE_DATA, f),
                os.path.join(landing, f.split("_")[0], f),
            )
        pipelines.run_all()
    _memo[key] = pipelines
    return pipelines


@register(
    "pl_dim_customer",
    oracle=None,
    doc="""S1+S2+M1+M2 end-to-end: CSV stage ingest (PERMISSIVE quirks
    included) -> raw MERGE -> typed dim_customer with identity keys and
    frozen-clock timestamps. 22 rows after the full replay; golden
    values asserted in tests/test_pipeline_replay.py.""",
    tags=("S1", "S2", "M1", "M2", "pipeline"),
)
def pl_dim_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _replayed(spark).dim_customer.read().orderBy("customer_dim_key")


@register(
    "pl_dim_item",
    oracle=None,
    doc="W1 latest-wins dedup + SCD-1 update-in-place: dim_item after "
    "replay (item AAAAAAAACDLBXPPP updated, not duplicated).",
    tags=("M2", "W1", "pipeline"),
)
def pl_dim_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _replayed(spark).dim_item.read().orderBy("item_dim_key")


@register(
    "pl_fact_order",
    oracle=None,
    doc="M3 INSERT OVERWRITE star-join rebuild over the replayed "
    "warehouse (1 resolvable order after delta_1).",
    tags=("M3", "pipeline"),
)
def pl_fact_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _replayed(spark).fact_order.read().orderBy("order_fact_key")


@register(
    "pl_task_history",
    oracle=None,
    doc="T7 task run history surface (information_schema.task_history "
    "analog, customer-...sql:198-201) filtered with the P5 IN-list.",
    tags=("T7", "P5", "O2", "pipeline"),
)
def pl_task_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _replayed(spark)
    hist = p.dags["customer"].task_history()
    return hist.filter(
        F.col("name").isin("pause_pipe_customer", "customer_raw_tsk", "dim_customer_tsk")
    ).select("name", "state")


@register(
    "pl_show_streams",
    oracle=None,
    doc="S7 catalog introspection: stream registry (show streams analog) "
    "with per-consumer offsets after the replay.",
    tags=("S7", "T1", "pipeline"),
)
def pl_show_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _replayed(spark).wh.show_streams()


@register(
    "pl_list_stage",
    oracle=None,
    doc="S6 `list @landing` (customer-...sql:204): stage file listing as "
    "a DataFrame, plus pipe status (S4).",
    tags=("S6", "S4", "pipeline"),
)
def pl_list_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.copy_into import list_stage

    p = _replayed(spark)
    rows = []
    for e, pipe in p.pipes.items():
        for f in list_stage(pipe.landing_dir):
            rows.append((e, f, pipe.status()["executionState"]))
    return spark.createDataFrame(rows, "entity string, file string, pipe_state string")

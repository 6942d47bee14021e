"""Scale backfill: the reference pipeline driven by TPC-H-sized data.

The reference's own fixtures are ~20 rows per entity; this module
synthesizes entity CSVs FROM the TPC-H parquet at the requested scale
factor (deterministic, key-derived — no RNG) and pushes them through the
exact same landing -> pipe -> stage -> MERGE raw -> MERGE dim / fact
rebuild path the fixture replay uses. At sf0.1 that is ~150k order rows
and ~15k customers through the MERGE machinery — the ETL-throughput
measurement the 20-row replay cannot give (wired into bench.py).

Everything stays distributed: CSV synthesis is a Spark write, ingest is
the manifest-tracked loader, merges are the anti-join∪apply rewrite.
The only driver-side values are the final audit counts (one row).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .tables import load

_memo: dict[tuple[int, str], DataFrame] = {}


def _money(col):
    return F.round(col.cast("decimal(20,6)"), 2).cast("decimal(20,2)").cast("string")


def _write_entity_csv(df: DataFrame, landing_dir: str, n_files: int = 8) -> None:
    """Write an all-string DataFrame as landing CSVs (header per file,
    Spark-parallel; part files moved so the landing dir holds plain
    ``*.csv`` with no ``_SUCCESS`` marker).

    Explicit repartition: the source parquet is a few MB, and
    ``files.openCostInBytes`` (4 MiB) floors the split size, so without
    it the whole synthesis (decimal money formatting x 150k rows) runs
    as ONE task and the landing dir gets one file — serializing both
    this write and the downstream ingest."""
    tmp = landing_dir + "__tmp"
    df.repartition(n_files).write.mode("overwrite").option("header", True).csv(tmp)
    os.makedirs(landing_dir, exist_ok=True)
    for name in os.listdir(tmp):
        if name.startswith("part-") and name.endswith(".csv"):
            shutil.move(os.path.join(tmp, name), os.path.join(landing_dir, name))
    shutil.rmtree(tmp)


def synthesize_landing(spark: SparkSession, sf_dir: str, landing_root: str) -> None:
    """Derive customer/item/order stage CSVs from the TPC-H parquet.

    Every column is a deterministic function of the source keys, so the
    resulting warehouse state is reproducible and referentially closed:
    order.customer_id ⊆ customer.customer_id (TPC-H guarantees custkey
    FKs), order.item_id ⊆ item.item_id (modular assignment).
    """
    cust = load(spark, sf_dir, "customer")
    part = load(spark, sf_dir, "part")
    orders = load(spark, sf_dir, "orders")

    key = F.col("c_custkey")
    customer_csv = cust.select(
        F.concat(F.lit("C"), key).alias("customer_id"),
        F.when(key % 2 == 0, "Mr.").otherwise("Ms.").alias("salutation"),
        F.lit("Customer").alias("first_name"),
        F.lpad(key.cast("string"), 9, "0").alias("last_name"),
        ((key % 28) + 1).cast("string").alias("birth_day"),
        ((key % 12) + 1).cast("string").alias("birth_month"),
        (1950 + (key % 50)).cast("string").alias("birth_year"),
        F.concat(F.lit("NATION_"), F.col("c_nationkey")).alias("birth_country"),
        F.concat(F.lit("c"), key, F.lit("@example.com")).alias("email_address"),
        F.when(key % 10 == 0, "N").otherwise("Y").alias("is_active"),
    )

    pkey = F.col("p_partkey")
    item_csv = part.select(
        F.concat(F.lit("I"), pkey).alias("item_id"),
        F.col("p_name").alias("item_desc"),
        F.lit("2020-01-01").alias("start_date"),
        F.lit(None).cast("string").alias("end_date"),  # empty = current row
        _money(F.col("p_retailprice")).alias("price"),
        F.col("p_brand").alias("item_class"),
        F.col("p_type").alias("item_category"),
        F.lit("Y").alias("is_active"),
    )

    n_parts = part.count()  # one scalar for the modular FK assignment
    okey = F.col("o_orderkey")
    price = F.col("o_totalprice").cast("decimal(20,6)")
    orders_with_item = orders.withColumn("__ik", okey % F.lit(n_parts)).join(
        F.broadcast(part.select(F.col("p_partkey").alias("__ik"), "p_name")), "__ik"
    )
    order_csv = orders_with_item.select(
        F.col("o_orderdate").cast("string").alias("order_date"),
        F.concat(((okey % 12) + 1).cast("string"), F.lit(":30:00 AM")).alias("order_time"),
        F.concat(F.lit("I"), F.col("__ik")).alias("item_id"),
        F.col("p_name").alias("item_desc"),
        F.concat(F.lit("C"), F.col("o_custkey")).alias("customer_id"),
        F.when(F.col("o_custkey") % 2 == 0, "Mr.").otherwise("Ms.").alias("salutation"),
        F.lit("Customer").alias("first_name"),
        F.lpad(F.col("o_custkey").cast("string"), 9, "0").alias("last_name"),
        (okey % 10).cast("string").alias("store_id"),
        F.concat(F.lit("Store "), okey % 10).alias("store_name"),
        ((okey % 7) + 1).cast("string").alias("order_quantity"),
        _money(price).alias("sale_price"),
        _money(price * 0.10).alias("disount_amt"),  # schema typo preserved
        _money(price * 0.02).alias("coupon_amt"),
        _money(price * 0.88).alias("net_paid"),
        _money(price * 0.95).alias("net_paid_tax"),
        _money(price * 0.12).alias("net_profit"),
    )

    _write_entity_csv(customer_csv, os.path.join(landing_root, "customer"))
    _write_entity_csv(item_csv, os.path.join(landing_root, "item"))
    _write_entity_csv(order_csv, os.path.join(landing_root, "order"))


def run_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize landing CSVs at ``sf_dir`` scale, run one full
    pipeline cycle per entity, and return a one-row audit DataFrame."""
    from ..pipelines.entities import EntityPipelines
    from .catalog import Warehouse

    base = tempfile.mkdtemp(prefix="etl_backfill_")
    landing = os.path.join(base, "landing")
    synthesize_landing(spark, sf_dir, landing)

    clock = lambda: datetime(2021, 6, 1, tzinfo=timezone.utc)  # noqa: E731
    pipelines = EntityPipelines(
        spark, Warehouse(spark, os.path.join(base, "warehouse")), landing, clock=clock
    )
    pipelines.run_all()

    fact = pipelines.fact_order.read()
    audit = (
        fact.agg(
            F.count(F.lit(1)).alias("n_fact_rows"),
            F.sum("order_count").alias("n_orders_in_fact"),
            F.sum("order_quantity").alias("total_quantity"),
        )
        .withColumn("n_dim_customer", F.lit(pipelines.dim_customer.read().count()))
        .withColumn("n_dim_item", F.lit(pipelines.dim_item.read().count()))
        .withColumn("n_raw_order", F.lit(pipelines.raw["order"].read().count()))
    )
    return audit.select(
        "n_dim_customer", "n_dim_item", "n_raw_order",
        "n_fact_rows", "n_orders_in_fact", "total_quantity",
    )


@register(
    "pl_backfill_scale",
    oracle=None,
    doc="""Scale backfill: entity CSVs synthesized from the TPC-H
    parquet at the driver's scale factor (~15k customers / 150k orders
    at sf0.1), pushed through the full landing -> pipe -> MERGE raw ->
    MERGE dim / fact-rebuild path. Rows-only (stateful multi-step
    ingest); the audit counts are deterministic. This is the ETL-
    throughput headline — the 20-row fixture replay proves semantics,
    this proves the MERGE rewrite holds up at row counts the reference
    never saw.""",
    tags=("pipeline", "scale", "M1", "M2", "M3"),
)
def pl_backfill_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark), sf_dir)
    if key not in _memo:
        _memo[key] = run_backfill(spark, sf_dir)
    return _memo[key]

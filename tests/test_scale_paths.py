"""Scale-path mechanics: the pieces that only matter at 100 TB,
exercised at toy scale.

- dynamic partition overwrite: fact maintenance must rewrite ONLY the
  partitions a batch touches;
- bucketed co-located join: pre-bucketed tables join with NO shuffle
  exchange (the bucketing/co-location story for repeated big joins);
- SQL surface: the engine's SQL entry point (spark.sql over registered
  views) gives the same answers as the DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401
from end_to_end_etl_using_snowflake_spark.operators.dml import ParquetTable
from end_to_end_etl_using_snowflake_spark.plans.registry import REGISTRY
from end_to_end_etl_using_snowflake_spark.plans.tables import register_views

from .conftest import SF_MED, SF_SMALL


def test_dynamic_partition_overwrite_touches_only_batch_partitions(spark, tmp_path):
    path = str(tmp_path / "fact")
    t = ParquetTable(spark, path, partition_by=["d"])
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, d string, v double"
    )
    t.overwrite(base)
    # new batch touches ONLY partition d='b'
    t.overwrite_partitions(
        spark.createDataFrame([(9, "b", 99.0)], "k int, d string, v double")
    )
    got = sorted(tuple(r) for r in t.read().select("k", "d", "v").collect())
    assert got == [(1, "a", 10.0), (3, "c", 30.0), (9, "b", 99.0)]


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    for name, df in [("bkt_left", left), ("bkt_right", right)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        df.write.bucketBy(8, "k").sortBy("k").saveAsTable(name)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("bkt_left", "bkt_right"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_sql_surface_matches_dataframe_plans(spark):
    register_views(spark, SF_MED)
    # these oracles are portable ANSI SQL (no DuckDB-only functions)
    for name in ("p5_filter_in_list", "p6_semi_join_in_subquery", "a1_groupby_agg"):
        sql_rows = sorted(
            tuple(r) for r in spark.sql(REGISTRY[name].oracle).collect()
        )
        df_rows = sorted(
            tuple(r) for r in REGISTRY[name].build(spark, SF_MED).collect()
        )
        assert sql_rows == df_rows, name


def test_approx_sketches_within_tolerance(spark):
    """The 100 TB aggregate path: single-pass mergeable sketches.
    Sketch internals differ per engine so there is no bit-exact oracle;
    the honest check is bounded error against the exact computation on
    the same data (HLL++ rsd default 5%; t-digest rank error small at
    10k rows)."""
    li = spark.read.parquet(f"{SF_MED}/lineitem.parquet")
    exact, approx = (
        li.select(
            F.countDistinct("l_orderkey").alias("nd"),
            F.expr("percentile(l_quantity, 0.5)").alias("med"),
        ).first(),
        li.select(
            F.approx_count_distinct("l_orderkey").alias("nd"),
            F.percentile_approx("l_quantity", 0.5).alias("med"),
        ).first(),
    )
    assert abs(approx.nd - exact.nd) / exact.nd < 0.05
    assert abs(approx.med - exact.med) <= 1.0  # quantity grid is integers


def test_pandas_udf_cosine_matches_fold_path(spark):
    """The Arrow/NumPy fast path must agree with the oracle-parity
    sequential fold: values within float-reassociation tolerance and
    IDENTICAL rankings on the (well-separated) corpus."""
    from end_to_end_etl_using_snowflake_spark.functions import vectors as V

    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet").limit(200)
    e = emb.select("vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v"))
    a = e.selectExpr("vec_id as ida", "v as va")
    b = e.selectExpr("vec_id as idb", "v as vb")
    pairs = a.join(b, F.col("ida") < F.col("idb"))
    cos_udf = V.cosine_pandas_udf()
    both = pairs.select(
        "ida",
        "idb",
        V.cosine(F.col("va"), F.col("vb")).alias("fold"),
        cos_udf(F.col("va"), F.col("vb")).alias("fast"),
    ).collect()
    assert both and all(abs(r.fold - r.fast) < 1e-12 for r in both)
    by_fold = sorted(both, key=lambda r: (-r.fold, r.ida, r.idb))[:20]
    by_fast = sorted(both, key=lambda r: (-r.fast, r.ida, r.idb))[:20]
    assert [(r.ida, r.idb) for r in by_fold] == [(r.ida, r.idb) for r in by_fast]


def test_matmul_topk_rank_parity_with_exact(spark):
    """v7 (blocked matmul) must return the same (query, rank, neighbor)
    triples as the oracle-exact fold path v1 — scores may differ in the
    last ulp, rankings must not."""
    v1 = REGISTRY["v1_ann_bruteforce_topk"].build(spark, SF_MED)
    v7 = REGISTRY["v7_ann_matmul_topk"].build(spark, SF_MED)
    key = lambda df: sorted((r.query_id, r.rank, r.neighbor_id) for r in df.collect())
    assert key(v7) == key(v1)


def test_decontaminate_anti_join_leaves_clean_corpus(spark):
    """After removing flagged docs, a second decontamination pass finds
    nothing — the keep-list semantics a 100 TB run relies on."""
    from pyspark.sql import functions as F

    from end_to_end_etl_using_snowflake_spark.operators.dedup import decontaminate
    from end_to_end_etl_using_snowflake_spark.plans.tables import load

    docs = load(spark, SF_SMALL, "documents")
    eval_set = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    flagged = decontaminate(train, eval_set, "doc_id", "text")
    assert flagged.count() > 0  # the synthetic corpus does overlap
    clean = train.join(
        flagged.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
    )
    assert decontaminate(clean, eval_set, "doc_id", "text").count() == 0


def test_quantize_int8_codes_bounded_and_invertible(spark):
    """Every int8 code fits [-127, 127] and reconstruction error is
    bounded by half a quantization step (scale >= 127/max|x|)."""
    from pyspark.sql import functions as F

    from end_to_end_etl_using_snowflake_spark.operators.similarity import quantize_int8
    from end_to_end_etl_using_snowflake_spark.plans.tables import load

    out = quantize_int8(load(spark, SF_SMALL, "embeddings"), "vec_id", "embedding")
    bad = out.filter(
        (F.col("q_l1") > 127 * F.col("n_dims"))
        | (F.col("max_abs_err") > 0.5 / F.col("scale") + 1e-12)
    )
    assert bad.count() == 0


def test_salted_topn_equals_single_window(spark):
    """The two-stage salted per-key top-n must equal the plain
    single-window form on a skewed input (one key holds half the rows),
    including exact ranks under score ties."""
    from pyspark.sql import Window

    from end_to_end_etl_using_snowflake_spark.operators.analysis import (
        salted_topn_per_key,
    )

    rows = [("hot", i, float(i % 7)) for i in range(500)] + [
        (f"k{i % 23}", 1000 + i, float(i % 5)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "key string, id long, score double")
    got = salted_topn_per_key(df, "key", "score", "id", n=10, salt_buckets=4)

    w = Window.partitionBy("key").orderBy(F.col("score").desc(), F.col("id").asc())
    want = df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)

    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_global_prefix_sum_matches_single_window(spark):
    """Distributed two-stage prefix sum == the naive global-window
    running sum, on a multi-partition skewed input (the operator must
    not depend on where repartitionByRange draws its bounds)."""
    import random

    from pyspark.sql import Window

    from end_to_end_etl_using_snowflake_spark.operators.merge import (
        global_prefix_sum,
    )

    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 100)) for i in range(5000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long").repartition(16)

    got = {
        (r.k, r.run)
        for r in global_prefix_sum(df, ["k"], "v", "run", exclusive=True).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        (r.k, r.run)
        for r in df.withColumn(
            "run", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("long")
        ).collect()
    }
    assert got == want

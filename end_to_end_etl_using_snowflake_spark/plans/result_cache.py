"""Result cache: serve a repeated query from its stored result — the
Snowflake result-reuse semantic (`RESULT_SCAN` / the 24-hour query
result cache that answers an identical query without touching the
warehouse).

The cache key is Spark's ``semanticHash()`` of the ANALYZED plan, so
two queries that differ only in formatting/aliasing-irrelevant ways hit
the same entry, while any change to sources, filters, or expressions
misses. Invalidation: this engine's tables mutate by atomic directory
swap (operators/dml.py), so cached entries additionally key on the
source snapshot fingerprint supplied by the caller (the table version /
changelog head) — bump it and every dependent entry misses, which is
exactly Snowflake's "result reuse requires unchanged underlying data"
rule. At 100 TB a result cache turns the dashboard-refresh workload
(the same aggregate every few minutes) from repeated full scans into a
metadata read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ResultCache:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.hits = 0
        self.misses = 0

    def _path(self, df: DataFrame, snapshot: str) -> str:
        key = f"{df.semanticHash() & 0xFFFFFFFF:08x}_{snapshot}"
        return os.path.join(self.root, key)

    def get_or_compute(self, df: DataFrame, snapshot: str = "0") -> DataFrame:
        """Return the cached result for this plan+snapshot, computing
        and storing it on first sight. The stored form is parquet, so
        a hit costs a metadata open + result-sized read — never the
        source scan."""
        path = self._path(df, snapshot)
        if os.path.exists(path):
            self.hits += 1
        else:
            self.misses += 1
            df.write.parquet(path)
        return self.spark.read.parquet(path)

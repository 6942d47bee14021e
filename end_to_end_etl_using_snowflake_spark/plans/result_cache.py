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

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


class ResultCache:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _plan_text(df: DataFrame) -> str:
        """Canonicalized analyzed-plan text. Exprs carry fresh ids per
        analysis (`col#123`), so normalize `#<digits>` away — the
        remaining text is stable for semantically identical plans while
        any change to sources/filters/expressions changes it."""
        import re

        text = df._jdf.queryExecution().analyzed().toString()
        return re.sub(r"#\d+", "#", text)

    def _path(self, df: DataFrame, snapshot: str) -> str:
        # semanticHash alone is 32 bits — a birthday collision between
        # two distinct plans under the same snapshot would silently
        # serve the wrong result (the one failure mode a result cache
        # must not have). Append a sha256 of the normalized analyzed
        # plan text so a collision needs BOTH hashes to agree.
        sem = f"{df.semanticHash() & 0xFFFFFFFF:08x}"
        strong = hashlib.sha256(self._plan_text(df).encode()).hexdigest()[:24]
        return os.path.join(self.root, f"{sem}_{strong}_{snapshot}")

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

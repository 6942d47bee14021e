"""Query registry: every operator the engine claims (SURVEY.md §2 + the
LLM-data-pipeline extensions) registers a named entry here.

Each entry pairs an idiomatic-DataFrame builder with the equivalent ANSI
SQL that DuckDB can run on the same parquet tables — the driver's
correctness gate. Entries without SQL-expressible semantics set
``oracle=None`` (rows-only check).

Determinism conventions (so order-insensitive value hashes match DuckDB):

- Monetary/measure arithmetic is done in DECIMAL (exact), then the final
  column is cast to DOUBLE (exact conversion for these magnitudes). Never
  hash a float that was produced by order-dependent double summation.
- Every computed column is aliased identically in both dialects.
- Top-k / rank outputs always carry a deterministic total tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered views
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}

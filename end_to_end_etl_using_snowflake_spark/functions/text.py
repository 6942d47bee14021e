"""Deterministic text primitives shared by the dedup / text-analysis
operators.

Everything here is built from JVM-side ``pyspark.sql.functions`` higher-
order functions (whole-stage codegen, no Python in the hot path) and is
bit-reproducible in ANSI SQL — each helper documents its DuckDB
equivalent so operators can ship exact oracles.

The hash is a 31-base char fold mod 1e9+7 (~30 bits): small enough to
stay in exact BIGINT range in any engine, deterministic everywhere, and
cheap. For 100 TB runs you would swap in ``xxhash64`` (also JVM-side,
one instruction per word) — the operator shapes don't change.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_MOD = 1_000_000_007


def normalize(col: Column) -> Column:
    """lower + collapse whitespace + trim.

    DuckDB: ``trim(regexp_replace(lower(x), '\\s+', ' ', 'g'))``
    (note the 'g' flag — Spark's regexp_replace is global by default).
    """
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text.

    DuckDB: ``string_split(<normalized>, ' ')``.
    """
    return F.split(normalize(col), " ")


def char_fold_hash(col: Column, mod: int = HASH_MOD) -> Column:
    """Deterministic string hash: left fold ``h = (h*31 + ascii(c)) % mod``.

    DuckDB: ``list_reduce(list_concat([0::BIGINT],
    list_transform(string_split(x,''), c -> ascii(c)::BIGINT)),
    (a,b) -> (a*31+b) % 1000000007)`` — verified bit-identical.
    """
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(mod),
    )


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Array of word n-gram shingle strings (may contain duplicates;
    callers distinct() after explode).

    DuckDB (n=3): ``list_transform(generate_series(1, greatest(len(w)-2,
    0)), i -> w[i]||' '||w[i+1]||' '||w[i+2])``.
    """
    count = F.size(tok) - (n - 1)
    # guard: F.sequence(1, 0) would generate a DESCENDING [1, 0], not an
    # empty array — short texts need an explicit empty branch
    return F.when(
        count > 0,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", *[F.element_at(tok, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))

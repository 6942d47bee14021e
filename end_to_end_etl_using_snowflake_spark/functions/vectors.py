"""Vector math over ``array<float>`` embedding columns.

Two implementations of the same semantics:

- ``dot``/``norm``/``cosine``: JVM-side higher-order-function fold —
  sequential left-to-right double accumulation, bit-reproducible in any
  engine that folds in order (DuckDB ``list_reduce`` verified
  bit-identical). Used wherever results feed an oracle comparison.
- ``cosine_pandas_udf``: Arrow-batched NumPy for the brute-force ANN
  hot path — measured ~2x the scalar fold at 64 dims/250k pairs
  (Arrow transfer dominates; the gap widens with dims). Float
  summation order differs (pairwise/SIMD), so it's the *bench* path,
  not the oracle path. The real 10-100x lever at 100 TB is
  pre-normalized vectors + one matmul per partition against a
  broadcast query block (no per-pair rows at all).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    """float[] -> double[] (exact). DuckDB: ``embedding::DOUBLE[]``."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product.

    DuckDB: ``list_reduce(list_concat([0.0::DOUBLE],
    list_transform(generate_series(1, len(a)), i -> a[i]*b[i])),
    (x,y) -> x+y)``.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pandas_udf():
    """Arrow-batched NumPy cosine — the bench/100 TB hot path.

    Returns a pandas UDF ``(array<double>, array<double>) -> double``:
    each Arrow batch is stacked into one (rows x dims) matrix and the
    whole batch computed with three vectorized NumPy reductions — no
    per-row Python. Summation order (pairwise/SIMD) differs from the
    sequential fold, so results can drift in the last ulp vs ``cosine``
    — use the fold for oracle parity, this for throughput
    (tests/test_scale_paths.py pins the two paths within 1e-12 and
    rank-identical on well-separated data).
    """
    import numpy as np
    import pandas as pd  # noqa: F401 (resolved via module globals below)
    from pyspark.sql.functions import pandas_udf

    globals().setdefault("pd", pd)  # make the type hints resolvable

    @pandas_udf("double")
    def _cos(a: "pd.Series", b: "pd.Series") -> "pd.Series":
        ma = np.stack(a.to_numpy())
        mb = np.stack(b.to_numpy())
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / den)

    return _cos

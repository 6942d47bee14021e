"""Column masking + row access policies (warehouse governance).

Snowflake attaches governance DECLARATIVELY: ``CREATE MASKING POLICY``
rewrites a column per the querying role, ``CREATE ROW ACCESS POLICY``
filters rows through an entitlement mapping. The reference pipeline
runs on such a platform; a user switching to this engine needs the
same seam. Both concepts map cleanly onto Spark:

- a masking policy is a (column -> role-conditional expression)
  rewrite applied at view-build time — pure projection, costs nothing
  at any scale and never materializes unmasked data downstream;
- a row access policy is a semi-join against a (role, key)
  entitlement table — broadcast-small by construction, so the fact
  side never shuffles (the same plan shape Snowflake generates).

``secured_view`` is the single entry point: filter first (rows the
role cannot see must not even reach masking), then rewrite columns.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class MaskingPolicy:
    """Role-conditional column rewrite: ``fn(col, role) -> Column``.

    The policy decides per ROLE, not per row — the common case — so
    the rewrite constant-folds to either the raw column or the masked
    expression at plan time (no per-row branching in the executed
    plan).
    """

    def __init__(self, name: str, fn: Callable[[Column, str], Column]):
        self.name = name
        self.fn = fn

    def __call__(self, col: Column, role: str) -> Column:
        return self.fn(col, role)


class RowAccessPolicy:
    """Entitlement-mapping row filter: ``fn(df, role) -> DataFrame``.

    Implemented as a semi-join against the entitlement table rather
    than an inline predicate so the mapping can live in a governed
    table and change without touching query code.
    """

    def __init__(self, name: str, fn: Callable[[DataFrame, str], DataFrame]):
        self.name = name
        self.fn = fn

    def __call__(self, df: DataFrame, role: str) -> DataFrame:
        return self.fn(df, role)


def secured_view(
    df: DataFrame,
    role: str,
    masking: Mapping[str, MaskingPolicy] | None = None,
    row_access: RowAccessPolicy | None = None,
) -> DataFrame:
    """Apply row access BEFORE masking (rows a role cannot see must
    not reach any downstream expression), then rewrite each governed
    column through its policy."""
    if row_access is not None:
        df = row_access(df, role)
    for col_name, policy in (masking or {}).items():
        df = df.withColumn(col_name, policy(F.col(col_name), role))
    return df


# ---------------------------------------------------------------------------
# the policies the driver entry exercises
# ---------------------------------------------------------------------------

PRIVILEGED_ROLES = frozenset({"admin", "dpo"})


def partial_name_mask(col: Column, role: str) -> Column:
    """First character + '***' for non-privileged roles (constant
    suffix: masked values must not leak the original length)."""
    if role in PRIVILEGED_ROLES:
        return col
    return F.concat(F.substring(col, 1, 1), F.lit("***"))


def band_balance(col: Column, role: str) -> Column:
    """Non-privileged roles see balances banded to the lower 1000."""
    if role in PRIVILEGED_ROLES:
        return col
    return (F.floor(col / 1000) * 1000).cast("double")


def nation_entitlements(spark) -> DataFrame:
    """(role, nationkey) entitlement mapping: analysts see nations
    0-4; admin/dpo rows are absent because privileged roles bypass the
    policy entirely (see nation_row_access)."""
    rows = [("analyst", nk) for nk in range(5)]
    return spark.createDataFrame(rows, "role string, nationkey int")


def nation_row_access(df: DataFrame, role: str) -> DataFrame:
    if role in PRIVILEGED_ROLES:
        return df
    ent = nation_entitlements(df.sparkSession).filter(F.col("role") == role).select(
        "nationkey"
    )
    return df.join(
        F.broadcast(ent), df["c_nationkey"] == ent["nationkey"], "left_semi"
    )


CUSTOMER_MASKING = {
    "c_name": MaskingPolicy("partial_name", partial_name_mask),
    "c_acctbal": MaskingPolicy("band_balance", band_balance),
}
CUSTOMER_ROW_ACCESS = RowAccessPolicy("nation_entitlements", nation_row_access)

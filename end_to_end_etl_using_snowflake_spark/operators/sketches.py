"""Probabilistic sketches as deterministic DataFrame plans: HyperLogLog
distinct counting and count-min frequency estimation.

At 100 TB, exact COUNT(DISTINCT) and exact per-key counts are often the
single most expensive aggregates in a workload (a full shuffle of every
distinct value / key). Sketches replace them with fixed-size state that
merges associatively — exactly what Spark's partial aggregation wants:
each partition builds its local registers map-side, the exchange
carries O(registers) rows, and the final merge is a tiny max/sum.

Two deliberate design points, both unusual vs library sketches:

- **Deterministic, engine-portable hashing.** Registers derive from
  md5 (15 hex chars -> a 60-bit non-negative integer), not from a
  JVM-private hash, so a DuckDB/ANSI twin reproduces every register
  and the driver's bit-exact oracle gate applies to an *approximate*
  operator. (Spark's own approx_count_distinct is also deterministic,
  but its HLL++ registers aren't reproducible outside the JVM.)
- **Exact-integer register arithmetic.** The HLL harmonic sum is kept
  as a SCALED BIGINT (sum of 2^(W+1-rho), exact below 2^62) rather
  than a float sum of 2^-rho, so there is no order-dependent double
  accumulation anywhere; the one double division happens at the very
  end. Same for count-min: counters are exact BIGINTs.

Reference analog: none (the reference delegates everything to
Snowflake's engine, which exposes HLL as ``approx_count_distinct``,
Snowflake docs); this is the engine-native equivalent of that surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dml import local_frame


def md5_hash64(col: Column, salt: str | None = None) -> Column:
    """Deterministic 60-bit non-negative hash: the first 15 hex chars of
    md5, parsed base-16. Identical in DuckDB as
    ``CAST(concat('0x', substring(md5(x), 1, 15)) AS BIGINT)``."""
    s = F.concat(F.lit(salt + ":"), col.cast("string")) if salt else col.cast("string")
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def sql_md5_hash64(expr: str, salt: str | None = None) -> str:
    inner = f"concat('{salt}:', CAST({expr} AS VARCHAR))" if salt else f"CAST({expr} AS VARCHAR)"
    return f"CAST(concat('0x', substring(md5({inner}), 1, 15)) AS BIGINT)"


def hll_distinct(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007), m=2^p
    registers, as three DataFrame aggregations.

    Per value: bucket = low ``p`` hash bits; w = the remaining
    ``W = 60-p`` bits; rho = position of w's highest set bit from the
    top (W+1 - bit_length(w), W+1 when w = 0). Register j keeps
    max(rho). The harmonic sum is scaled integer:
    ``S = sum_j 2^(W+1 - M_j)`` with empty registers contributing
    ``2^(W+1)``, so S is exact; the raw HLL estimate
    ``alpha_m * m^2 / sum_j 2^-M_j = alpha_m * m^2 * 2^(W+1) / S``
    is one double division at the end. The small/large-range
    corrections are deliberately NOT applied in-plan (they need ln,
    which is libm-dependent and breaks cross-engine bit-parity);
    v_empty ships alongside so a caller can apply linear counting.

    Plan: one narrow projection -> groupBy(bucket) max -> one-row
    final aggregate. Shuffle carries at most m rows. Returns one row:
    (m, v_empty, s_scaled, raw_estimate, n_exact, rel_err) — n_exact
    is included for self-audit and is the thing a 100 TB run would
    DROP (it is the expensive exact path the sketch replaces).
    """
    m = 1 << p
    w_bits = 60 - p
    h = md5_hash64(F.col(col))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(w))
    )
    regs = (
        df.select(
            (h.bitwiseAND(F.lit(m - 1))).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_rho"))
    )
    exact = df.agg(F.countDistinct(F.col(col)).alias("n_exact"))
    # SQL-form shiftleft: the PySpark wrapper only takes a literal
    # shift amount, the SQL function takes an expression
    scaled = F.expr(f"shiftleft(CAST(1 AS BIGINT), {w_bits + 1} - m_rho)")
    # coalesce: an empty input yields SUM = NULL; pin it to 0 so the
    # all-registers-empty row stays well-defined and engine-agnostic
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.coalesce(F.sum(scaled), F.lit(0).cast("long")).alias("s_observed"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    empty = F.lit(m) - F.col("n_buckets")
    s_total = F.col("s_observed") + empty * F.lit(1 << (w_bits + 1)).cast("long")
    est = (
        F.lit(alpha)
        * F.lit(float(m * m))
        * F.lit(float(1 << (w_bits + 1)))
        / s_total.cast("double")
    )
    out = (
        agg.crossJoin(F.broadcast(exact))
        .select(
            F.lit(m).alias("m"),
            empty.cast("long").alias("v_empty"),
            s_total.cast("long").alias("s_scaled"),
            est.alias("raw_estimate"),
            F.col("n_exact"),
            # nullif: rel_err is NULL (not Inf/NaN, whose Spark-vs-
            # DuckDB division semantics differ) on an empty input
            (
                (est - F.col("n_exact").cast("double"))
                / F.nullif(F.col("n_exact").cast("double"), F.lit(0.0))
            ).alias("rel_err"),
        )
    )
    return out


def sql_hll_distinct(table: str, col: str, p: int = 8) -> str:
    """DuckDB twin of ``hll_distinct`` — identical registers, identical
    scaled-integer sum, identical final expression."""
    m = 1 << p
    w_bits = 60 - p
    h = sql_md5_hash64(col)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return f"""
    WITH hashed AS (
        SELECT {h} AS h FROM {table}
    ),
    rows_ AS (
        SELECT h & {m - 1} AS bucket,
               CASE WHEN (h >> {p}) = 0 THEN {w_bits + 1}
                    ELSE {w_bits + 1} - length(bin(h >> {p})) END AS rho
        FROM hashed
    ),
    regs AS (SELECT bucket, max(rho) AS m_rho FROM rows_ GROUP BY bucket),
    agg AS (
        SELECT count(*) AS n_buckets,
               CAST(COALESCE(sum(CAST(1 AS BIGINT) << ({w_bits + 1} - m_rho)), 0)
                    AS BIGINT) AS s_observed
        FROM regs
    ),
    exact AS (SELECT count(DISTINCT {col}) AS n_exact FROM {table})
    SELECT {m} AS m,
           CAST({m} - n_buckets AS BIGINT) AS v_empty,
           CAST(s_observed + ({m} - n_buckets) * CAST({1 << (w_bits + 1)} AS BIGINT)
                AS BIGINT) AS s_scaled,
           CAST({alpha!r} AS DOUBLE) * CAST({float(m * m)!r} AS DOUBLE)
               * CAST({float(1 << (w_bits + 1))!r} AS DOUBLE)
               / CAST(s_observed + ({m} - n_buckets)
                      * CAST({1 << (w_bits + 1)} AS BIGINT) AS DOUBLE)
               AS raw_estimate,
           n_exact,
           (CAST({alpha!r} AS DOUBLE) * CAST({float(m * m)!r} AS DOUBLE)
               * CAST({float(1 << (w_bits + 1))!r} AS DOUBLE)
               / CAST(s_observed + ({m} - n_buckets)
                      * CAST({1 << (w_bits + 1)} AS BIGINT) AS DOUBLE)
            - CAST(n_exact AS DOUBLE)) / CAST(nullif(n_exact, 0) AS DOUBLE) AS rel_err
    FROM agg, exact
    """


def countmin_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) frequency
    estimates for every distinct key, depth x width exact-BIGINT
    counters, plus the exact count and overestimate for self-audit.

    Build: each row increments counter (i, h_i(key) % width) for
    i < depth — expressed as one explode to depth rows and one
    groupBy((i, slot)). Probe: each distinct key reads its depth
    counters back (broadcast join — the sketch is depth*width rows by
    construction) and takes the MIN. CM guarantees
    estimate >= exact (one-sided error); ``overestimate`` is the
    slack. At 100 TB the sketch build is one narrow shuffle of
    (i, slot) pairs with map-side combine, state is depth*width longs
    regardless of key cardinality, and the probe side here (all
    distinct keys, for audit) would be replaced by whatever keys the
    caller actually wants estimated.
    """
    rows = df.select(F.col(key_col).alias("key")).withColumn(
        "i", F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    )
    # per-sketch-row hash: re-salt by the depth index i (depth
    # independent-ish hash functions from one md5, identically
    # expressible in SQL)
    slotted = rows.withColumn(
        "slot",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("key").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(width),
        ),
    )
    counters = slotted.groupBy("i", "slot").agg(F.count(F.lit(1)).alias("c"))
    exact = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    probes = exact.withColumn(
        "i", F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    ).withColumn(
        "slot",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("key").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(width),
        ),
    )
    return (
        probes.join(F.broadcast(counters), ["i", "slot"])
        .groupBy("key", "n_exact")
        .agg(F.min("c").alias("cm_estimate"))
        .select(
            "key",
            "cm_estimate",
            "n_exact",
            (F.col("cm_estimate") - F.col("n_exact")).alias("overestimate"),
        )
    )


def sql_countmin_estimates(table: str, key_col: str, depth: int = 4, width: int = 256) -> str:
    """DuckDB twin of ``countmin_estimates``."""
    h = (
        f"CAST(concat('0x', substring(md5(concat(CAST(i AS VARCHAR), ':', "
        f"CAST(key AS VARCHAR))), 1, 15)) AS BIGINT) % {width}"
    )
    return f"""
    WITH ks AS (SELECT {key_col} AS key FROM {table}),
    idx AS (SELECT unnest(range({depth})) AS i),
    rows_ AS (SELECT key, i, {h} AS slot FROM ks, idx),
    counters AS (SELECT i, slot, count(*) AS c FROM rows_ GROUP BY 1, 2),
    exact AS (SELECT key, count(*) AS n_exact FROM ks GROUP BY 1),
    probes AS (SELECT key, n_exact, i, {h} AS slot FROM exact, idx)
    SELECT p.key, min(c.c) AS cm_estimate, p.n_exact,
           min(c.c) - p.n_exact AS overestimate
    FROM probes p JOIN counters c ON c.i = p.i AND c.slot = p.slot
    GROUP BY p.key, p.n_exact
    """


def bloom_membership(
    build: DataFrame,
    probe: DataFrame,
    key_col: str,
    n_hashes: int = 4,
    n_bits: int = 4096,
) -> DataFrame:
    """Bloom-filter membership test as two DataFrame aggregations —
    the third sketch of the family (HLL = cardinality, count-min =
    frequency, Bloom = set membership).

    Build: every key sets ``n_hashes`` bit positions (md5-derived,
    engine-portable); the filter is the DISTINCT (hash_i, slot) set —
    at most ``n_hashes * n_bits`` rows regardless of build cardinality,
    the fixed-state property that replaces a full-shuffle semi-join
    against a 100 TB key set (Spark's own runtime bloom join applies
    the same idea inside the optimizer; this is the engine-level,
    oracle-checkable form).

    Probe: a key is ``in_filter`` iff ALL its ``n_hashes`` slots are
    set — the broadcast join + ``count == n_hashes`` group. One-sided
    error: never a false negative; ``is_member`` (the exact semi-join
    verdict) rides along so the false-positive rate is auditable
    in-row. Returns (key, in_filter, is_member).
    """
    def slots(df: DataFrame) -> DataFrame:
        rows = df.select(F.col(key_col).alias("key")).distinct().withColumn(
            "i", F.explode(F.array(*[F.lit(i) for i in range(n_hashes)]))
        )
        return rows.withColumn(
            "slot",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("i").cast("string"),
                                F.lit("|"),
                                F.col("key").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(n_bits),
            ),
        )
    filter_bits = slots(build).select("i", "slot").distinct()
    probe_slots = slots(probe)
    hits = (
        probe_slots.join(F.broadcast(filter_bits), ["i", "slot"], "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("__hits"))
        .filter(F.col("__hits") == n_hashes)
        .select("key", F.lit(True).alias("in_filter"))
    )
    truth = build.select(F.col(key_col).alias("key")).distinct().select(
        "key", F.lit(True).alias("is_member")
    )
    keys = probe.select(F.col(key_col).alias("key")).distinct()
    return (
        keys.join(hits, "key", "left")
        .join(truth, "key", "left")
        .select(
            "key",
            F.coalesce(F.col("in_filter"), F.lit(False)).alias("in_filter"),
            F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
        )
    )


def sql_bloom_membership(
    build_sql: str, probe_sql: str, n_hashes: int = 4, n_bits: int = 4096
) -> str:
    """DuckDB twin of ``bloom_membership`` (``build_sql``/``probe_sql``
    are single-column SELECTs aliased ``key``)."""
    h = (
        f"CAST(concat('0x', substring(md5(concat(CAST(i AS VARCHAR), '|', "
        f"CAST(key AS VARCHAR))), 1, 15)) AS BIGINT) % {n_bits}"
    )
    return f"""
    WITH bkeys AS (SELECT DISTINCT key FROM ({build_sql})),
    pkeys AS (SELECT DISTINCT key FROM ({probe_sql})),
    idx AS (SELECT unnest(range({n_hashes})) AS i),
    fbits AS (SELECT DISTINCT i, {h} AS slot FROM bkeys, idx),
    pslots AS (SELECT key, i, {h} AS slot FROM pkeys, idx),
    hits AS (
        SELECT p.key FROM pslots p
        WHERE EXISTS (SELECT 1 FROM fbits f WHERE f.i = p.i AND f.slot = p.slot)
        GROUP BY p.key HAVING count(*) = {n_hashes}
    )
    SELECT k.key,
           (h.key IS NOT NULL) AS in_filter,
           (b.key IS NOT NULL) AS is_member
    FROM pkeys k
    LEFT JOIN hits h ON h.key = k.key
    LEFT JOIN bkeys b ON b.key = k.key
    """


def hll_union_by_group(
    df: DataFrame, group_col: str, col: str, p: int = 8
) -> DataFrame:
    """Mergeable HLL: one sketch per group PLUS their register-wise
    union — the property that makes sketches the 100 TB answer. The
    union sketch is computed from the per-group REGISTERS (a
    groups x m relation), never by rescanning rows: at scale, each
    source/day/shard keeps its own m-register sketch and any ad-hoc
    combination (all sources, last 7 days, one tenant) is a max-merge
    of register vectors — the exact-COUNT(DISTINCT) union would
    reshuffle every distinct value again.

    Output: one row per group + a ``__union__`` row, each carrying the
    k1 estimate columns (v_empty, s_scaled, raw_estimate, n_exact).
    Same determinism contract as ``hll_distinct``: md5 registers,
    exact scaled-BIGINT harmonic sums, one final double division.
    """
    m = 1 << p
    w_bits = 60 - p
    h = md5_hash64(F.col(col))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.bin(w))
    )
    base = df.select(
        F.col(group_col).cast("string").alias("scope"),
        (h.bitwiseAND(F.lit(m - 1))).alias("bucket"),
        rho.alias("rho"),
    )
    per = base.groupBy("scope", "bucket").agg(F.max("rho").alias("m_rho"))
    union_regs = (
        per.groupBy("bucket")
        .agg(F.max("m_rho").alias("m_rho"))  # THE MERGE: register-wise max
        .select(F.lit("__union__").alias("scope"), "bucket", "m_rho")
    )
    scaled = F.expr(f"shiftleft(CAST(1 AS BIGINT), {w_bits + 1} - m_rho)")
    agg = (
        per.unionByName(union_regs)
        .groupBy("scope")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.coalesce(F.sum(scaled), F.lit(0).cast("long")).alias("s_observed"),
        )
    )
    exact = (
        df.groupBy(F.col(group_col).cast("string").alias("scope"))
        .agg(F.countDistinct(F.col(col)).alias("n_exact"))
        .unionByName(
            df.agg(F.countDistinct(F.col(col)).alias("n_exact")).select(
                F.lit("__union__").alias("scope"), "n_exact"
            )
        )
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    empty = F.lit(m) - F.col("n_buckets")
    s_total = F.col("s_observed") + empty * F.lit(1 << (w_bits + 1)).cast("long")
    est = (
        F.lit(alpha)
        * F.lit(float(m * m))
        * F.lit(float(1 << (w_bits + 1)))
        / s_total.cast("double")
    )
    return agg.join(exact, "scope").select(
        "scope",
        empty.cast("long").alias("v_empty"),
        s_total.cast("long").alias("s_scaled"),
        est.alias("raw_estimate"),
        "n_exact",
    )


def sql_hll_union_by_group(table: str, group_col: str, col: str, p: int = 8) -> str:
    """DuckDB twin of ``hll_union_by_group`` — identical registers,
    identical register-wise max merge, identical final expression."""
    m = 1 << p
    w_bits = 60 - p
    h = sql_md5_hash64(col)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    big = 1 << (w_bits + 1)
    est = (
        f"CAST({alpha!r} AS DOUBLE) * CAST({float(m * m)!r} AS DOUBLE)"
        f" * CAST({float(big)!r} AS DOUBLE)"
        f" / CAST(s_observed + ({m} - n_buckets) * CAST({big} AS BIGINT) AS DOUBLE)"
    )
    return f"""
    WITH rows_ AS (
        SELECT CAST({group_col} AS VARCHAR) AS scope,
               {h} & {m - 1} AS bucket,
               CASE WHEN ({h} >> {p}) = 0 THEN {w_bits + 1}
                    ELSE {w_bits + 1} - length(bin({h} >> {p})) END AS rho
        FROM {table}
    ),
    per AS (SELECT scope, bucket, max(rho) AS m_rho FROM rows_ GROUP BY 1, 2),
    uni AS (SELECT '__union__' AS scope, bucket, max(m_rho) AS m_rho
            FROM per GROUP BY 2),
    regs AS (SELECT * FROM per UNION ALL SELECT * FROM uni),
    agg AS (
        SELECT scope, count(*) AS n_buckets,
               CAST(COALESCE(sum(CAST(1 AS BIGINT) << ({w_bits + 1} - m_rho)), 0)
                    AS BIGINT) AS s_observed
        FROM regs GROUP BY 1
    ),
    exact AS (
        SELECT CAST({group_col} AS VARCHAR) AS scope,
               count(DISTINCT {col}) AS n_exact
        FROM {table} GROUP BY 1
        UNION ALL
        SELECT '__union__', count(DISTINCT {col}) FROM {table}
    )
    SELECT agg.scope,
           CAST({m} - n_buckets AS BIGINT) AS v_empty,
           CAST(s_observed + ({m} - n_buckets) * CAST({big} AS BIGINT)
                AS BIGINT) AS s_scaled,
           {est} AS raw_estimate,
           n_exact
    FROM agg JOIN exact ON exact.scope = agg.scope
    """


def kmv_distinct_by_group(
    df: DataFrame, group_col: str, col: str, k: int = 64
) -> DataFrame:
    """KMV / bottom-k distinct-value sketch (Bar-Yossef et al. 2002;
    Beyer et al. 2007 "distinct sampling"): per group keep the k
    SMALLEST 60-bit hashes of the column's distinct values; the k-th
    smallest hash h_k estimates the distinct count as
    ``(k-1) * 2^60 / h_k`` (the k-th order statistic of n uniform
    draws sits near k/n of the range). Groups with fewer than k
    distinct values report their sketch size exactly.

    The complement to the HLL family (k1/k4): a KMV sketch carries the
    hash SAMPLE itself, so beyond cardinality it supports distinct
    sampling and set-operation estimates HLL registers cannot. Same
    mergeability story: the ``__union__`` row is computed from the
    per-group SKETCH rows (a groups x k relation, never a rescan) by
    taking the k smallest distinct hashes of the union — identical
    hashes across groups dedupe, which is exactly KMV's union rule.

    Scale shape: values hash BEFORE the shuffle (8-byte hashes travel,
    never the text), per-group top-k is one window over the hashed
    distinct set, the merge is O(groups x k). Determinism: md5 hashes
    (engine-identical), integer order statistics, ONE double division
    at the end — bit-exact against the SQL twin.
    """
    hashed = (
        df.select(
            F.col(group_col).cast("string").alias("scope"),
            md5_hash64(F.col(col)).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("scope").orderBy("h")
    sketch = hashed.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    union_sketch = (
        sketch.select("h")
        .distinct()  # KMV union rule: same value -> same hash -> dedupe
        .withColumn("r", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("r") <= k)
        .select(F.lit("__union__").alias("scope"), "h", "r")
    )
    per = (
        sketch.unionByName(union_sketch)
        .groupBy("scope")
        .agg(F.count(F.lit(1)).alias("n_sketch"), F.max("h").alias("kth_hash"))
    )
    exact = (
        hashed.groupBy("scope")
        .agg(F.count(F.lit(1)).alias("ndv_exact"))
        .unionByName(
            hashed.select("h")
            .distinct()
            .agg(F.count(F.lit(1)).alias("ndv_exact"))
            .select(F.lit("__union__").alias("scope"), "ndv_exact")
        )
    )
    numer = float((k - 1) * (1 << 60))  # exact double (small int * 2^60)
    est = F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double")).otherwise(
        F.lit(numer) / F.col("kth_hash").cast("double")
    )
    return per.join(exact, "scope").select(
        "scope", "n_sketch", "kth_hash", est.alias("ndv_est"), "ndv_exact"
    )


def sql_kmv_distinct_by_group(table: str, group_col: str, col: str, k: int = 64) -> str:
    """DuckDB twin of ``kmv_distinct_by_group`` — identical hashes,
    order statistics, union rule, and final expression."""
    h = sql_md5_hash64(col)
    numer = float((k - 1) * (1 << 60))
    return f"""
    WITH hashed AS (
        SELECT DISTINCT CAST({group_col} AS VARCHAR) AS scope, {h} AS h
        FROM {table}
    ),
    sketch AS (
        SELECT scope, h FROM (
            SELECT scope, h,
                   row_number() OVER (PARTITION BY scope ORDER BY h) AS r
            FROM hashed
        ) WHERE r <= {k}
    ),
    union_sketch AS (
        SELECT '__union__' AS scope, h FROM (
            SELECT h, row_number() OVER (ORDER BY h) AS r
            FROM (SELECT DISTINCT h FROM sketch)
        ) WHERE r <= {k}
    ),
    per AS (
        SELECT scope, CAST(count(*) AS BIGINT) AS n_sketch,
               CAST(max(h) AS BIGINT) AS kth_hash
        FROM (SELECT * FROM sketch UNION ALL SELECT * FROM union_sketch)
        GROUP BY scope
    ),
    exact AS (
        SELECT scope, CAST(count(*) AS BIGINT) AS ndv_exact FROM hashed GROUP BY scope
        UNION ALL
        SELECT '__union__', CAST(count(DISTINCT h) AS BIGINT) FROM hashed
    )
    SELECT per.scope, per.n_sketch, per.kth_hash,
           CASE WHEN per.n_sketch < {k} THEN CAST(per.n_sketch AS DOUBLE)
                ELSE {numer!r} / CAST(per.kth_hash AS DOUBLE) END AS ndv_est,
           exact.ndv_exact
    FROM per JOIN exact ON per.scope = exact.scope
    """


# ---------------------------------------------------------------------------
# t-digest quantile sketch (k7)
# ---------------------------------------------------------------------------

def tdigest_bounds(n: int, delta: int = 100) -> list[tuple[int, int, int]]:
    """Deterministic t-digest centroid boundaries for ``n`` unit-weight
    points at compression ``delta``: (centroid_id, lo, hi] rank
    intervals.

    Uses Dunning's ORIGINAL size bound (t-digest paper, 2013): a
    centroid starting after rank ``c`` may hold at most
    ``4 * n * q * (1-q) / delta`` points with ``q = c/n`` — evaluated
    in EXACT integer arithmetic (``4*c*(n-c) // (delta*n)``), so the
    boundary sequence is bit-identical everywhere, including the
    DuckDB recursive-CTE twin. The k1/asin scale variant would need
    libm; the rational q(1-q) bound gives the same tails-are-singleton
    shape (sizes taper to 1 at both ends, ~n/delta in the middle;
    O(delta * ln(n/delta)) centroids vs asin's O(delta) — still a
    few hundred rows at any n) with no transcendental anywhere.
    """
    out: list[tuple[int, int, int]] = []
    c = 0
    i = 0
    while c < n:
        w = max(1, (4 * c * (n - c)) // (delta * n))
        nxt = min(n, c + w)
        i += 1
        out.append((i, c, nxt))
        c = nxt
    return out


def sql_tdigest_bounds(ns_relation: str, delta: int = 100) -> str:
    """DuckDB recursive-CTE twin of :func:`tdigest_bounds` over a
    relation ``(scope, n)`` — same integer recursion, same intervals.
    Emits ``bounds(scope, id, lo, hi)``; recursion depth is the
    centroid count (a few hundred), never the row count."""
    return f"""
    bounds(scope, id, lo, hi) AS (
        SELECT scope, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        FROM {ns_relation}
        UNION ALL
        SELECT b.scope, b.id + 1, b.hi,
               LEAST(n.n, b.hi + GREATEST(1, (4 * b.hi * (n.n - b.hi))
                                             // ({delta} * n.n)))
        FROM bounds b JOIN {ns_relation} n ON n.scope = b.scope
        WHERE b.hi < n.n
    )
    """


def tdigest_sketch_pass(
    ranked: DataFrame, ns: dict[str, int], delta: int
) -> DataFrame:
    """The one distributed pass of the t-digest build: assign each
    per-scope rank to its centroid interval and aggregate exact
    (weight, sum-of-cents) state.

    Block-bucketed interval assignment (the x5 point-in-interval
    pattern): a plain scope-keyed broadcast join would evaluate the
    (lo, hi] residual against EVERY bound of the row's scope
    (O(rows * delta) residual work — measured 2-4 s at sf0.1);
    pre-exploding each bound over rank-blocks of ~the average centroid
    width and joining on (scope, block) EQUALITY leaves O(1) candidate
    bounds per row. Block size derives from the same (n, delta)
    metadata as the bounds themselves, so the join stays a
    BroadcastHashJoin on both keys (plan-pinned).
    """
    spark = ranked.sparkSession
    total_n = sum(ns.values())
    bounds_rows = [
        (scope, cid, lo, hi)
        for scope, n in sorted(ns.items())
        for cid, lo, hi in tdigest_bounds(n, delta)
    ]
    block = max(64, total_n // max(1, len(bounds_rows)))
    blocked_rows = [
        (scope, blk, cid, lo, hi)
        for scope, cid, lo, hi in bounds_rows
        for blk in range(lo // block, max(lo // block, (hi - 1) // block) + 1)
    ]
    # JVM LocalTableScan: the Python-list literal scanned as 32 Python-
    # worker tasks per consumer (dml.local_frame, r17)
    bdf = local_frame(
        spark, blocked_rows, "scope string, blk long, id long, lo long, hi long"
    )
    assigned = ranked.withColumn(
        "blk", F.expr(f"CAST((r - 1) DIV {block} AS BIGINT)")
    ).join(F.broadcast(bdf), on=["scope", "blk"])
    return (
        assigned.filter((F.col("r") > F.col("lo")) & (F.col("r") <= F.col("hi")))
        .groupBy("scope", "id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("w"),
            F.sum("cents").alias("sum_cents"),
        )
    )


def tdigest_quantiles_by_group(
    df: DataFrame,
    group_col: str,
    cents: Column,
    tiebreak: Column,
    delta: int = 100,
    pcts: tuple[int, ...] = (1, 5, 25, 50, 75, 95, 99),
    audit: bool = True,
) -> DataFrame:
    """t-digest quantile sketch per group + a deterministically merged
    global digest (k7).

    Construction (per group): rank rows by (value, tiebreak) —
    scope-partitioned window, shuffle-keyed, never single-partition —
    and assign each rank to the centroid whose (lo, hi] interval
    contains it (:func:`tdigest_bounds`; boundaries depend only on
    (n, delta) and are computed driver-side from the per-scope counts
    — an O(scopes) metadata collect, zone-map class — then broadcast-
    joined back). Centroids carry EXACT state: (weight, sum of integer
    cents); the mean is one final double division.

    Merge (the '__merged__' scope): per-group centroids sorted by
    (mean, scope, id) — the deterministic merge order VERDICT r6 asked
    for; mean ties cannot reorder state — then each input centroid's
    integer weight-MIDPOINT rank is assigned against boundaries for
    the TOTAL weight (the stratified "merging digest" rule: closed
    form, no sequential greedy, so the SQL twin replays it exactly).
    Merged centroids re-sum the exact (weight, cents) state — this is
    Dunning's cluster-the-clusters merge with O(sum of sketch sizes)
    work, never a rescan of rows.

    Output: one row per (scope ∪ '__merged__') x probe percentile —
    (scope, q_pct, t_rank, centroid_w, est, exact): ``t_rank`` the
    exact target rank ceil(pct*n/100), ``centroid_w`` the weight of
    the answering centroid (digest granularity at that quantile),
    ``est`` the digest estimate (answering centroid's mean),
    ``exact`` the true quantile — rank error is bounded by the
    centroid width, ~n/delta mid-range and 1 row at the tails.

    Scale shape: rows shuffle once (per-scope rank), centroid state is
    O(scopes * delta) rows end-to-end, the merge never touches raw
    rows, and every join against boundaries/probes broadcasts. The
    global exact-quantile rank (``audit=True``) uses one full-order
    window — oracle-parity scaffolding (x7 precedent), NOT part of the
    shipped plan; ``audit=False`` is the plan that runs at 100 TB
    (sketch + merge + estimates only, no global sort anywhere) and is
    what the benchmark measures (k10, VERDICT r7 item #2).
    """
    spark = df.sparkSession
    rows = df.select(
        F.col(group_col).cast("string").alias("scope"),
        cents.cast("long").alias("cents"),
        tiebreak.cast("long").alias("tb"),
    )
    win = Window.partitionBy("scope").orderBy("cents", "tb")
    ranked = rows.withColumn("r", F.row_number().over(win))

    ns = {
        row["scope"]: row["n"]
        for row in rows.groupBy("scope").agg(F.count(F.lit(1)).alias("n")).collect()
    }  # O(scopes) metadata collect (boundaries depend only on counts)
    total_n = sum(ns.values())

    cent_pass = tdigest_sketch_pass(ranked, ns, delta)
    # Materialize the digest ONCE: `cent_pass` IS the sketch —
    # O(scopes * delta) exact-integer rows, bounded by parameters, not
    # data (same metadata class as the `ns` collect above). Without
    # this, every downstream consumer (scope probes, the merged
    # digest, the audit join) re-executes the full rank + assign pass.
    # At 100 TB the digest is exactly what an executor-side combiner
    # would emit, and collecting it is how every sketch consumer
    # (including Spark's approx_percentile) finishes.
    sketch_rows = sorted(
        (r["scope"], r["id"], r["lo"], r["hi"], r["w"], r["sum_cents"])
        for r in cent_pass.collect()
    )

    # ---- deterministic merge into the '__merged__' digest ----------
    # Driver-side over the MATERIALIZED digest (2k exact-integer rows,
    # O(scopes * delta)): this is the post-processing every sketch
    # library runs on collected sketch state (Spark's own
    # approx_percentile merges digests on the driver the same way).
    # Arithmetic replicates the SQL twin token-for-token: the merge
    # order key (CAST(sum_cents AS DOUBLE)/CAST(w AS DOUBLE), scope,
    # id) is one IEEE double division (Python '/' on ints < 2^53 is
    # the identical operation), the midpoint is exact-integer, and
    # each estimate is one final double division.
    morder = sorted(sketch_rows, key=lambda t: (t[5] / t[4], t[0], t[1]))
    mids = []
    w_hi = 0
    for scope, cid, lo, hi, w, sum_cents in morder:
        w_hi += w
        mids.append((w_hi - w + (w + 1) // 2, w, sum_cents))
    mbounds = tdigest_bounds(total_n, delta)
    merged_state: dict[int, list[int]] = {}
    for mid, w, sum_cents in mids:
        for mid_id, mlo, mhi in mbounds:
            if mlo < mid <= mhi:
                st = merged_state.setdefault(mid_id, [0, 0])
                st[0] += w
                st[1] += sum_cents
                break
    merged_iv = []
    v_hi = 0
    for mid_id in sorted(merged_state):
        w, sum_cents = merged_state[mid_id]
        v_hi += w
        merged_iv.append((v_hi - w, v_hi, w, sum_cents))

    # ---- probes -----------------------------------------------------
    per_scope: dict[str, list[tuple[int, int, int, int]]] = {}
    for scope, cid, lo, hi, w, sum_cents in sketch_rows:
        per_scope.setdefault(scope, []).append((lo, hi, w, sum_cents))
    est_rows = []
    for scope, n in sorted(ns.items()):
        for pct in pcts:
            t_rank = max(1, (pct * n + 99) // 100)
            for lo, hi, w, sum_cents in per_scope[scope]:
                if lo < t_rank <= hi:
                    est_rows.append(
                        (scope, pct, t_rank, w, sum_cents / (w * 100))
                    )
                    break
    for pct in pcts:
        t_rank = max(1, (pct * total_n + 99) // 100)
        for v_lo, v_hi, w, sum_cents in merged_iv:
            if v_lo < t_rank <= v_hi:
                est_rows.append(
                    ("__merged__", pct, t_rank, w, sum_cents / (w * 100))
                )
                break
    est = local_frame(
        spark,
        est_rows,
        "scope string, q_pct long, t_rank long, centroid_w long, est double",
    )
    if not audit:
        return est
    exact_scope = ranked.select("scope", "r", "cents")
    gwin = Window.orderBy("cents", "scope", "tb")
    exact_global = rows.withColumn("r", F.row_number().over(gwin)).select(
        F.lit("__merged__").alias("scope"), "r", "cents"
    )
    exacts = exact_scope.unionByName(exact_global)
    return (
        est.join(
            exacts,
            on=[est["scope"] == exacts["scope"], est["t_rank"] == exacts["r"]],
        )
        .select(
            est["scope"], "q_pct", "t_rank", "centroid_w", "est",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("exact"),
        )
    )


def sql_tdigest_quantiles_by_group(
    table: str,
    group_col: str,
    cents_expr: str,
    tiebreak_expr: str,
    delta: int = 100,
    pcts: tuple[int, ...] = (1, 5, 25, 50, 75, 95, 99),
    audit: bool = True,
) -> str:
    """DuckDB twin of :func:`tdigest_quantiles_by_group` — identical
    integer boundary recursion (recursive CTE over centroid counts),
    identical (mean, scope, id) merge order, identical midpoint rule,
    one double division per estimate. ``audit=False`` mirrors the
    shipped-plan variant (no exact-quantile ride-along)."""
    pct_values = ", ".join(f"({p})" for p in pcts)
    final = (
        """
    exacts AS (
        SELECT scope, r, cents FROM ranked
        UNION ALL
        SELECT '__merged__',
               row_number() OVER (ORDER BY cents, scope, tb), cents
        FROM rows_
    )
    SELECT est.scope, est.q_pct, est.t_rank, est.centroid_w, est.est,
           CAST(x.cents AS DOUBLE) / 100.0 AS exact
    FROM est JOIN exacts x ON x.scope = est.scope AND x.r = est.t_rank
    """
        if audit
        else """
    final_ AS (SELECT 1)
    SELECT scope, q_pct, t_rank, centroid_w, est FROM est
    """
    )
    return f"""
    WITH RECURSIVE rows_ AS (
        SELECT CAST({group_col} AS VARCHAR) AS scope,
               CAST({cents_expr} AS BIGINT) AS cents,
               CAST({tiebreak_expr} AS BIGINT) AS tb
        FROM {table}
    ),
    ranked AS (
        SELECT scope, cents, tb,
               row_number() OVER (PARTITION BY scope ORDER BY cents, tb) AS r
        FROM rows_
    ),
    ns AS (SELECT scope, CAST(count(*) AS BIGINT) AS n FROM rows_ GROUP BY 1),
    {sql_tdigest_bounds("ns", delta)},
    cent AS (
        SELECT ranked.scope, b.id, b.lo, b.hi,
               CAST(count(*) AS BIGINT) AS w,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM ranked
        JOIN bounds b ON b.scope = ranked.scope
                     AND ranked.r > b.lo AND ranked.r <= b.hi
        GROUP BY 1, 2, 3, 4
    ),
    tot AS (SELECT '__all__' AS scope, CAST(sum(n) AS BIGINT) AS n FROM ns),
    mbounds_rec AS (
        SELECT scope, 0 AS id, CAST(0 AS BIGINT) AS lo, CAST(0 AS BIGINT) AS hi
        FROM tot
        UNION ALL
        SELECT b.scope, b.id + 1, b.hi,
               LEAST(n.n, b.hi + GREATEST(1, (4 * b.hi * (n.n - b.hi))
                                             // ({delta} * n.n)))
        FROM mbounds_rec b JOIN tot n ON n.scope = b.scope
        WHERE b.hi < n.n
    ),
    mbounds AS (SELECT id AS mid_id, lo AS mlo, hi AS mhi
                FROM mbounds_rec WHERE id >= 1),
    with_mid AS (
        SELECT scope, id, w, sum_cents,
               CAST(sum(w) OVER (ORDER BY CAST(sum_cents AS DOUBLE) / CAST(w AS DOUBLE),
                                          scope, id) AS BIGINT) AS w_hi
        FROM cent
    ),
    mids AS (
        SELECT *, (w_hi - w) + (w + 1) // 2 AS mid FROM with_mid
    ),
    merged AS (
        SELECT mb.mid_id, CAST(sum(w) AS BIGINT) AS w,
               CAST(sum(sum_cents) AS BIGINT) AS sum_cents
        FROM mids JOIN mbounds mb ON mids.mid > mb.mlo AND mids.mid <= mb.mhi
        GROUP BY 1
    ),
    merged_iv AS (
        SELECT mid_id, w, sum_cents,
               CAST(sum(w) OVER (ORDER BY mid_id) AS BIGINT) AS v_hi,
               CAST(sum(w) OVER (ORDER BY mid_id) AS BIGINT) - w AS v_lo
        FROM merged
    ),
    pctv(q_pct) AS (VALUES {pct_values}),
    probes AS (
        SELECT scope, CAST(q_pct AS BIGINT) AS q_pct,
               GREATEST(1, (q_pct * n + 99) // 100) AS t_rank
        FROM ns CROSS JOIN pctv
        UNION ALL
        SELECT '__merged__', CAST(q_pct AS BIGINT),
               GREATEST(1, (q_pct * n + 99) // 100)
        FROM tot CROSS JOIN pctv
    ),
    est AS (
        SELECT p.scope, p.q_pct, p.t_rank, c.w AS centroid_w,
               CAST(c.sum_cents AS DOUBLE) / CAST(c.w * 100 AS DOUBLE) AS est
        FROM probes p
        JOIN cent c ON c.scope = p.scope
                   AND p.t_rank > c.lo AND p.t_rank <= c.hi
        WHERE p.scope <> '__merged__'
        UNION ALL
        SELECT p.scope, p.q_pct, p.t_rank, m.w,
               CAST(m.sum_cents AS DOUBLE) / CAST(m.w * 100 AS DOUBLE)
        FROM probes p
        JOIN merged_iv m ON p.t_rank > m.v_lo AND p.t_rank <= m.v_hi
        WHERE p.scope = '__merged__'
    ),{final}"""


def kmv_set_ops(
    df: DataFrame, group_col: str, col: str, scope_a: str, scope_b: str, k: int = 64
) -> DataFrame:
    """KMV set-operation estimates between two groups' sketches (k8) —
    the capability k6's docstring promises: because a KMV sketch IS a
    uniform hash sample of the distinct values, the UNION sketch's
    members can be probed for membership in each side, giving
    unbiased Jaccard / intersection / union estimates (Beyer et al.
    2007) that HLL registers cannot produce.

    Estimator: build both sketches (k smallest distinct hashes each),
    merge to the union sketch K (k smallest of the union; its k-th
    hash estimates |A ∪ B| exactly as in k6), then p = |K ∩ A ∩ B|/|K|
    estimates Jaccard J(A,B); intersection ≈ p * union_est. All
    membership probes are O(k) joins on sketch rows — the raw table is
    scanned once for hashing and never again. Exact distinct counts of
    both sides ride along as self-audit.

    Determinism: md5 hashes, integer order statistics, the two double
    divisions happen at the end — bit-exact vs the SQL twin.
    """
    hashed = (
        df.filter(F.col(group_col).cast("string").isin(scope_a, scope_b))
        .select(
            F.col(group_col).cast("string").alias("scope"),
            md5_hash64(F.col(col)).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("scope").orderBy("h")
    sketch = hashed.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    union_sketch = (
        sketch.select("h")
        .distinct()
        .withColumn("r", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("r") <= k)
    )
    n_union = union_sketch.agg(
        F.count(F.lit(1)).alias("n_k"), F.max("h").alias("kth_hash")
    )
    in_a = sketch.filter(F.col("scope") == scope_a).select("h")
    in_b = sketch.filter(F.col("scope") == scope_b).select("h")
    both = (
        union_sketch.join(in_a, "h", "left_semi")
        .join(in_b, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    exact = hashed.groupBy("scope").agg(F.count(F.lit(1)).alias("ndv"))
    ex_a = exact.filter(F.col("scope") == scope_a).select(
        F.col("ndv").alias("ndv_a")
    )
    ex_b = exact.filter(F.col("scope") == scope_b).select(
        F.col("ndv").alias("ndv_b")
    )
    numer = float((k - 1) * (1 << 60))
    union_est = F.when(
        F.col("n_k") < k, F.col("n_k").cast("double")
    ).otherwise(F.lit(numer) / F.col("kth_hash").cast("double"))
    jacc = F.col("n_both").cast("double") / F.col("n_k").cast("double")
    return (
        n_union.crossJoin(both)  # 1x1 scalar aggregates
        .crossJoin(ex_a)
        .crossJoin(ex_b)
        .select(
            F.lit(scope_a).alias("scope_a"),
            F.lit(scope_b).alias("scope_b"),
            F.col("n_k").cast("long").alias("n_k"),
            F.col("n_both").cast("long").alias("n_both"),
            union_est.alias("union_est"),
            jacc.alias("jaccard_est"),
            (jacc * union_est).alias("intersection_est"),
            F.col("ndv_a").cast("long").alias("ndv_a"),
            F.col("ndv_b").cast("long").alias("ndv_b"),
        )
    )


def sql_kmv_set_ops(
    table: str, group_col: str, col: str, scope_a: str, scope_b: str, k: int = 64
) -> str:
    """DuckDB twin of :func:`kmv_set_ops` — identical hashes, order
    statistics, membership probes, and final expressions."""
    h = sql_md5_hash64(col)
    numer = float((k - 1) * (1 << 60))
    return f"""
    WITH hashed AS (
        SELECT DISTINCT CAST({group_col} AS VARCHAR) AS scope, {h} AS h
        FROM {table}
        WHERE CAST({group_col} AS VARCHAR) IN ('{scope_a}', '{scope_b}')
    ),
    sketch AS (
        SELECT scope, h FROM (
            SELECT scope, h,
                   row_number() OVER (PARTITION BY scope ORDER BY h) AS r
            FROM hashed
        ) WHERE r <= {k}
    ),
    union_sketch AS (
        SELECT h FROM (
            SELECT h, row_number() OVER (ORDER BY h) AS r
            FROM (SELECT DISTINCT h FROM sketch)
        ) WHERE r <= {k}
    ),
    nu AS (SELECT CAST(count(*) AS BIGINT) AS n_k,
                  CAST(max(h) AS BIGINT) AS kth_hash FROM union_sketch),
    nboth AS (
        SELECT CAST(count(*) AS BIGINT) AS n_both
        FROM union_sketch u
        WHERE EXISTS (SELECT 1 FROM sketch s
                      WHERE s.scope = '{scope_a}' AND s.h = u.h)
          AND EXISTS (SELECT 1 FROM sketch s
                      WHERE s.scope = '{scope_b}' AND s.h = u.h)
    ),
    ex AS (SELECT scope, CAST(count(*) AS BIGINT) AS ndv
           FROM hashed GROUP BY scope)
    SELECT '{scope_a}' AS scope_a, '{scope_b}' AS scope_b,
           nu.n_k, nboth.n_both,
           CASE WHEN nu.n_k < {k} THEN CAST(nu.n_k AS DOUBLE)
                ELSE {numer!r} / CAST(nu.kth_hash AS DOUBLE) END AS union_est,
           CAST(nboth.n_both AS DOUBLE) / CAST(nu.n_k AS DOUBLE) AS jaccard_est,
           (CAST(nboth.n_both AS DOUBLE) / CAST(nu.n_k AS DOUBLE))
             * (CASE WHEN nu.n_k < {k} THEN CAST(nu.n_k AS DOUBLE)
                     ELSE {numer!r} / CAST(nu.kth_hash AS DOUBLE) END)
               AS intersection_est,
           (SELECT ndv FROM ex WHERE scope = '{scope_a}') AS ndv_a,
           (SELECT ndv FROM ex WHERE scope = '{scope_b}') AS ndv_b
    FROM nu, nboth
    """


def kmv_set_ops_bounds(
    df: DataFrame,
    group_col: str,
    col: str,
    scope_a: str,
    scope_b: str,
    k: int = 64,
    z: float = 2.0,
) -> DataFrame:
    """Theta-sketch-style a-priori error BOUNDS for KMV set operations
    (k9) — the honesty layer on top of k8's point estimates: every
    estimate ships with a [lb, ub] interval derived from the sketch
    alone (Dasgupta/Rhodes, the DataSketches bound construction), so a
    100 TB consumer can act on "between 1.1M and 1.3M shared keys"
    instead of a bare point.

    Construction: the union sketch's k-th smallest hash fixes the
    sampling probability theta = kth_hash / 2^60 (hashes are uniform
    60-bit — operators/sketches.py:md5_hash64); any derived set with
    ``c`` retained members estimates c/theta with binomial sd
    sqrt(c*(1-theta))/theta, giving lb = max(c, est - z*sd) and
    ub = est + z*sd (c is an exact floor: retained members are real).
    An unsaturated sketch (n_k < k) has theta = 1 — every distinct
    value was retained, bounds collapse to the exact count. Exact
    intersection/ndv ride along as the self-audit the parity test uses
    to assert containment.

    Scale shape is k8's: ONE scan hashes the table; sketches,
    membership probes, and bound arithmetic are O(k) rows. Bit-exact
    contract: integer order statistics; the double divisions and one
    IEEE sqrt (correctly rounded, identical in both engines) happen
    only in the final projection, mirrored token-for-token in the SQL
    twin.
    """
    hashed = (
        df.filter(F.col(group_col).cast("string").isin(scope_a, scope_b))
        .select(
            F.col(group_col).cast("string").alias("scope"),
            md5_hash64(F.col(col)).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("scope").orderBy("h")
    sketch = hashed.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    union_sketch = (
        sketch.select("h")
        .distinct()
        .withColumn("r", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("r") <= k)
    )
    n_union = union_sketch.agg(
        F.count(F.lit(1)).alias("n_k"), F.max("h").alias("kth_hash")
    )
    in_a = sketch.filter(F.col("scope") == scope_a).select("h")
    in_b = sketch.filter(F.col("scope") == scope_b).select("h")
    both = (
        union_sketch.join(in_a, "h", "left_semi")
        .join(in_b, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    exact_inter = (
        hashed.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_scopes"))
        .filter(F.col("n_scopes") == 2)
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    denom = float(1 << 60)
    theta = F.when(F.col("n_k") < k, F.lit(1.0)).otherwise(
        F.col("kth_hash").cast("double") / F.lit(denom)
    )
    c = F.col("n_both").cast("double")
    est = c / theta
    sd = F.sqrt(c * (F.lit(1.0) - theta)) / theta
    lb = F.greatest(c, est - F.lit(z) * sd)
    ub = est + F.lit(z) * sd
    return (
        n_union.crossJoin(both)  # 1x1 scalar aggregates
        .crossJoin(exact_inter)
        .select(
            F.lit(scope_a).alias("scope_a"),
            F.lit(scope_b).alias("scope_b"),
            F.col("n_k").cast("long").alias("n_k"),
            F.col("n_both").cast("long").alias("n_both"),
            theta.alias("theta"),
            est.alias("inter_est"),
            lb.alias("inter_lb"),
            ub.alias("inter_ub"),
            F.col("exact_inter").cast("long").alias("exact_inter"),
            (
                (F.col("exact_inter").cast("double") >= lb)
                & (F.col("exact_inter").cast("double") <= ub)
            ).alias("inter_in_bounds"),
        )
    )


def sql_kmv_set_ops_bounds(
    table: str,
    group_col: str,
    col: str,
    scope_a: str,
    scope_b: str,
    k: int = 64,
    z: float = 2.0,
) -> str:
    """DuckDB twin of :func:`kmv_set_ops_bounds` — identical hashes,
    order statistics, and final bound arithmetic token-for-token."""
    h = sql_md5_hash64(col)
    denom = float(1 << 60)
    theta = (
        f"CASE WHEN nu.n_k < {k} THEN 1.0"
        f" ELSE CAST(nu.kth_hash AS DOUBLE) / {denom!r} END"
    )
    c = "CAST(nboth.n_both AS DOUBLE)"
    est = f"({c} / ({theta}))"
    sd = f"(sqrt({c} * (1.0 - ({theta}))) / ({theta}))"
    lb = f"greatest({c}, {est} - {z!r} * {sd})"
    ub = f"({est} + {z!r} * {sd})"
    return f"""
    WITH hashed AS (
        SELECT DISTINCT CAST({group_col} AS VARCHAR) AS scope, {h} AS h
        FROM {table}
        WHERE CAST({group_col} AS VARCHAR) IN ('{scope_a}', '{scope_b}')
    ),
    sketch AS (
        SELECT scope, h FROM (
            SELECT scope, h,
                   row_number() OVER (PARTITION BY scope ORDER BY h) AS r
            FROM hashed
        ) WHERE r <= {k}
    ),
    union_sketch AS (
        SELECT h FROM (
            SELECT h, row_number() OVER (ORDER BY h) AS r
            FROM (SELECT DISTINCT h FROM sketch)
        ) WHERE r <= {k}
    ),
    nu AS (SELECT CAST(count(*) AS BIGINT) AS n_k,
                  CAST(max(h) AS BIGINT) AS kth_hash FROM union_sketch),
    nboth AS (
        SELECT CAST(count(*) AS BIGINT) AS n_both
        FROM union_sketch u
        WHERE EXISTS (SELECT 1 FROM sketch s
                      WHERE s.scope = '{scope_a}' AND s.h = u.h)
          AND EXISTS (SELECT 1 FROM sketch s
                      WHERE s.scope = '{scope_b}' AND s.h = u.h)
    ),
    ei AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_inter
        FROM (SELECT h FROM hashed GROUP BY h HAVING count(*) = 2)
    )
    SELECT '{scope_a}' AS scope_a, '{scope_b}' AS scope_b,
           nu.n_k, nboth.n_both,
           {theta} AS theta,
           {est} AS inter_est,
           {lb} AS inter_lb,
           {ub} AS inter_ub,
           ei.exact_inter,
           (CAST(ei.exact_inter AS DOUBLE) >= {lb}
            AND CAST(ei.exact_inter AS DOUBLE) <= {ub}) AS inter_in_bounds
    FROM nu, nboth, ei
    """

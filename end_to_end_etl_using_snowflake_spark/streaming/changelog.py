"""Engine-owned changelog: the Snowflake STREAM analog (SURVEY §2.10).

Snowflake streams (reference customer-...sql:48-49, item-...sql:40-41,
order-...sql:66-67) are CDC views over a table: consuming one inside a
DML statement atomically advances its offset, so the same changes are
never reprocessed (T1); change rows carry insert/update/delete actions
(T2).

Plain Parquet has no CDF, so each managed table keeps a companion
append-only changelog directory:

    <table>.__changelog/   parquet: table columns + _action + _version
    <table>.__meta.json    {"version": N, "offsets": {consumer: V}}

A *stream* is just a named consumer: reading returns rows with
``_version > offsets[consumer]``; committing sets the offset. The
write-table -> commit-offset sequence is crash-safe the same way
Structured Streaming's is: a re-run re-reads the same batch and the
downstream MERGE is idempotent for identical input.

Scale: the changelog is partitioned by ``_version`` so offset reads
prune to new files only; metadata (one small JSON per table) stays on
the driver — row data never does.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ACTION_COL = "_action"
VERSION_COL = "_version"


def _count_parquet_rows(root: str) -> int:
    """Exact row count of a just-written version directory from the
    parquet FOOTERS — O(files) driver-side metadata reads, no Spark
    job. Powers the stream_has_data metadata fast path (r16)."""
    import pyarrow.parquet as pq

    n = 0
    for r, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(r, f)).metadata.num_rows
    return n


class Changelog:
    def __init__(self, spark: SparkSession, table_path: str):
        self.spark = spark
        self.log_path = f"{table_path}.__changelog"
        self.meta_path = f"{table_path}.__meta.json"

    # -- metadata ----------------------------------------------------------
    def _read_meta(self) -> dict:
        if not os.path.exists(self.meta_path):
            return {"version": 0, "offsets": {}}
        with open(self.meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.meta_path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.meta_path)  # atomic

    @property
    def version(self) -> int:
        return self._read_meta()["version"]

    def offset(self, consumer: str) -> int:
        return self._read_meta()["offsets"].get(consumer, 0)

    # -- producer side -----------------------------------------------------
    def record(self, df: DataFrame, action: str, at: str | None = None) -> int:
        """Append change rows under a new version; returns it.

        ``at`` optionally stamps the version's commit time (ISO text,
        injectable for determinism like the F1 clock) into the meta —
        the index ``AT (TIMESTAMP => ...)`` time travel resolves
        against (:meth:`version_at`). Unstamped versions are simply
        invisible to timestamp resolution.

        Layout (r16): BOTH ``_version`` and ``_action`` are partition
        directories (``_version=N/_action=A/part-*.parquet``), so the
        parquet files carry exactly the table columns. Two wins at any
        scale: a producer that just wrote the same rows to its table
        can commit the changelog by HARDLINKING the files
        (:meth:`record_linked` — zero bytes copied, no second job),
        and the per-version row count is readable from the parquet
        footers (O(files) driver metadata), which
        :meth:`stream_has_data` uses to answer without a Spark job.
        Readers are unchanged: partition discovery appends both
        columns, and every consumer selects by name."""
        meta = self._read_meta()
        new_version = meta["version"] + 1
        (
            df.withColumn(ACTION_COL, F.lit(action))
            .withColumn(VERSION_COL, F.lit(new_version))
            .write.mode("append")
            .partitionBy(VERSION_COL, ACTION_COL)
            .parquet(self.log_path)
        )
        meta["version"] = new_version
        meta.setdefault("rows", {})[str(new_version)] = _count_parquet_rows(
            os.path.join(self.log_path, f"{VERSION_COL}={new_version}")
        )
        if at is not None:
            meta.setdefault("times", {})[str(new_version)] = at
        self._write_meta(meta)
        return new_version

    def record_linked(
        self, src_dir: str, action: str, at: str | None = None
    ) -> int:
        """Commit a new version by HARDLINKING the parquet files of
        ``src_dir`` (a directory some producer just wrote with exactly
        the table's columns) instead of running a second write job —
        the zero-copy half of the r16 layout. Equivalent to
        ``record(df, action)`` for a ``df`` with the same rows: the
        files' columns are the table columns, and ``_version`` /
        ``_action`` live in the directory names. O(files) metadata
        work, zero bytes copied, shared write-once inodes (same trick
        as CLONE TABLE)."""
        meta = self._read_meta()
        new_version = meta["version"] + 1
        dst = os.path.join(
            self.log_path,
            f"{VERSION_COL}={new_version}",
            f"{ACTION_COL}={action}",
        )
        os.makedirs(dst, exist_ok=True)
        rows = 0
        for root, _dirs, files in os.walk(src_dir):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                target = os.path.join(dst, f)
                if os.path.exists(target):  # paranoid: part names are unique
                    target = os.path.join(dst, f"v{new_version}-{f}")
                os.link(os.path.join(root, f), target)
        rows = _count_parquet_rows(dst)
        meta["version"] = new_version
        meta.setdefault("rows", {})[str(new_version)] = rows
        if at is not None:
            meta.setdefault("times", {})[str(new_version)] = at
        self._write_meta(meta)
        return new_version

    def version_at(self, ts: str) -> int:
        """Greatest version whose recorded commit time is <= ``ts``
        (ISO text comparison — both sides must use the same rendering);
        0 when no stamped version qualifies (= empty table, matching
        Snowflake's 'object did not exist at that time' boundary)."""
        times = self._read_meta().get("times", {})
        best = 0
        for v, t in times.items():
            if t <= ts:
                best = max(best, int(v))
        return best

    def version_before(self, ts: str) -> int:
        """Greatest version whose recorded commit time is strictly
        < ``ts`` — Snowflake's ``BEFORE (TIMESTAMP => ...)`` boundary
        (a version committed exactly AT the probe instant is
        excluded, unlike :meth:`version_at`); 0 when none qualifies."""
        times = self._read_meta().get("times", {})
        best = 0
        for v, t in times.items():
            if t < ts:
                best = max(best, int(v))
        return best

    def bump(self) -> int:
        """Version bump with no rows (e.g. TRUNCATE)."""
        meta = self._read_meta()
        meta["version"] += 1
        meta.setdefault("rows", {})[str(meta["version"])] = 0
        self._write_meta(meta)
        return meta["version"]

    # -- consumer side (the "stream") --------------------------------------
    def stream_read(self, consumer: str) -> tuple[DataFrame, int]:
        """Unconsumed change rows + the version to commit after applying.

        Partition pruning on _version keeps this proportional to the new
        data, not the table's history.
        """
        meta = self._read_meta()
        current = meta["version"]
        offset = meta["offsets"].get(consumer, 0)
        if not os.path.exists(self.log_path):
            return None, current
        df = self.spark.read.parquet(self.log_path).filter(F.col(VERSION_COL) > offset)
        return df, current

    def stream_has_data(self, consumer: str) -> bool:
        """system$stream_has_data analog (customer-...sql:66): cheap
        check — metadata version compare + per-version row counts
        recorded at commit time, so the common case answers WITHOUT a
        Spark job (r16: the isEmpty probe cost one job per task-DAG
        gate — 6 jobs per pipeline cycle). Versions missing a recorded
        count (a changelog written before the counts existed) fall
        back to the any-rows probe."""
        meta = self._read_meta()
        current = meta["version"]
        offset = meta["offsets"].get(consumer, 0)
        if current <= offset:
            return False
        rows = meta.get("rows", {})
        counts = [rows.get(str(v)) for v in range(offset + 1, current + 1)]
        if all(c is not None for c in counts):
            return any(c > 0 for c in counts)
        df, _ = self.stream_read(consumer)
        return df is not None and not df.isEmpty()

    def stream_commit(self, consumer: str, version: int) -> None:
        """Advance the consumer offset (the transactional half of T1 —
        call after the consuming write lands)."""
        meta = self._read_meta()
        meta["offsets"][consumer] = version
        self._write_meta(meta)

    # -- retention ---------------------------------------------------------
    def vacuum(self, retain_versions: int = 1) -> list[int]:
        """Drop change partitions every consumer has consumed, keeping
        the last ``retain_versions`` for snapshot-as-of reads — the
        Snowflake time-travel retention analog.

        A continuously-merging engine grows its changelog without
        bound otherwise; at 100 TB retention is the difference between
        a bounded log and a second copy of history. Safety floor:
        never drop a version any consumer still has to read
        (min committed offset), then keep ``retain_versions`` below
        the head for time travel. Partition-level directory removal —
        no rewrite, O(dropped versions). Returns the versions dropped.
        """
        meta = self._read_meta()
        if not os.path.exists(self.log_path):
            return []
        offsets = meta["offsets"].values()
        consumer_floor = min(offsets) if offsets else meta["version"]
        cutoff = min(consumer_floor, meta["version"] - retain_versions)
        dropped = []
        for entry in sorted(os.listdir(self.log_path)):
            if not entry.startswith(f"{VERSION_COL}="):
                continue
            v = int(entry.split("=", 1)[1])
            if v <= cutoff:
                shutil.rmtree(os.path.join(self.log_path, entry), ignore_errors=True)
                dropped.append(v)
        return dropped


def snapshot_as_of(changes: DataFrame, keys, version: int) -> DataFrame:
    """Time-travel read: reconstruct the table state at ``version`` from
    a changelog (table columns + ``_action`` + ``_version``) — the
    latest change per key at or before the version wins; DELETE means
    the key is absent. This is the same replay the recovery path uses;
    Snowflake exposes it as ``AT (STATEMENT/TIMESTAMP ...)``.

    Scale: the changelog is partitioned by ``_version``, so the
    ``_version <= v`` filter prunes files before any shuffle; the
    window shuffles only changed keys, not the table.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(VERSION_COL).desc())
    latest = (
        changes.filter(F.col(VERSION_COL) <= version)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    return latest.filter(F.col(ACTION_COL) != "DELETE").drop(
        "__rn", ACTION_COL, VERSION_COL
    )


def table_changes(
    changes: DataFrame,
    keys,
    v_from: int,
    v_to: int,
    append_only: bool = False,
) -> DataFrame:
    """Snowflake ``CHANGES (INFORMATION => DEFAULT | APPEND_ONLY)``
    between two versions (r8): the MINIMAL row delta between the table
    state at ``v_from`` and at ``v_to`` — not the raw change journal.
    Matches Snowflake's documented net-change semantics:

    - a key present only at ``v_to`` -> one INSERT row
      (METADATA$ISUPDATE false),
    - present only at ``v_from`` -> one DELETE row carrying the OLD
      payload,
    - present in both with a differing payload -> the DELETE(old) +
      INSERT(new) pair, both METADATA$ISUPDATE true,
    - unchanged rows emit nothing (a row updated and reverted inside
      the interval is invisible — net semantics).

    ``append_only=True`` switches to Snowflake's documented
    APPEND_ONLY contract, which is JOURNAL-based, not net (ADVICE r8):
    every row genuinely APPENDED inside ``(v_from, v_to]`` surfaces —
    including rows inserted then deleted within the interval
    (Snowflake's 10-inserted/5-deleted example returns 10) and
    re-inserts under a key that was deleted earlier; updates to
    existing keys stay invisible. Derived from the journal itself: a
    change row is an append iff its action is insert-ish and the key's
    immediately-preceding journal action (if any) is DELETE.

    Scale: DEFAULT's endpoint snapshots replay with _version partition
    pruning (snapshot_as_of) and the diff is ONE keyed full-outer
    join + per-column null-safe comparison — no window over the raw
    journal, no cartesian. APPEND_ONLY is one keyed window (lag of
    _action) over journal rows pruned to ``_version <= v_to`` — the
    journal holds changed rows only, so both paths shuffle deltas,
    never the table. METADATA$ROW_ID is not emitted (the engine keys
    rows by the caller's key columns, which the output carries).
    Retention caveat (both flavors): versions vacuumed below v_from
    must still satisfy every consumer's offset floor (vacuum's
    contract) or prior-existence classification loses history.
    """
    from functools import reduce

    keys = list(keys)
    if append_only:
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(F.col(VERSION_COL))
        hist = changes.filter(F.col(VERSION_COL) <= v_to).withColumn(
            "__prev_action", F.lag(ACTION_COL).over(w)
        )
        payload = [
            c for c in changes.columns
            if c not in keys and c not in (ACTION_COL, VERSION_COL)
        ]
        return hist.filter(
            (F.col(VERSION_COL) > v_from)
            & (F.col(ACTION_COL) != "DELETE")
            & (
                F.col("__prev_action").isNull()
                | (F.col("__prev_action") == "DELETE")
            )
        ).select(
            *keys,
            *payload,
            F.lit("INSERT").alias("METADATA$ACTION"),
            F.lit(False).alias("METADATA$ISUPDATE"),
        )
    start = snapshot_as_of(changes, keys, v_from)
    now = snapshot_as_of(changes, keys, v_to)
    payload = [c for c in start.columns if c not in keys]
    s2 = start.select(
        *keys, *[F.col(c).alias(f"__old_{c}") for c in payload]
    ).withColumn("__in_s", F.lit(1))
    n2 = now.withColumn("__in_n", F.lit(1))
    j = n2.join(s2, on=keys, how="full_outer")
    same = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"__old_{c}")) for c in payload],
        F.lit(True),
    )
    in_both = F.col("__in_s").isNotNull() & F.col("__in_n").isNotNull()

    def _rows(cond, cols, action, isupdate):
        return j.filter(cond).select(
            *keys,
            *cols,
            F.lit(action).alias("METADATA$ACTION"),
            F.lit(isupdate).alias("METADATA$ISUPDATE"),
        )

    new_cols = [F.col(c).alias(c) for c in payload]
    old_cols = [F.col(f"__old_{c}").alias(c) for c in payload]
    inserts = _rows(F.col("__in_s").isNull(), new_cols, "INSERT", False)
    deletes = _rows(F.col("__in_n").isNull(), old_cols, "DELETE", False)
    upd_ins = _rows(in_both & ~same, new_cols, "INSERT", True)
    upd_del = _rows(in_both & ~same, old_cols, "DELETE", True)
    return inserts.unionByName(upd_ins).unionByName(deletes).unionByName(upd_del)


def append_only_stream_read(
    changelog: "Changelog", consumer: str, keys
) -> tuple[DataFrame, int]:
    """Snowflake ``CREATE STREAM ... APPEND_ONLY = TRUE`` semantics:
    the stream surfaces only genuinely APPENDED rows — updates to
    existing keys are invisible, and the contract is JOURNAL-based
    (ADVICE r8): a row inserted then deleted inside the unconsumed
    interval still surfaces (Snowflake's documented
    10-inserted/5-deleted example returns 10), and a re-insert under a
    previously-deleted key counts as appended. The engine's changelog
    records batch-level actions, not row-level insert-vs-update, so
    append-ness is DERIVED from the journal: a change row is an append
    iff its action is insert-ish and the key's immediately-preceding
    journal action (lag of ``_action`` per key, any version) is either
    absent or DELETE.

    Scale: one keyed window over journal rows only (changed rows,
    never the table); classification needs each batch key's prior
    journal row, so the read spans the retained log — vacuum's
    consumer-floor contract guarantees nothing a consumer still needs
    is gone. Returns (inserts_df with _version, commit_version) like
    stream_read; offsets commit through the normal stream_commit."""
    from pyspark.sql import Window

    meta = changelog._read_meta()
    current = meta["version"]
    offset = meta["offsets"].get(consumer, 0)
    if not os.path.exists(changelog.log_path):
        return None, current
    all_changes = changelog.spark.read.parquet(changelog.log_path)
    w = Window.partitionBy(*keys).orderBy(F.col(VERSION_COL))
    hist = all_changes.withColumn("__prev_action", F.lag(ACTION_COL).over(w))
    return (
        hist.filter(
            (F.col(VERSION_COL) > offset)
            & (F.col(ACTION_COL) != "DELETE")
            & (
                F.col("__prev_action").isNull()
                | (F.col("__prev_action") == "DELETE")
            )
        ).drop("__prev_action"),
        current,
    )

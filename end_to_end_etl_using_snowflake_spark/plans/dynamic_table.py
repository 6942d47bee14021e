"""Dynamic tables: a declaratively-defined aggregate kept fresh by
scheduled INCREMENTAL refreshes — the Snowflake DYNAMIC TABLE
(``CREATE DYNAMIC TABLE ... TARGET_LAG = '1 minute' AS SELECT ...``)
semantic, which subsumes the reference's hand-built stream+task+MERGE
chains (etl_script/*-end-to-end-pipeline-script.sql) into one object.

Composition of existing engine primitives, which is the point — a
dynamic table IS:

- a definition (the partial-aggregate plan over the base table's
  change stream),
- a changelog consumer (streaming/changelog.py — offsets make each
  refresh read exactly the rows that arrived since the last one,
  `_version` partition pruning keeps that O(delta)),
- an incremental fold (operators/dml.py:incremental_agg_merge — for
  additive measures the merge of partials IS the full aggregate,
  bit-exactly),
- and a scheduled task with a WHEN gate (streaming/tasks.py — a cycle
  with no new data SKIPs instead of scanning; TARGET_LAG maps to the
  task schedule interval).

At 100 TB the refresh cost is O(new rows + group cardinality) per
cycle, while a CREATE-TABLE-AS rebuild would re-scan history every
TARGET_LAG. Non-additive definitions (distinct counts, percentiles)
fall back to full refresh exactly as Snowflake's docs describe;
sketches (k1/k4) are the mergeable middle ground.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dml import ParquetTable, incremental_agg_merge
from ..streaming.changelog import ACTION_COL, VERSION_COL, Changelog
from ..streaming.tasks import Task, TaskDag


class DynamicTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        base_log: Changelog,
        build_partial: Callable[[DataFrame], DataFrame],
        keys: Sequence[str],
        sum_cols: Sequence[str],
        count_col: str | None = None,
    ):
        self.spark = spark
        self.table = ParquetTable(spark, path)
        self.log = base_log
        self.build_partial = build_partial
        self.keys = list(keys)
        self.sum_cols = list(sum_cols)
        self.count_col = count_col
        self.consumer = f"dt:{os.path.basename(path)}"

    APPLIED_MARKER = "_applied_version"

    def needs_refresh(self) -> bool:
        """The WHEN gate: metadata version compare + any-rows probe."""
        return self.log.stream_has_data(self.consumer)

    def applied_version(self) -> int:
        """Changelog version the stored state has folded, stamped into
        the table directory by the SAME atomic swap that wrote the
        data (ParquetTable.overwrite sidecar). 0 for a fresh table."""
        marker = os.path.join(self.table.path, self.APPLIED_MARKER)
        if not os.path.exists(marker):
            return 0
        with open(marker) as fh:
            return int(fh.read().strip())

    def refresh(self) -> None:
        """One incremental refresh: partial-aggregate ONLY the new
        change rows, fold into the stored state, commit the offset
        after the write lands.

        Crash safety: sum-folding is NOT idempotent, so a naive retry
        after a crash between the state swap and the offset commit
        would fold the same delta twice. The state therefore carries an
        ``_applied_version`` stamp written in the same atomic rename as
        the data, and the fold window is ``applied < _version <=
        current`` — on a crash-retry the already-folded versions are
        excluded (or, when nothing new arrived since the crash, the
        whole refresh degenerates to a roll-forward offset commit).
        """
        changes, version = self.log.stream_read(self.consumer)
        if changes is None:
            self.log.stream_commit(self.consumer, version)
            return
        applied = self.applied_version()
        if applied >= version:
            # Crash happened between swap and commit, and no new data
            # arrived since: state already covers the window — just
            # roll the offset forward.
            self.log.stream_commit(self.consumer, version)
            return
        # In steady state applied == committed offset so this predicate
        # matches stream_read's own window; after a swap-then-crash it
        # is strictly tighter and drops the already-folded versions.
        changes = changes.filter(F.col(VERSION_COL) > applied)
        partial = self.build_partial(changes.drop(ACTION_COL, VERSION_COL))
        if self.table.exists() and self.table.file_count() > 0:
            merged = incremental_agg_merge(
                self.table.read(),
                partial,
                keys=self.keys,
                sum_cols=self.sum_cols,
                count_col=self.count_col,
            )
        else:
            merged = partial
        self.table.overwrite(merged, sidecar={self.APPLIED_MARKER: str(version)})
        self.log.stream_commit(self.consumer, version)

    def as_task(self, dag: TaskDag, name: str, after: str | None = None) -> Task:
        """Register the refresh on a task DAG — TARGET_LAG is the
        dag's schedule interval; WHEN skips empty cycles."""
        return dag.add(
            Task(name=name, body=self.refresh, after=after, when=self.needs_refresh)
        )

    def read(self) -> DataFrame:
        return self.table.read()

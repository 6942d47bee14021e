"""S3/S4: pipes — auto-ingest of landing-dir files into a stage table.

Snowflake pipe (reference customer-...sql:51-56): S3 event -> COPY INTO
stage table; pausable (``pipe_execution_paused``, customer-...sql:68),
resumable (``system$pipe_force_resume``, customer-...sql:179), with
``system$pipe_status`` (customer-...sql:209).

Two modes, same semantics:

- batch (default): ``refresh()`` polls the directory and runs the
  manifest-diff COPY — used by the task cycle, where pause/resume
  brackets make the batch stable (T5).
- streaming: a Structured Streaming file source with checkpoint;
  ``Trigger.AvailableNow`` for drain-the-backlog, processingTime for
  continuous. Exactly-once per file comes from the checkpoint instead
  of the manifest. (OSS file source polls; SQS-push is a cloud-trigger
  optimization with identical semantics.)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..plans.catalog import ManagedTable
from .copy_into import CopyManifest, copy_into


class Pipe:
    def __init__(
        self,
        spark: SparkSession,
        name: str,
        landing_dir: str,
        stage_table: ManagedTable,
        schema: T.StructType,
        file_format=None,
    ):
        from .file_format import CSV_FORMAT

        self.spark = spark
        self.name = name
        self.landing_dir = landing_dir
        self.stage_table = stage_table
        self.schema = schema
        self.file_format = file_format or CSV_FORMAT
        self.paused = False
        self.manifest = CopyManifest(f"{stage_table.path}.__copy_manifest.json")

    # -- batch mode --------------------------------------------------------
    def refresh(self) -> int:
        """Poll landing dir; load new files into the stage table.
        Returns number of files loaded (0 while paused)."""
        if self.paused:
            return 0
        df, new_files = copy_into(
            self.spark, self.landing_dir, self.schema, self.manifest,
            file_format=self.file_format,
        )
        if df is None:
            return 0
        self.spark.sparkContext.setJobDescription(f"pipe {self.name} ingest")
        try:
            self.stage_table.append(df, action="INSERT")
        finally:
            self.spark.sparkContext.setJobDescription(None)
        self.manifest.mark(new_files)
        return len(new_files)

    # -- S4 lifecycle ------------------------------------------------------
    def pause(self) -> None:
        """alter pipe ... set pipe_execution_paused = true (customer-...sql:68)."""
        self.paused = True

    def resume(self) -> None:
        """system$pipe_force_resume (customer-...sql:179)."""
        self.paused = False

    def status(self) -> dict:
        """system$pipe_status (customer-...sql:209)."""
        return {
            "name": self.name,
            "executionState": "PAUSED" if self.paused else "RUNNING",
            "pendingFileCount": len(
                set(os.listdir(self.landing_dir)) - self.manifest.loaded()
            )
            if os.path.isdir(self.landing_dir)
            else 0,
        }

    # -- streaming mode ----------------------------------------------------
    def start_stream(
        self,
        checkpoint_dir: str,
        available_now: bool = True,
        processing_time: str | None = None,
        on_batch=None,
    ):
        """Structured Streaming variant: file source -> foreachBatch
        append to the stage table. Checkpoint gives exactly-once per
        file across restarts (the pipe's COPY guarantee).

        ``processing_time`` (e.g. ``"60 seconds"``) is the continuous
        analog of the reference root task's ``schedule = '1 minute'``
        (customer-...sql:64); ``on_batch`` runs after each stage append
        — the hook the pipeline uses to run its task chain per
        micro-batch (T5: the batch is stable by construction, so the
        pause/resume bracket is the micro-batch boundary itself).
        """
        reader = self.file_format.read_stream(
            self.spark, self.landing_dir, self.schema
        )

        def sink(batch_df, batch_id: int) -> None:
            self.stage_table.append(batch_df, action="INSERT")
            if on_batch is not None:
                on_batch()

        writer = reader.writeStream.foreachBatch(sink).option(
            "checkpointLocation", checkpoint_dir
        )
        if processing_time is not None:
            writer = writer.trigger(processingTime=processing_time)
        elif available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

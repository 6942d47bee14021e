"""S2: ``COPY INTO`` — idempotent file-level load from a landing
directory ("external stage") into a stage table.

Snowflake's COPY (the pipe body, reference customer-...sql:54-56) loads
each file exactly once via its load-history manifest. Batch analog: diff
the directory listing against a manifest of already-loaded files, read
only the new ones, append. (The Structured Streaming path in
sources.pipe gets the same guarantee from its checkpoint.)

Scale: the manifest keys on file *names* (object-store listing), never
file contents; the read is one ``spark.read.csv`` over just the new
files, so load cost tracks the delta, not the stage history.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .csv_format import CSV_OPTIONS


def list_stage(landing_dir: str) -> list[str]:
    """S6 ``list @landing`` (customer-...sql:204): stage file listing."""
    if not os.path.isdir(landing_dir):
        return []
    return sorted(
        f for f in os.listdir(landing_dir)
        if not f.startswith(".") and os.path.isfile(os.path.join(landing_dir, f))
    )


class CopyManifest:
    def __init__(self, path: str):
        self.path = path

    def loaded(self) -> set[str]:
        if not os.path.exists(self.path):
            return set()
        with open(self.path) as f:
            return set(json.load(f))

    def mark(self, files: set[str]) -> None:
        merged = sorted(self.loaded() | files)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(merged, f)
        os.replace(tmp, self.path)


def _starts_blank(path: str) -> bool:
    """True when the file's first physical line is empty. Snowflake's
    ``skip_header=1`` skips exactly one physical line; Spark's CSV
    reader drops blank lines BEFORE header handling, so a blank-first-
    line file (customer_delta_1.csv) would lose a data row to header
    skipping. Peeking 2 bytes per new file is O(files) driver work —
    same cost class as the directory listing itself."""
    with open(path, "rb") as f:
        head = f.read(2)
    return head[:1] in (b"\n", b"\r")


def copy_into(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    manifest: CopyManifest,
    file_format=None,
) -> tuple[DataFrame | None, set[str]]:
    """Read files not yet in the manifest; returns (df, new_files).
    Caller appends df to the stage table, then ``manifest.mark`` —
    write-then-mark, so a crash re-loads (dedupable) rather than
    silently skipping.

    ``file_format`` is a named format (sources.file_format); default is
    the reference's CSV format. skip_header=1 fidelity (CSV only):
    normal files read with header=true (skip 1 line, unvalidated);
    blank-first-line files read with header=false — the CSV reader
    drops the blank line itself, so exactly one physical line is
    skipped either way, matching Snowflake.
    """
    from .file_format import CSV_FORMAT, FileFormat

    fmt = file_format or CSV_FORMAT
    new_files = set(list_stage(landing_dir)) - manifest.loaded()
    if not new_files:
        return None, set()
    paths = [os.path.join(landing_dir, f) for f in sorted(new_files)]
    if fmt.fmt != "csv":
        return fmt.read(spark, paths, schema), new_files
    with_header = [p for p in paths if not _starts_blank(p)]
    headerless = [p for p in paths if _starts_blank(p)]
    parts = []
    if with_header:
        parts.append(fmt.read(spark, with_header, schema))
    if headerless:
        headerless_fmt = FileFormat("csv", dict(fmt.options, header="false"))
        parts.append(headerless_fmt.read(spark, headerless, schema))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df, new_files

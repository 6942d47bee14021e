"""Session-scoped scratch directories for operators that need real
files on disk (streaming sources/checkpoints, COPY INTO landing dirs,
schema-evolution table roots, clone roots).

Several registered queries return DataFrames that LAZILY re-read the
scratch location (e.g. the parquet a foreachBatch sink wrote), so the
directory cannot be removed when the builder returns — the driver may
collect the result much later, possibly several times. Instead every
scratch dir is created under ONE per-process root that is reaped by
``atexit`` when the interpreter exits, so repeated driver/bench runs
never accumulate disk in /tmp (each process cleans up its own root on
exit; a crashed process leaves at most one root, reused prefixes make
them easy to spot).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def _session_root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="etl_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh empty directory that lives until process exit."""
    return tempfile.mkdtemp(prefix=prefix, dir=_session_root())

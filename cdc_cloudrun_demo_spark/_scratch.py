"""Bounded scratch directories for operators that materialize local
inputs (embedded-JDBC databases, file-stream logs, evolving parquet
segments).

``tempfile.mkdtemp`` alone leaks one directory per invocation across a
long session (bench loops, parity sweeps — round-3 advice). This helper
keeps AT MOST the previous directory per prefix (returned DataFrames are
lazy, so the directory backing the last call's result must survive until
the next call) and removes everything at interpreter exit.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_live: dict[str, list[str]] = {}


def scratch_dir(prefix: str) -> str:
    """A fresh temp directory; directories from calls-before-last with
    the same prefix are removed."""
    dirs = _live.setdefault(prefix, [])
    while len(dirs) > 1:
        shutil.rmtree(dirs.pop(0), ignore_errors=True)
    d = tempfile.mkdtemp(prefix=prefix)
    dirs.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    for dirs in _live.values():
        while dirs:
            shutil.rmtree(dirs.pop(), ignore_errors=True)

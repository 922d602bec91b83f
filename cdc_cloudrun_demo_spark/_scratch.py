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
_roots: dict[str, str] = {}


def scratch_dir(prefix: str) -> str:
    """A fresh temp directory; directories from calls-before-last with
    the same prefix are removed."""
    dirs = _live.setdefault(prefix, [])
    while len(dirs) > 1:
        shutil.rmtree(dirs.pop(0), ignore_errors=True)
    d = tempfile.mkdtemp(prefix=prefix)
    dirs.append(d)
    return d


def scratch_root(prefix: str) -> str:
    """ONE long-lived temp directory per prefix, created on first use
    and removed only at interpreter exit — for memoized on-disk index
    artifacts whose lifetime is tied to a CACHE ENTRY, not to the
    call-before-last (`scratch_dir`'s keep-two policy would delete a
    still-cached index as soon as two newer builds landed under the
    same prefix — round-7 advice). Callers own per-key subdirectories
    under the root and delete them when evicting the cache entry."""
    d = _roots.get(prefix)
    if d is None:
        d = tempfile.mkdtemp(prefix=prefix)
        _roots[prefix] = d
    return d


@atexit.register
def _cleanup() -> None:
    for dirs in _live.values():
        while dirs:
            shutil.rmtree(dirs.pop(), ignore_errors=True)
    while _roots:
        shutil.rmtree(_roots.popitem()[1], ignore_errors=True)

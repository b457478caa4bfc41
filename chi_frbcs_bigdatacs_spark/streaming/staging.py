"""Staged stream sources: testdata parquet copied/split into temp
source dirs that readStream can replay.

Staging is memoized per (kind, sf_dir) — the correctness sweep and
bench run several streaming queries over the same input, and staging
the source once instead of per-query removes both the repeated copy
cost and the /tmp leak (every dir is removed at interpreter exit).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from collections.abc import Callable

_STAGED: dict[tuple[str, str], str] = {}


def staged_dir(kind: str, sf_dir: str, build: Callable[[str], None]) -> str:
    """Return the staged source dir for (kind, sf_dir), building it on
    first use via `build(target_dir)`."""
    key = (kind, sf_dir)
    if key not in _STAGED:
        d = tempfile.mkdtemp(prefix=f"chi_stage_{kind}_")
        build(d)
        _STAGED[key] = d
    return _STAGED[key]


@atexit.register
def _cleanup() -> None:
    for d in _STAGED.values():
        shutil.rmtree(d, ignore_errors=True)
    _STAGED.clear()

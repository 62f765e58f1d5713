"""Bounded scratch directories for queries that materialize intermediate
state (snapshot tables, streaming file sinks, checkpoints).

A per-invocation ``tempfile.mkdtemp`` leaks a full table copy under /tmp on
every bench/parity run (round-6 advice). Queries instead claim a STABLE
per-name directory and wipe it at claim time, so repeated invocations
*reuse* rather than accumulate: at most one live copy exists per query
name, and the previous invocation's files survive exactly until the next
claim — long enough for any still-lazy DataFrame returned by the previous
invocation to have been consumed (the harness always materializes one
query's result before re-invoking it).

Known limit (accepted): the per-name path is shared ACROSS processes, so
two concurrent harness processes invoking the same query race the wipe.
Every harness here (driver, bench, parity, pytest) is single-process per
query; per-process roots would reintroduce the unbounded-leak problem
this module exists to fix (one live dir per dead pid instead of one per
name). If cross-process concurrency ever matters, add a per-name lock
file, not a pid suffix.
"""

from __future__ import annotations

import os
import shutil

_ROOT = os.path.join(
    os.environ.get("SPARK_GRAFT_WORK_ROOT", "/tmp"), "spark_engine_work"
)


def fresh_work_dir(name: str) -> str:
    """Claim the stable scratch dir for ``name``: wipe whatever the last
    invocation left there and return the empty directory."""
    d = os.path.join(_ROOT, name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d

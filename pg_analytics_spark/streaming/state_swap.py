"""Crash-safe snapshot state for the foreachBatch ingest modules
(moments/sketch/bloom).

The previous layout committed a snapshot with TWO renames
(``moments`` -> ``_old-*`` then ``_tmp-*`` -> ``moments``); a crash
between them left NO current state, so the replayed batch would merge
into an empty relation and silently drop every prior batch's
contribution.  This module replaces that with a single-rename commit:

* each snapshot is written to a uniquely-named directory
  ``<name>-<uuid>`` (never renamed, never reused);
* the commit point is ONE atomic ``os.replace`` of a small pointer
  file ``<name>.CURRENT`` whose content is the snapshot dir name.

A crash at any instant therefore leaves either the old pointer (old
state intact; the uncommitted micro-batch replays from the streaming
checkpoint) or the new pointer (batch fully applied) — never an empty
state.  Orphaned snapshot dirs (crashes, superseded snapshots, and
the legacy ``<name>/`` layout, which ``current_snapshot`` still reads
for state dirs written by older versions) are garbage-collected on
the next successful commit, after the pointer swap.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame


def current_snapshot(state_dir: str, name: str) -> str | None:
    """Path of the committed snapshot dir for ``name``, or None."""
    ptr = os.path.join(state_dir, f"{name}.CURRENT")
    if os.path.isfile(ptr):
        with open(ptr, encoding="utf-8") as fh:
            snap = fh.read().strip()
        cand = os.path.join(state_dir, snap)
        if snap and os.path.isdir(cand):
            return cand
    legacy = os.path.join(state_dir, name)
    if os.path.isdir(legacy):
        return legacy
    return None


def commit_state(df: DataFrame, state_dir: str, name: str) -> None:
    """Write ``df`` as the new committed state for ``name``.

    ``df`` MAY be a lazy plan derived from the current state: the
    write lands in a NEW uniquely-named snapshot dir, so the write job
    reads the old snapshot while it still exists; the pointer swaps
    only after the write succeeds, and the superseded dir is GC'd
    last.  A crash at any instant leaves a consistent pointer.
    """
    os.makedirs(state_dir, exist_ok=True)
    snap = f"{name}-{uuid.uuid4().hex}"
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(state_dir, snap)
    )
    tmp = os.path.join(state_dir, f"_ptr-{uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(snap)
        fh.flush()
        os.fsync(fh.fileno())
    # the ONE atomic commit point
    os.replace(tmp, os.path.join(state_dir, f"{name}.CURRENT"))
    _gc(state_dir, name, keep=snap)


def _gc(state_dir: str, name: str, keep: str) -> None:
    """Best-effort removal of everything superseded by ``keep``."""
    for entry in os.listdir(state_dir):
        if entry == keep:
            continue
        path = os.path.join(state_dir, entry)
        stale_dir = (
            entry == name  # legacy two-rename layout
            or entry.startswith(f"{name}-")
            or entry.startswith("_tmp-")
            or entry.startswith("_old-")
        )
        if os.path.isdir(path) and stale_dir:
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.isfile(path) and entry.startswith("_ptr-"):
            try:
                os.remove(path)
            except OSError:
                pass

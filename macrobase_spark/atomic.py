"""Crash-safe local-filesystem primitives shared by the index/ANN/dedup
maintenance paths: atomic JSON writes and a recoverable directory
rename-swap for compaction-style rewrites.

Swap protocol (compact a dataset dir `path` in place):
  1. write the replacement to `path + "_compact"` (Spark leaves _SUCCESS)
  2. `swap_in(path, tmp)`: rename path → path_old, tmp → path, rm path_old
  3. any entry point calls `recover_swap(path)` first — it finishes a swap
     that crashed between the renames (promote a COMPLETE staging dir,
     else roll back from _old) and clears stale leftovers that would
     otherwise wedge the next attempt.

On a shared object store these become commit-marker renames; the protocol
shape (stage → atomic promote → recover-on-open) is the same.
"""

from __future__ import annotations

import json
import os
import shutil


def atomic_json_write(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)  # atomic: a crash never leaves half a meta file


def recover_swap(path: str) -> None:
    """Recover a compaction rename swap around `path` (see module doc)."""
    old, tmp = path + "_old", path + "_compact"
    if not os.path.exists(path):
        if os.path.isdir(tmp) and os.path.exists(
                os.path.join(tmp, "_SUCCESS")):
            os.rename(tmp, path)      # tmp was complete: finish the swap
        elif os.path.isdir(old):
            os.rename(old, path)      # roll back to the pre-compact data
    for leftover in (old, tmp):
        if os.path.exists(path) and os.path.isdir(leftover):
            shutil.rmtree(leftover)


def swap_in(path: str, tmp: str) -> None:
    """Promote the staged rewrite at `tmp` over `path` (recoverable via
    recover_swap if a crash lands between the renames)."""
    old = path + "_old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)

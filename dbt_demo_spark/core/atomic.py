"""ONE implementation of the staged-swap exactly-once commit protocol
(r14 self-review: the two-rename swap, the __old crash recovery, and the
batch-id bookkeeping were hand-rolled three times — operators/bm25.py,
operators/boilerplate.py, core/runner.py's aggregate mode — and had
already begun to diverge; for crash-window code, a fix applied to two of
three copies IS the bug).

The protocol (shared by the BM25 stats index, the line census, and the
aggregate-mart exactly-once mode):

  * the ingested-batch-id set rides INSIDE the directory being swapped,
    so state and bookkeeping commit together;
  * commit = two renames: live -> live+'__old', stage -> live, then the
    backup is dropped.  A reader never sees partial state;
  * crash windows: BEFORE the first rename — live intact, stage stale
    (clobbered by the next attempt; its ids were never committed, so a
    replay re-merges identically).  BETWEEN the renames — no live dir,
    full prior state at __old: ``restore_crashed_backup`` puts it back
    and the replay merges against it.  AFTER the second rename — live
    is committed (replay finds its id and no-ops); a leftover __old is
    cleared by the next commit's rmtree.  No single crash point loses
    both directories.
"""

from __future__ import annotations

import json
import os
import shutil


def read_batch_ids(book_path: str) -> set:
    """Ingested batch ids from a bookkeeping JSON (absent file = empty —
    the pre-first-commit state)."""
    if not os.path.exists(book_path):
        return set()
    with open(book_path) as fh:
        return set(json.load(fh))


def write_batch_ids(book_path: str, ids: set) -> None:
    """Write the id set (sorted, so the file is deterministic).  Writing
    an EMPTY set is the caller's choice: the index builders skip it
    (absent file == nothing ingested, keeps non-streaming builds free
    of bookkeeping), the aggregate mode always has >= 1 id."""
    with open(book_path, "w") as fh:
        json.dump(sorted(ids), fh)


def swap_commit(live: str, stage: str) -> None:
    """The two-rename commit.  ``stage`` must be a complete replacement
    directory (state + bookkeeping already inside)."""
    backup = live + "__old"
    shutil.rmtree(backup, ignore_errors=True)
    os.replace(live, backup)
    os.replace(stage, live)
    shutil.rmtree(backup, ignore_errors=True)


def restore_crashed_backup(live: str, complete) -> bool:
    """Recover the between-renames crash window: if ``live`` is missing
    and ``live + '__old'`` passes the caller's ``complete(path)`` probe
    (e.g. its data subdirectory exists), restore it as live and return
    True.  The caller then proceeds exactly as if the crash never
    happened — the stranded stage's merge was never committed, so
    re-merging the replayed batch is exact."""
    backup = live + "__old"
    if not os.path.isdir(live) and complete(backup):
        shutil.rmtree(live, ignore_errors=True)
        os.replace(backup, live)
        return True
    return False

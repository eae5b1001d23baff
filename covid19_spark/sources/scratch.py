"""Concurrency-safe scratch-directory discipline for /tmp-cached builds.

Two distinct race classes exist for the persisted-index family
(`sources/index.py`, `operators/ann_index.py`) and the replay queries
that rebuild scratch state per run (`q_bm25_incremental_index`,
`q_ivm_stream_replay`):

1. **Per-run replay state** must start clean AND not collide with another
   session replaying the same query concurrently → ``pid_scratch_path``
   gives each process its own directory (same process re-runs reuse and
   rmtree it, exactly as before).
2. **Shared build-once caches** (``ensure_inverted_index`` /
   ``ensure_ivfpq_index``) can race a cold build: two sessions both miss,
   both write Spark datasets directly into the cache path, and a reader
   can observe a half-overwritten mix → build into a unique scratch dir,
   then ``publish_dir`` swaps it in with directory renames (atomic on one
   filesystem).  A losing concurrent builder discards its scratch — the
   winner's build is equally fresh by construction (same corpus
   fingerprint).

At cluster scale the equivalent seam is a transactional table format's
commit protocol (Delta/Iceberg snapshot swap); parquet-on-local-fs gets
the rename-based miniature.  VERDICT r12 task #4.
"""

from __future__ import annotations

import os
import shutil
import uuid


def pid_scratch_path(tag: str) -> str:
    """A /tmp scratch directory unique to this PROCESS: concurrent
    sessions never collide, while re-runs inside one process reuse (and
    may safely rmtree) the same path."""
    return f"/tmp/covid19_spark_{tag}_{os.getpid()}"


def build_scratch_path(path: str) -> str:
    """A unique sibling scratch dir for a build that will be published at
    ``path`` — sibling (same filesystem) so the publish rename is atomic."""
    return f"{path}__build_{os.getpid()}_{uuid.uuid4().hex[:8]}"


def publish_if_absent(tmp: str, path: str) -> bool:
    """Publish ``tmp`` at ``path`` iff nothing is there — ONE rename,
    atomic on POSIX.  Returns False when ``path`` is occupied (a
    concurrent builder won, or a stale build sits there): the caller
    re-probes freshness and either discards its scratch (concurrent-fresh
    — NEVER delete files a winner's returned reader may still hold) or
    calls ``replace_dir`` (genuinely stale)."""
    try:
        os.rename(tmp, path)
        return True
    except OSError:
        return False


def replace_dir(tmp: str, path: str) -> None:
    """Swap ``tmp`` in over an existing STALE directory at ``path``:
    rename the stale build aside, rename ours in, delete the stale one.
    Stale replacement is inherently disruptive to a reader still holding
    the old files — that is the fingerprint-invalidation contract, not a
    race (the concurrent-fresh case goes through ``publish_if_absent``).
    If a concurrent replacer wins either rename, our build is discarded.
    Readers can observe a brief path-absent window between the renames;
    callers retry their open (see ``ensure_inverted_index``)."""
    old = f"{path}__old_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    try:
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

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

PID-tagged dirs from DEAD processes (kill -9 mid-build, crashed bench
invocations) are nobody's to reuse and were historically never reclaimed
(ADVICE r13): ``reap_stale_scratch`` sweeps siblings whose embedded PID no
longer exists, and runs opportunistically (at most once per process) from
``pid_scratch_path`` / ``build_scratch_path``.

At cluster scale the equivalent seam is a transactional table format's
commit protocol (Delta/Iceberg snapshot swap) plus its orphan-file vacuum;
parquet-on-local-fs gets the rename-based miniature.  VERDICT r12 task #4,
r13 task #3.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

_SCRATCH_ROOT = "/tmp"
# every transient dir this module mints embeds the creating PID in one of
# these shapes; anything else under /tmp is not ours to touch
_STALE_PATTERNS = (
    re.compile(r"^covid19_spark_.+_(\d+)$"),          # pid_scratch_path
    re.compile(r".+__build_(\d+)_[0-9a-f]{8}$"),      # build_scratch_path
    re.compile(r".+__old_(\d+)_[0-9a-f]{8}$"),        # replace_dir aside
)
_reaped_once = False


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    except OSError:
        return True  # be conservative: never reap on an ambiguous probe
    return True


def reap_stale_scratch(root: str = _SCRATCH_ROOT) -> list[str]:
    """Best-effort sweep of this module's PID-tagged scratch dirs whose
    creating process is dead (``os.kill(pid, 0)`` probe).  Live-PID dirs
    and anything not matching our naming are never touched.  Returns the
    paths removed (for tests/observability); all errors are swallowed —
    reaping is hygiene, never a correctness dependency."""
    removed: list[str] = []
    try:
        entries = os.listdir(root)
    except OSError:
        return removed
    me = os.getpid()
    for name in entries:
        for pat in _STALE_PATTERNS:
            m = pat.match(name)
            if not m:
                continue
            pid = int(m.group(1))
            if pid != me and not _pid_alive(pid):
                path = os.path.join(root, name)
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
            break
    return removed


def _reap_opportunistically() -> None:
    # once per process, on first scratch-path mint — keeps long-lived
    # sandboxes bounded without a scheduler (VERDICT r13 task #3)
    global _reaped_once
    if not _reaped_once:
        _reaped_once = True
        reap_stale_scratch()


def pid_scratch_path(tag: str) -> str:
    """A /tmp scratch directory unique to this PROCESS: concurrent
    sessions never collide, while re-runs inside one process reuse (and
    may safely rmtree) the same path."""
    _reap_opportunistically()
    return f"/tmp/covid19_spark_{tag}_{os.getpid()}"


def build_scratch_path(path: str) -> str:
    """A unique sibling scratch dir for a build that will be published at
    ``path`` — sibling (same filesystem) so the publish rename is atomic."""
    _reap_opportunistically()
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
    callers retry their open (see ``ensure_inverted_index``).

    Failed-publish degradation (ADVICE r13): if OUR second rename fails
    after the stale dir was moved aside and nothing else filled ``path``,
    restore the aside copy — a failed publish then degrades to the
    stale-but-servable cache instead of leaving the path absent (which
    made the in-flight ``ensure_*`` call fail after its retries)."""
    old = f"{path}__old_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    moved_aside = False
    try:
        if os.path.isdir(path):
            os.rename(path, old)
            moved_aside = True
        os.rename(tmp, path)
    except OSError:
        if moved_aside and not os.path.exists(path) and os.path.isdir(old):
            try:
                os.rename(old, path)  # restore: stale beats absent
            except OSError:
                pass  # a concurrent publisher filled path between the checks
        shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

"""Process-level cache of persisted-store handles (guide §1.2/§5: cut
fixed per-query driver work).

Every index-served query reopens its persisted store (inverted index,
fielded index, IVF-PQ index) via ``spark.read.parquet`` — a JVM
round-trip + file listing + footer/schema read per dataset, ~0.1 s each
on local[32], repeated for every serve of every query in a bench sweep.
The handle (a LAZY DataFrame plus the store's contract-small metadata
row) is pure logical plan: caching it computes nothing and pins no data
— every action still scans the parquet files — so this is plan re-use,
not result caching (the banned class), the same memo class as
``index._BUCKET_CACHE``.

Safety contract:
- Keyed by (applicationId, path): a different SparkSession never sees
  another session's handle.
- Validated per lookup by a ``stamp`` the caller derives from the
  store's metadata files (size + mtime_ns): rebuilds and appends rewrite
  ``scalars``/``meta``, so they miss the cache automatically — even when
  another process performed them.
- Mutators that do NOT touch the metadata dataset (compaction rewrites
  postings/codes fragments in place) must call :func:`invalidate_store`;
  all in-repo writers do.  Cross-process compaction during another
  process's serve is excluded by the stores' existing maintenance-window
  contract ("run between batches, not concurrent with an append or
  serve").
"""

from __future__ import annotations

import glob
import os
from typing import Any

_CACHE: dict[tuple[str, str], tuple[tuple, Any]] = {}


def meta_stamp(*dirpaths: str) -> tuple:
    """Validation stamp for a store: (path, size, mtime_ns) of every
    parquet part-file in the given metadata dataset dirs.  Missing dirs
    stamp as empty — the caller's freshness check already rejects those."""
    stamp = []
    for d in dirpaths:
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            try:
                st = os.stat(f)
            except OSError:
                continue
            stamp.append((f, st.st_size, st.st_mtime_ns))
    return tuple(stamp)


def get_store(spark, path: str, stamp: tuple):
    """Cached handle for ``path`` in this session, or None on miss/stale."""
    key = (spark.sparkContext.applicationId, path)
    hit = _CACHE.get(key)
    if hit is not None and hit[0] == stamp:
        return hit[1]
    return None


def put_store(spark, path: str, stamp: tuple, obj) -> None:
    key = (spark.sparkContext.applicationId, path)
    # evict entries from dead sessions so the memo stays bounded by the
    # live session's store set
    for k in [k for k in _CACHE if k[0] != key[0]]:
        del _CACHE[k]
    _CACHE[key] = (stamp, obj)


def invalidate_store(path: str) -> None:
    """Drop every session's handle for ``path`` — called by writers whose
    rewrite does not touch the metadata dataset (compaction), and
    defensively by append/replace paths."""
    for k in [k for k in _CACHE if k[1] == path]:
        del _CACHE[k]

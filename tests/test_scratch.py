"""Scratch-dir lifecycle (sources/scratch.py): stale-PID reaping and the
replace_dir failed-publish restore (VERDICT r13 task #3, ADVICE r13).

No Spark needed — this is pure directory-protocol logic."""

import os
import subprocess
import sys

from covid19_spark.sources import scratch


def _dead_pid() -> int:
    # a real PID that existed and is now gone: spawn a no-op child and wait
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    return child.pid


def test_reap_removes_dead_pid_dirs_only(tmp_path):
    root = str(tmp_path)
    dead = _dead_pid()
    live = os.getpid()
    dirs = {
        # all three minted shapes, dead owner → reaped
        f"covid19_spark_ivm_replay_{dead}": True,
        f"idx__build_{dead}_0123abcd": True,
        f"idx__old_{dead}_89efcdab": True,
        # live owner → kept
        f"covid19_spark_ivm_replay_{live}": False,
        f"idx__build_{live}_0123abcd": False,
        # foreign naming → never touched even with a dead-looking suffix
        f"somebody_elses_dir_{dead}": False,
        "covid19_spark_notpid_tag": False,
    }
    for name in dirs:
        os.makedirs(os.path.join(root, name))
        with open(os.path.join(root, name, "marker"), "w") as f:
            f.write("x")
    removed = scratch.reap_stale_scratch(root=root)
    assert sorted(os.path.basename(p) for p in removed) == sorted(
        n for n, reaped in dirs.items() if reaped
    )
    for name, reaped in dirs.items():
        assert os.path.isdir(os.path.join(root, name)) != reaped, name


def test_reap_survives_missing_root(tmp_path):
    assert scratch.reap_stale_scratch(root=str(tmp_path / "nope")) == []


def test_killed_builder_is_reaped_and_rebuild_succeeds(tmp_path):
    """The judge's two-session scenario: a builder dies mid-build (its
    __build scratch dir left behind), a new session reaps it and a fresh
    publish lands cleanly at the cache path."""
    root = str(tmp_path)
    path = os.path.join(root, "idx")
    # session 1: child process mints a build scratch dir and dies (kill -9
    # equivalence: the dir persists, the PID doesn't)
    child = subprocess.run(
        [
            sys.executable,
            "-c",
            "import os,sys; d=sys.argv[1]+'__build_%d_deadbeef'%os.getpid();"
            "os.makedirs(d); open(d+'/partial','w').write('half')",
            path,
        ],
        check=True,
    )
    leftovers = [n for n in os.listdir(root) if "__build_" in n]
    assert len(leftovers) == 1
    # session 2: reap, then build+publish fresh
    removed = scratch.reap_stale_scratch(root=root)
    assert len(removed) == 1 and not os.path.exists(removed[0])
    tmp = scratch.build_scratch_path(path)
    os.makedirs(tmp)
    with open(os.path.join(tmp, "data"), "w") as f:
        f.write("fresh")
    assert scratch.publish_if_absent(tmp, path)
    with open(os.path.join(path, "data")) as f:
        assert f.read() == "fresh"
    assert child.returncode == 0


def test_replace_dir_swaps_and_cleans(tmp_path):
    path = str(tmp_path / "cache")
    os.makedirs(path)
    open(os.path.join(path, "v"), "w").write("stale")
    tmp = scratch.build_scratch_path(path)
    os.makedirs(tmp)
    open(os.path.join(tmp, "v"), "w").write("fresh")
    scratch.replace_dir(tmp, path)
    assert open(os.path.join(path, "v")).read() == "fresh"
    assert not os.path.exists(tmp)
    assert [n for n in os.listdir(str(tmp_path)) if "__old_" in n] == []


def test_replace_dir_failed_publish_restores_stale(tmp_path, monkeypatch):
    """ADVICE r13: if the second rename (tmp → path) fails after the stale
    dir was moved aside, the aside copy must come back — a failed publish
    degrades to stale-but-servable, never to an absent cache path."""
    path = str(tmp_path / "cache")
    os.makedirs(path)
    open(os.path.join(path, "v"), "w").write("stale")
    tmp = scratch.build_scratch_path(path)
    os.makedirs(tmp)
    open(os.path.join(tmp, "v"), "w").write("fresh")

    real_rename = os.rename

    def failing_rename(src, dst):
        if src == tmp:
            raise OSError("simulated publish failure")
        return real_rename(src, dst)

    monkeypatch.setattr(scratch.os, "rename", failing_rename)
    scratch.replace_dir(tmp, path)
    # stale content restored at path; scratch and aside dirs both gone
    assert open(os.path.join(path, "v")).read() == "stale"
    assert not os.path.exists(tmp)
    assert [n for n in os.listdir(str(tmp_path)) if "__old_" in n] == []

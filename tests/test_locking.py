"""io/locking.py — the single check-stage-publish seam (r03 VERDICT #8).

Pure-python tests (no SparkSession): crash safety, stale-partial recovery,
and a real multi-process race on the flock.
"""

from __future__ import annotations

import multiprocessing as mp
import os

import pytest

from wikidataquality_spark.io.locking import publish_dir, publish_file


def test_publish_file_writes_once_and_trusts_complete(tmp_path):
    target = str(tmp_path / "data.bin")
    calls = []

    def write(staging):
        calls.append(staging)
        with open(staging, "wb") as f:
            f.write(b"payload")

    assert publish_file(target, write) == target
    assert open(target, "rb").read() == b"payload"
    publish_file(target, write)  # second call: trusted, no rewrite
    assert len(calls) == 1


def test_publish_file_crash_leaves_no_partial(tmp_path):
    target = str(tmp_path / "data.bin")

    def crash(staging):
        with open(staging, "wb") as f:
            f.write(b"half")
        raise RuntimeError("writer died")

    with pytest.raises(RuntimeError):
        publish_file(target, crash)
    # neither a torn target nor a staging orphan survives
    assert not os.path.exists(target)
    assert [p for p in os.listdir(tmp_path) if "staging" in p] == []
    # and a later writer succeeds cleanly
    publish_file(target, lambda s: open(s, "wb").write(b"good"))
    assert open(target, "rb").read() == b"good"


def test_publish_dir_replaces_stale_partial(tmp_path):
    target = str(tmp_path / "table")
    # a crashed writer left a directory WITHOUT _SUCCESS — must be replaced
    os.makedirs(target)
    open(os.path.join(target, "part-0"), "w").write("torn")

    def write(staging):
        os.makedirs(staging)
        open(os.path.join(staging, "part-0"), "w").write("fresh")
        open(os.path.join(staging, "_SUCCESS"), "w").close()

    publish_dir(target, write)
    assert open(os.path.join(target, "part-0")).read() == "fresh"
    assert os.path.exists(os.path.join(target, "_SUCCESS"))


def _race_worker(target: str, tag: str, q) -> None:
    import time

    def write(staging):
        with open(staging, "w") as f:
            f.write(tag)
        time.sleep(0.05)  # widen the window: a lockless impl would interleave

    try:
        publish_file(target, write)
        q.put(("ok", tag, open(target).read()))
    except Exception as e:  # pragma: no cover - failure reporting
        q.put(("err", tag, repr(e)))


def test_user_cache_root_creates_0700_and_rejects_squats(tmp_path, monkeypatch):
    """The one cache-root constructor (r04 review): mode 0o700 on creation,
    and a pre-existing world-writable or symlinked root fails loudly instead
    of silently serving attacker-controlled cache contents."""
    import stat
    import tempfile

    from wikidataquality_spark.io.locking import user_cache_root

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))

    root = user_cache_root("wdq_test_cache")
    st = os.stat(root)
    assert stat.S_IMODE(st.st_mode) == 0o700
    assert user_cache_root("wdq_test_cache") == root  # idempotent

    # squat 1: world-writable pre-existing dir
    os.chmod(root, 0o777)
    with pytest.raises(PermissionError, match="group/other-writable"):
        user_cache_root("wdq_test_cache")
    os.chmod(root, 0o700)

    # squat 2: symlink at the expected path
    real = tmp_path / "elsewhere"
    real.mkdir()
    link = tmp_path / f"wdq_link_cache_{os.getuid()}"
    link.symlink_to(real)
    with pytest.raises(PermissionError, match="not a directory"):
        user_cache_root("wdq_link_cache")


def test_publish_file_multiprocess_race(tmp_path):
    """N processes race the same target: exactly one writer wins, every
    process sees a COMPLETE file (single-writer content, never empty or
    torn), and no staging orphans remain."""
    target = str(tmp_path / "race.bin")
    q = mp.Queue()
    procs = [
        mp.Process(target=_race_worker, args=(target, f"writer-{i}", q))
        for i in range(6)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(30)
    results = [q.get(timeout=5) for _ in procs]
    assert all(r[0] == "ok" for r in results), results
    contents = {r[2] for r in results}
    assert len(contents) == 1  # everyone read the single published copy
    assert contents.pop().startswith("writer-")
    assert [p for p in os.listdir(tmp_path) if "staging" in p] == []

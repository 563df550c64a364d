"""Chaos test for the resumable sweep runner (round-7 verdict item 6):
SIGKILL the parent while a child query runs, then resume — the ledger
must skip banked passes, retry the interrupted name, and converge to
one pass row per query, identical to an uninterrupted sweep.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "scripts", "sweep_contract.py")
SF = "/root/testdata/sf0.001"
NAMES = ["tile_assign", "lang_histogram"]


def _ledger_rows(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_sweep_resumes_after_parent_kill(tmp_path):
    ledger = str(tmp_path / "ledger.jsonl")
    args = [sys.executable, RUNNER, "--sf-dir", SF, "--ledger", ledger,
            "--only", ",".join(NAMES), "--timeout", "600"]

    # phase 1: kill the parent (and its child process group) as soon as
    # the FIRST row lands in the ledger — i.e. mid-second-query
    p = subprocess.Popen(args, cwd=REPO, start_new_session=True,
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.time() + 300
    while time.time() < deadline and len(_ledger_rows(ledger)) < 1:
        if p.poll() is not None:
            break  # finished before we could kill it — resume is a no-op
        time.sleep(0.5)
    if p.poll() is None:
        os.killpg(p.pid, signal.SIGKILL)
        p.wait()

    rows1 = _ledger_rows(ledger)
    assert len(rows1) >= 1, "no row banked before the kill"
    banked = {r["name"] for r in rows1 if r["status"] == "pass"}

    # phase 2: rerun the same command; it must skip banked passes and
    # finish the rest
    out = subprocess.run(args, cwd=REPO, capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    for name in banked:
        assert f"skip {name} (ledger pass)" in out.stdout

    rows = _ledger_rows(ledger)
    passes = {}
    for r in rows:
        if r["status"] == "pass":
            passes.setdefault(r["name"], 0)
            passes[r["name"]] += 1
    assert set(passes) == set(NAMES)
    # one pass row per query — the resume never re-runs a banked pass
    assert all(v == 1 for v in passes.values()), passes


def test_sweep_parent_ledger_lock(tmp_path):
    """Two parents on one ledger duplicate minutes-scale oracle rows
    (hit live during the round-7 sf3.0 sweep: a crashed session's
    surviving parent kept appending while the resumed parent re-ran
    the same heavy rows). The second parent must refuse to start while
    the first holds the flock, and succeed after it exits — the lock
    dies with the process, so a SIGKILL'd parent never blocks resume."""
    import fcntl

    ledger = str(tmp_path / "ledger.jsonl")
    holder = open(ledger + ".lock", "w")
    fcntl.flock(holder, fcntl.LOCK_EX | fcntl.LOCK_NB)

    args = [sys.executable, RUNNER, "--sf-dir", SF, "--ledger", ledger,
            "--only", NAMES[0], "--timeout", "600"]
    out = subprocess.run(args, cwd=REPO, capture_output=True, text=True,
                         timeout=120)
    assert out.returncode == 2
    assert "another sweep parent holds" in out.stderr

    holder.close()  # releases the flock, as parent death would
    out = subprocess.run(args, cwd=REPO, capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    rows = _ledger_rows(ledger)
    assert [r["name"] for r in rows if r["status"] == "pass"] == [NAMES[0]]


def test_auto_chunks_sizing():
    """Quadratic-twin chunk sizing from corpus row count alone: names
    without a registered chunker are never chunked; <=sf1.0 volume
    (20k^2 = 400M pairs, the proven one-shot size) stays unchunked;
    sf3.0's 60k embeddings need ceil(3.6e9/4e8) = 9 slices."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import sweep_contract as sc

    assert sc.auto_chunks("minhash_dup_pairs", SF) == 1  # no chunker
    assert sc.auto_chunks("knn_embeddings_bruteforce", SF) == 1  # tiny sf

    class _Meta:
        def __init__(self, n):
            self.num_rows = n

    import pyarrow.parquet as pq
    orig = pq.read_metadata
    try:
        pq.read_metadata = lambda p: _Meta(20000)
        assert sc.auto_chunks("knn_embeddings_bruteforce", SF) == 1
        pq.read_metadata = lambda p: _Meta(60000)
        assert sc.auto_chunks("knn_embeddings_bruteforce", SF) == 9
        assert sc.auto_chunks("knn_embeddings_ivf", SF) == 9
    finally:
        pq.read_metadata = orig

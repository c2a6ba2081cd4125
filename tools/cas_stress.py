"""Multi-process stress for the versioned-layout CAS commit chain.

The chain's claim step (`catalog._claim_commit`) is pure file-system
CAS — hard-link a fully-written temp file onto `.commits/<seq>.json` —
so its contention behavior can be stressed without Spark: N OS
processes each try to append M commits, re-reading the head and
retrying on every lost race (the same loop `merge_into_versioned`
runs for disjoint-bucket merges). The invariants checked afterwards
are the protocol's whole contract:

- the chain is DENSE and LINEAR: N*M commits at seqs 0..N*M-1, no
  gaps,
- every process's every commit landed exactly once,
- each commit's recorded parent seq is strictly smaller than its own
  (writers never clobber or reorder each other).

Prints one line with the observed claim-retry rate — the number that
tells you how hot a table can get before optimistic concurrency turns
into spinning.

Usage: python tools/cas_stress.py [n_procs] [commits_per_proc]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amaxa_spark.sources.catalog import _claim_commit, _commit_chain_head


def worker(path: str, wid: int, n_commits: int, q: mp.Queue) -> None:
    retries = 0
    for i in range(n_commits):
        while True:
            head = _commit_chain_head(path)
            seq = 0 if head is None else head[0] + 1
            manifest = {
                "kind": "versioned-buckets",
                "token": f"w{wid}c{i}",
                "seq": seq,
                "parent_seq": -1 if head is None else head[0],
                "writer": wid,
                "buckets": {},
            }
            try:
                _claim_commit(path, seq, manifest)
                break
            except FileExistsError:
                retries += 1
    q.put((wid, retries))


def main() -> None:
    n_procs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    path = tempfile.mkdtemp(prefix="cas_stress_")
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=worker, args=(path, w, n_commits, q))
        for w in range(n_procs)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    wall = time.time() - t0
    dead = [p.pid for p in procs if p.exitcode != 0]
    assert not dead, f"worker process(es) died: {dead}"
    # timeout guards a worker that exited 0 without reporting (should
    # be impossible, but a hung q.get would mask the real failure)
    retries = dict(q.get(timeout=60) for _ in procs)

    cdir = os.path.join(path, ".commits")
    commits = {}
    for f in os.listdir(cdir):
        if f.endswith(".json"):
            with open(os.path.join(cdir, f)) as fh:
                commits[int(f[: -len(".json")])] = json.load(fh)
    total = n_procs * n_commits
    assert sorted(commits) == list(range(total)), "chain has gaps"
    tokens = [m["token"] for m in commits.values()]
    assert len(set(tokens)) == total, "duplicate or lost commits"
    for seq, m in commits.items():
        assert m["seq"] == seq and m["parent_seq"] < seq
    per_writer = {w: 0 for w in range(n_procs)}
    for m in commits.values():
        per_writer[m["writer"]] += 1
    assert all(v == n_commits for v in per_writer.values())
    total_retries = sum(retries.values())
    print(
        f"procs={n_procs} commits={total} wall={wall:.2f}s "
        f"retries={total_retries} retry_rate={total_retries / total:.2f} "
        f"commits_per_sec={total / wall:.0f} — chain dense+linear, "
        "all writers fully represented"
    )


if __name__ == "__main__":
    main()

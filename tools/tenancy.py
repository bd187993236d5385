"""Host-tenancy accounting for benchmark self-adjudication.

BENCH_r04.json was recorded during a neighbor-load phase and showed a
29 s time for a 1.4 s query; min-of-N inside one polluted window cannot
save the artifact.  This module measures, for every benchmark rep, how
much CPU processes OUTSIDE our own process tree consumed during the
rep — the direct signal of noisy-neighbor pollution — so the bench can
re-queue polluted reps (bounded) and flag itself when it could not get
a clean window.

The measurement is exact jiffy accounting, not loadavg guessing:
host busy jiffies (/proc/stat) minus our process tree's jiffies
(/proc/[pid]/stat utime+stime+cutime+cstime over the root's
descendants; cutime/cstime make workers that die mid-interval count
exactly once).  loadavg is also recorded per rep for the human reader,
but the adjudication signal is ext_cores.
"""

from __future__ import annotations

import os
import time

_CLK = os.sysconf("SC_CLK_TCK")


def host_busy_jiffies() -> int:
    """Total non-idle jiffies across all host CPUs (idle + iowait
    excluded) since boot."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals) - vals[3] - vals[4]


def proc_tree_jiffies(root_pid: int) -> int:
    """CPU jiffies (utime+stime+cutime+cstime) of root_pid and all its
    live descendants.  Including cutime/cstime means a child that dies
    mid-interval is counted exactly once: alive at both snapshots it
    contributes via its own utime delta; dead by the second snapshot
    its total rolled into the parent's cutime, which the first
    snapshot's walk did not yet include."""
    jif: dict[int, int] = {}
    kids: dict[int, list[int]] = {}
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit():
            continue
        try:
            with open(f"/proc/{pid_s}/stat", "rb") as f:
                data = f.read()
        except OSError:
            continue
        # comm may contain spaces/parens: parse after the LAST ')'
        rp = data.rfind(b")")
        fields = data[rp + 2:].split()
        pid = int(pid_s)
        # post-comm indices: 0=state 1=ppid 11=utime 12=stime
        # 13=cutime 14=cstime
        kids.setdefault(int(fields[1]), []).append(pid)
        jif[pid] = (int(fields[11]) + int(fields[12])
                    + int(fields[13]) + int(fields[14]))
    total = 0
    stack = [root_pid]
    seen: set[int] = set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        total += jif.get(p, 0)
        stack.extend(kids.get(p, []))
    return total


class ExternalLoadMonitor:
    """start()/stop() around a benchmark rep; stop() returns a record
    with the rep's external CPU load in cores (CPU consumed by
    processes outside `root_pid`'s tree divided by wall time)."""

    def __init__(self, root_pid: int | None = None):
        self.root = root_pid or os.getpid()

    def start(self) -> None:
        self._la0 = os.getloadavg()[0]
        self._host = host_busy_jiffies()
        self._tree = proc_tree_jiffies(self.root)
        self._t = time.monotonic()

    def stop(self) -> dict:
        wall = max(time.monotonic() - self._t, 1e-9)
        host = host_busy_jiffies() - self._host
        tree = proc_tree_jiffies(self.root) - self._tree
        ext = max(0.0, host - tree) / _CLK / wall
        return {
            "ext_cores": round(ext, 2),
            "own_cores": round(max(tree, 0) / _CLK / wall, 2),
            "loadavg": [round(self._la0, 2),
                        round(os.getloadavg()[0], 2)],
        }


def adjudicated_min(fn, reps: int, monitor: ExternalLoadMonitor,
                    ext_max: float, budget: list[int]):
    """min-of-`reps` with tenancy adjudication: a rep whose external
    load exceeds `ext_max` cores does not count toward the `reps`
    clean reps and is re-queued while the SHARED retry budget (a
    one-element list, decremented per polluted rep) allows.

    Returns (best_sec, last_result, records, polluted) where records
    carry per-rep {sec, ext_cores, own_cores, loadavg} and polluted
    means NO clean rep was obtained — the best time is an upper bound
    recorded under protest, and the caller must flag the artifact."""
    recs: list[dict] = []
    clean = 0
    out = None
    while clean < reps:
        monitor.start()
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        r = monitor.stop()
        r["sec"] = round(dt, 3)
        recs.append(r)
        if r["ext_cores"] <= ext_max:
            clean += 1
        elif budget[0] > 0:
            budget[0] -= 1
        else:
            break
    best = min(r["sec"] for r in recs)
    return best, out, recs, clean == 0

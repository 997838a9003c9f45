"""Host-noise telemetry for benchmark runs.

This sandbox VM shares physical CPUs with bursty neighbors: round-4
bench numbers showed a uniform ~1.4x per-query inflation on UNCHANGED
code that was indistinguishable from a real regression because nothing
recorded the contention.  Every timed section now samples

* **steal time** from ``/proc/stat`` (ticks the hypervisor ran someone
  else while this VM was runnable — the direct measure of neighbor
  CPU theft), and
* **1-min loadavg** from ``/proc/loadavg`` (runnable backlog; catches
  self-inflicted overload too),

before and after, and benchmark JSON carries ``steal_pct`` per section
so a slow number can be ATTRIBUTED (host noise vs engine regression)
instead of argued about.  The reference repo's bench discipline gates
on a 10% regression (Makefile:76-88 bench-compare); that gate is only
sound when the measurement records its own contamination.

Pure stdlib, no psutil (not in the container).  On non-Linux (no
/proc) every sample degrades to zeros and ``steal_pct`` is None.
"""

from __future__ import annotations

import os
import time


def _read_cpu_ticks() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from the aggregate cpu line."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
    except OSError:
        return 0, 0
    if not parts or parts[0] != "cpu":
        return 0, 0
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _loadavg1() -> float | None:
    try:
        return os.getloadavg()[0]
    except OSError:
        return None


def sample() -> dict:
    steal, total = _read_cpu_ticks()
    return {
        "steal": steal,
        "total": total,
        "load1": _loadavg1(),
        "ts": time.time(),
    }


def cpu_mhz() -> float | None:
    """Mean reported core clock — catches host frequency throttling,
    which steal% cannot see."""
    try:
        with open("/proc/cpuinfo") as f:
            mhz = [
                float(line.split(":")[1])
                for line in f
                if line.startswith("cpu MHz")
            ]
        return round(sum(mhz) / len(mhz), 0) if mhz else None
    except (OSError, ValueError, IndexError):
        return None


def alu_calibration(n: int = 3_000_000) -> float:
    """Single-thread ALU token: wall seconds for a fixed integer loop
    (~0.1 s on a healthy core).  Run at bench start/end, it converts
    'walls are uniformly 1.4x up at 1% steal' from a mystery into a
    measured host-slowdown factor — steal measures CPU theft,
    cpu_mhz measures clocks, this measures what a Python-side kernel
    actually gets.  Compare across runs, not against an absolute."""
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x += i
    dt = time.perf_counter() - t0
    return round(dt, 4)


def steal_pct(before: dict, after: dict) -> float | None:
    """% of elapsed CPU ticks stolen by the hypervisor between two
    samples; None when /proc/stat is unreadable or no time passed."""
    dt = after["total"] - before["total"]
    if dt <= 0:
        return None
    return round(100.0 * (after["steal"] - before["steal"]) / dt, 2)


class SectionTimer:
    """Times named sections and records per-section host telemetry.

    >>> st = SectionTimer()
    >>> with st.section("index_build"): ...
    >>> st.walls["index_build"], st.steal["index_build"]
    """

    def __init__(self) -> None:
        self.walls: dict[str, float] = {}
        self.steal: dict[str, float | None] = {}
        self.load1: dict[str, float | None] = {}

    class _Ctx:
        def __init__(self, outer: "SectionTimer", name: str) -> None:
            self.outer, self.name = outer, name

        def __enter__(self):
            self.s0 = sample()
            return self

        def __exit__(self, *exc):
            s1 = sample()
            self.outer.walls[self.name] = round(s1["ts"] - self.s0["ts"], 3)
            self.outer.steal[self.name] = steal_pct(self.s0, s1)
            self.outer.load1[self.name] = (
                round(s1["load1"], 2) if s1["load1"] is not None else None
            )
            return False

    def section(self, name: str) -> "SectionTimer._Ctx":
        return SectionTimer._Ctx(self, name)

    def summary(self) -> dict:
        """Aggregate view for the JSON tail: max/mean steal across all
        sections — one glance says whether the run was clean."""
        vals = [v for v in self.steal.values() if v is not None]
        if not vals:
            return {"steal_pct_max": None, "steal_pct_mean": None}
        return {
            "steal_pct_max": max(vals),
            "steal_pct_mean": round(sum(vals) / len(vals), 2),
        }

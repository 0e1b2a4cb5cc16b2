"""Host-condition probe (round-5 forensics, referenced from
BENCH/BASELINE.md): quantifies the two pathologies this sandbox exhibits
so benchmark records can be adjudicated — neighbor CPU contention (the
single-core calibration, same kernel as tools/scaling_run.py and
bench.py) and the hypervisor first-touch page-fault path (measured as
low as 6-11 MB/s during round 5; normal hosts fault at GB/s, and a slow
fault path inverts byte-heavy stage scaling because every new JVM heap,
python worker, Arrow batch and shuffle buffer crawls through it).

Usage: python tools/host_probe.py  ->  one JSON line
{"calib_ms": ..., "read_gb_s": ..., "fault_mb_s": ..., "fault_mb_s_8p": ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def calib() -> float:
    a = np.random.RandomState(0).rand(400, 400)
    best = 1e9
    for _ in range(3):
        t = time.time()
        b = a.copy()
        for _ in range(30):
            b = np.tanh(b @ b.T / 400.0)
        best = min(best, (time.time() - t) * 1000)
    return round(best, 1)


def read_bw() -> float:
    x = np.zeros(100 * 1024 * 1024 // 8)
    x.sum()  # fault in
    t = time.time()
    for _ in range(5):
        x.sum()
    return round(100 * 5 / (time.time() - t) / 1024, 2)


def _fault(_=None) -> float:
    t = time.time()
    x = np.empty(100 * 1024 * 1024 // 8)
    x[:] = 1.0  # first touch faults every page
    return time.time() - t


def fault_bw(procs: int = 1) -> float:
    if procs == 1:
        return round(100 / _fault(), 1)
    with mp.Pool(procs) as p:
        t = time.time()
        p.map(_fault, range(procs), chunksize=1)
        return round(100 * procs / (time.time() - t), 1)


if __name__ == "__main__":
    print(json.dumps({
        "calib_ms": calib(),
        "read_gb_s": read_bw(),
        "fault_mb_s": fault_bw(1),
        "fault_mb_s_8p": fault_bw(8),
    }))

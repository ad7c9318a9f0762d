"""Pure-Python units of the scaling protocol's during-phase instrument
(no Spark): core-set parsing and /proc/stat accounting sanity."""

from __future__ import annotations

import importlib.util
import os
import time

_spec = importlib.util.spec_from_file_location(
    "bench_scaling",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "bench_scaling.py"),
)
bench_scaling = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_scaling)


def test_parse_core_set():
    assert bench_scaling._parse_core_set("0-3") == {0, 1, 2, 3}
    assert bench_scaling._parse_core_set("0-1,4,6-7") == {0, 1, 4, 6, 7}
    assert bench_scaling._parse_core_set("5") == {5}


def test_cpu_counters_empty_set_counts_nothing():
    busy, steal = bench_scaling._cpu_counters(set())
    assert busy == 0.0
    assert steal >= 0.0


def test_cpu_counters_monotonic_and_bounded():
    cores = set(range(os.cpu_count() or 1))
    b0, s0 = bench_scaling._cpu_counters(cores)
    t0 = time.time()
    # burn a little CPU so the busy counter must advance
    acc = 0
    while time.time() - t0 < 0.3:
        acc += sum(i * i for i in range(1000))
    b1, s1 = bench_scaling._cpu_counters(cores)
    wall = time.time() - t0
    assert b1 >= b0 and s1 >= s0
    # busy delta can never exceed cores × wall (plus one jiffy of slack)
    assert (b1 - b0) <= len(cores) * wall + 0.02, (b0, b1, wall)
    assert (b1 - b0) > 0.0

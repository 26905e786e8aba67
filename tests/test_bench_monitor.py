"""Unit drills for bench.py's host-contention attribution.

``HostLoadMonitor`` splits a timed window's CPU into own / kernel /
foreign buckets by walking live ppid chains from /proc/*/stat, so the
committed BENCH artifact flags only FOREIGN load as contention and
retries those rows (VERDICT r4 weak #2: the previous total-minus-self
stamp fired on the bench run's own device-worker activity). These tests
exercise the bucket classification with real processes; the rows being
annotated ratio the reference's beam/streaming workloads
(/root/reference/speecht/evaluation.py:95-137).

No jax needed — bench.py imports only numpy at module scope.
"""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from bench import HostLoadMonitor, _proc_table  # noqa: E402


def test_proc_table_contains_self_with_parent_and_jiffies():
    table = _proc_table()
    me = os.getpid()
    assert me in table
    ppid, jiffies = table[me]
    assert ppid == os.getppid()
    assert jiffies >= 0
    # pid 1 (init) anchors every foreign classification walk
    assert 1 in table


def test_live_child_is_own_not_foreign():
    """A busy live descendant lands in the own bucket — the exact load
    the old stamp misattributed as contention."""
    child = subprocess.Popen(
        [sys.executable, "-c", "while True: sum(range(10000))"]
    )
    try:
        with HostLoadMonitor() as mon:
            time.sleep(1.5)
    finally:
        child.kill()
        child.wait()
    # the child spun for the whole window on this 1-core host; even under
    # a concurrently busy suite it gets a visible share
    assert mon.own_child_cpu_frac > 0.05, vars(mon)
    # and none of that share leaked into the foreign bucket: foreign +
    # own-child cannot exceed the window's total other-CPU plus sampling
    # slop (they partition disjoint pid sets)
    assert mon.foreign_cpu_frac <= mon.other_cpu_frac + 0.10, vars(mon)


def test_reaped_child_cpu_does_not_double_count():
    """A child that ran and was reaped inside the window is part of
    os.times' children view; the own-child bucket (live descendants
    only) must not go negative or explode."""
    with HostLoadMonitor() as mon:
        subprocess.run(
            [
                sys.executable,
                "-c",
                "t=__import__('time');d=t.time()+0.4\n"
                "while t.time()<d: sum(range(10000))",
            ],
            check=True,
        )
    assert 0.0 <= mon.own_child_cpu_frac <= 1.5, vars(mon)


def test_reparented_busy_process_is_foreign_and_contends():
    """Double-fork a CPU burner so it reparents away from this process's
    ppid chain: the monitor must classify it foreign and flag the row
    contended — the signal bench.py's retry loop acts on."""
    launcher = (
        "import os, sys, time\n"
        "pid = os.fork()\n"
        "if pid:\n"
        "    os._exit(0)\n"
        "os.setsid()\n"
        "print(os.getpid(), flush=True)\n"
        "deadline = time.time() + 6.0\n"
        "while time.time() < deadline:\n"
        "    sum(range(10000))\n"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", launcher],
        stdout=subprocess.PIPE,
        text=True,
    )
    burner_pid = int(proc.stdout.readline())
    proc.wait()  # the intermediate exited; the burner now hangs off init
    try:
        # give the kernel a beat to reparent before the entry snapshot
        time.sleep(0.1)
        with HostLoadMonitor() as mon:
            time.sleep(1.5)
    finally:
        try:
            os.kill(burner_pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
    assert mon.foreign_cpu_frac > HostLoadMonitor.CONTENDED_FRAC, vars(mon)
    assert mon.contended, vars(mon)
    row = mon.annotate({})
    assert row["host_contended"] is True
    for key in (
        "host_other_cpu_frac",
        "host_foreign_cpu_frac",
        "host_own_child_cpu_frac",
        "host_kernel_cpu_frac",
    ):
        assert 0.0 <= row[key], row

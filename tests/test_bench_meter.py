"""The bench host meter's attribution, tested with planted load.

BENCH artifacts defend the round's numbers with `own_cores` /
`steal_cores` / `other_cores`; if that attribution drifts (the r6 bugs:
unreaped py4j JVMs counted as "other", steal counted as an in-VM
competitor), the evidence becomes noise.  These tests plant known CPU
load in each attribution bucket and assert the meter files it correctly.
"""

import importlib.util
import subprocess
import sys
import time

BURN = "import time\ne=time.time()+{secs}\nwhile time.time()<e: pass"


def _bench_module():
    spec = importlib.util.spec_from_file_location("bench_mod", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_own_tree_burn_attributed_to_own():
    """Two live child burners are OUR cpu, not a phantom competitor."""
    bench = _bench_module()
    meter = bench._HostMeter()
    procs = [
        subprocess.Popen([sys.executable, "-c", BURN.format(secs=2.5)])
        for _ in range(2)
    ]
    for p in procs:
        p.wait()
    host = meter.finish()
    assert host["own_cores"] > 1.2, host
    assert host["other_cores"] < 0.8, host


def test_reaped_child_burn_still_attributed_to_own():
    """A burner that finishes AND is reaped mid-window must not vanish
    from `own` (the unreaped-JVM bug class): its CPU arrives via
    children_user."""
    bench = _bench_module()
    meter = bench._HostMeter()
    subprocess.run([sys.executable, "-c", BURN.format(secs=2.0)], check=True)
    time.sleep(1.0)  # meter window extends past the child's life
    host = meter.finish()
    assert host["own_cores"] > 0.45, host
    assert host["other_cores"] < 0.5, host


def test_orphaned_burn_attributed_to_other():
    """A double-forked burner reparents to init — a genuine in-VM
    competitor from the meter's point of view."""
    bench = _bench_module()
    launcher = (
        "import subprocess, sys\n"
        f"subprocess.Popen([sys.executable, '-c', '''{BURN.format(secs=2.5)}'''])\n"
    )
    meter = bench._HostMeter()
    subprocess.run([sys.executable, "-c", launcher], check=True)
    time.sleep(3.0)  # let the orphan burn inside the meter window
    host = meter.finish()
    # the launcher itself is ours (tiny); the orphan's full core is "other"
    assert host["other_cores"] > 0.5, host


def test_spin_probe_monotone_in_work():
    bench = _bench_module()
    small = bench._spin_probe_ms(1_000_000)
    large = bench._spin_probe_ms(4_000_000)
    assert large > 2.0 * small, (small, large)

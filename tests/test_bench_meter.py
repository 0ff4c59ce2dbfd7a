"""The bench host meter's attribution, tested with planted load.

BENCH artifacts defend the round's numbers with `own_cores` /
`steal_cores` / `other_cores`; if that attribution drifts (the r6 bugs:
unreaped py4j JVMs counted as "other", steal counted as an in-VM
competitor), the evidence becomes noise.  These tests plant known CPU
load in each attribution bucket and assert the meter files it correctly.

ADVICE r6: the planted-load thresholds are sensitive to ambient host load
and hypervisor steal — the exact condition the meter exists to detect —
so every attribution test (a) skips when an idle-sleep sample shows the
box already busy, and (b) retries once before failing.  They also carry
the `perf_attribution` marker so contended CI runs can exclude them
wholesale (`-m 'not perf_attribution'`).
"""


import importlib.util
import os
import subprocess
import sys
import time

import pytest

BURN = "import time\ne=time.time()+{secs}\nwhile time.time()<e: pass"

# Idle-sample busy-core ceiling: above this the box is already contended
# and the planted-load deltas drown in ambient noise.  Must sit BELOW the
# tightest other_cores threshold (0.5) plus headroom — an ambient 2-core
# competitor fails `other_cores < 0.8` no matter how exact the meter is.
AMBIENT_BUSY_CEILING = 1.0


def _bench_module():
    spec = importlib.util.spec_from_file_location("bench_mod", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ambient_busy_cores(bench, window: float = 0.3) -> float:
    """Busy cores measured over an idle sleep — we contribute ~nothing, so
    this is ambient (other processes + steal) load."""
    clk = os.sysconf("SC_CLK_TCK")
    b0, s0 = bench._stat_ticks()
    t0 = time.monotonic()
    time.sleep(window)
    b1, s1 = bench._stat_ticks()
    return (b1 - b0 + s1 - s0) / clk / max(time.monotonic() - t0, 1e-9)


def _attribution_test(fn):
    """Skip on a busy box, retry once on assertion failure (planted-load
    thresholds are inherently timing-sensitive)."""

    def wrapper():
        def attempt():
            bench = _bench_module()
            ambient = _ambient_busy_cores(bench)
            if ambient > AMBIENT_BUSY_CEILING:
                pytest.skip(
                    f"ambient load {ambient:.1f} cores > {AMBIENT_BUSY_CEILING}"
                    " — attribution thresholds unreliable on a contended box"
                )
            fn(bench)

        try:
            attempt()
        except AssertionError:
            time.sleep(1.5)
            # re-checks ambient first: a box that got busy MID-test skips
            # on the retry instead of failing the suite
            attempt()

    # no functools.wraps: it would copy __wrapped__ and pytest would then
    # treat the inner `bench` parameter as a fixture request
    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return pytest.mark.perf_attribution(wrapper)


@_attribution_test
def test_own_tree_burn_attributed_to_own(bench):
    """Two live child burners are OUR cpu, not a phantom competitor."""
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


@_attribution_test
def test_reaped_child_burn_still_attributed_to_own(bench):
    """A burner that finishes AND is reaped mid-window must not vanish
    from `own` (the unreaped-JVM bug class): its CPU arrives via
    children_user."""
    meter = bench._HostMeter()
    subprocess.run([sys.executable, "-c", BURN.format(secs=2.0)], check=True)
    time.sleep(1.0)  # meter window extends past the child's life
    host = meter.finish()
    assert host["own_cores"] > 0.45, host
    assert host["other_cores"] < 0.5, host


@_attribution_test
def test_orphaned_burn_attributed_to_other(bench):
    """A double-forked burner reparents to init — a genuine in-VM
    competitor from the meter's point of view."""
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


@_attribution_test
def test_spin_probe_monotone_in_work(bench):
    small = bench._spin_probe_ms(1_000_000)
    large = bench._spin_probe_ms(4_000_000)
    assert large > 2.0 * small, (small, large)


def test_memstream_probe_survives_missing_numpy(monkeypatch):
    """ADVICE r6: numpy must not be a hard dependency of the bench — the
    probe reports None (JSON null) when the import fails."""
    bench = _bench_module()
    import builtins

    real_import = builtins.__import__

    def no_numpy(name, *a, **k):
        if name == "numpy":
            raise ImportError("numpy unavailable (simulated)")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_numpy)
    assert bench._memstream_probe_ms() is None
    # the meter constructs and finishes end-to-end without numpy
    meter = bench._HostMeter()
    meter.mark_probes()
    host = meter.finish()
    assert host["mem_ms_pre"] is None and host["mem_ms_post"] is None

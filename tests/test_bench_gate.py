"""Pins for bench.py's canary gate (VERDICT r15 #2): a loaded-machine
payload (JVM canary far above the trailing-round band) must be
re-measured instead of silently becoming the official artifact, and
the trailing band itself must be computed from the last three
recorded payloads in round/rerun order."""

import json
import os

import bench


def _write(d, name, canary):
    with open(os.path.join(d, name), "w") as fh:
        json.dump({"queries": {"calibration_jvm_canary": canary}}, fh)


def test_canary_reference_is_median_of_last_three_in_round_order(tmp_path):
    d = str(tmp_path)
    _write(d, "BENCH_LOCAL_r13.json", 0.20)
    _write(d, "BENCH_LOCAL_r14.json", 0.18)
    _write(d, "BENCH_LOCAL_r14.rerun1.json", 0.19)
    _write(d, "BENCH_LOCAL_r15.json", 0.46)  # the loaded r15 payload
    _write(d, "BENCH_LOCAL_r15.rerun1.json", 0.18)
    # last three by (round, rerun): r14.rerun1, r15, r15.rerun1
    assert bench._canary_reference(d) == 0.19


def test_canary_reference_needs_two_payloads(tmp_path):
    d = str(tmp_path)
    assert bench._canary_reference(d) is None  # nothing recorded
    _write(d, "BENCH_LOCAL_r15.json", 0.20)
    assert bench._canary_reference(d) is None  # one is not a band
    _write(d, "BENCH_LOCAL_r15.rerun1.json", 0.22)
    assert abs(bench._canary_reference(d) - 0.21) < 1e-9


def test_canary_reference_skips_malformed_payloads(tmp_path):
    d = str(tmp_path)
    _write(d, "BENCH_LOCAL_r14.json", 0.20)
    _write(d, "BENCH_LOCAL_r15.json", 0.20)
    with open(os.path.join(d, "BENCH_LOCAL_r16.json"), "w") as fh:
        fh.write("{not json")
    assert bench._canary_reference(d) == 0.20


def test_gate_constants_match_verdict_mandate():
    # 1.5x with bounded retries is the r15 verdict's stated gate; a
    # drive-by loosening should fail a test, not slip through
    assert bench._CANARY_GATE_RATIO == 1.5
    assert 1 <= bench._CANARY_GATE_RETRIES <= 5


def test_gate_retries_until_canary_settles(monkeypatch):
    """Simulate the r15 incident: first measurement 2x the band, the
    retry clean — main()'s gate loop (extracted inline here via the
    same arithmetic) accepts the settled value and flags ok."""
    readings = iter([0.46, 0.19])
    ref = 0.20
    canary = next(readings)
    attempts = 1
    while (
        ref is not None
        and canary > bench._CANARY_GATE_RATIO * ref
        and attempts <= bench._CANARY_GATE_RETRIES
    ):
        canary = next(readings)
        attempts += 1
    assert canary == 0.19 and attempts == 2
    assert canary <= bench._CANARY_GATE_RATIO * ref

"""Unit tests for the canonical floor gate (tools/gen_baseline.py) —
the gate that turns BASELINE.md's >2x rule mechanical must itself be
tested, or a silent-pass bug there hides real regressions."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

import gen_baseline  # noqa: E402


def _doc():
    with open(gen_baseline.FLOORS_PATH) as fh:
        return json.load(fh)


def test_floors_cover_every_benched_headliner():
    """Every query bench.py times must have a floor (else the gate
    reports it unfloored and --check fails)."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    doc = _doc()
    missing = [q for q in bench.HEADLINE if q not in doc["floors"]]
    # join_skew_unsalted is the untimed pathology control — floored but
    # deliberately not in HEADLINE; nothing in HEADLINE may be floorless.
    assert not missing, f"headliners without a floor: {missing}"


def test_gate_flags_real_regression_and_passes_floor_level():
    doc = _doc()
    canaries = dict(doc["canaries"])
    # a measured set exactly at floor: host_speed 1.0, no violations
    measured = dict(canaries)
    measured["graph_kcore"] = doc["floors"]["graph_kcore"]["floor"]
    ev = gen_baseline.evaluate(doc, measured)
    assert ev["host_speed"] == 1.0
    assert ev["violations"] == [] and ev["unfloored"] == []
    # same set with one query at 3x its floor: exactly that one flags
    measured["graph_kcore"] = doc["floors"]["graph_kcore"]["floor"] * 3
    ev2 = gen_baseline.evaluate(doc, measured)
    assert ev2["violations"] == ["graph_kcore"]


def test_gate_normalizes_by_host_speed():
    """On a uniformly 1.9x-slower host nothing flags (the canaries move
    with the load), but a query 1.9x slow on a floor-speed host does."""
    doc = _doc()
    slow = {q: f * 1.9 for q, f in doc["canaries"].items()}
    slow["graph_kcore"] = doc["floors"]["graph_kcore"]["floor"] * 1.9
    ev = gen_baseline.evaluate(doc, slow)
    assert ev["violations"] == []
    fast_host = dict(doc["canaries"])
    fast_host["graph_kcore"] = doc["floors"]["graph_kcore"]["floor"] * 2.5
    ev2 = gen_baseline.evaluate(doc, fast_host)
    assert ev2["violations"] == ["graph_kcore"]


def test_gate_flags_insane_host_speed():
    """ADVICE r6: a uniform slowdown that hits the canaries themselves
    is normalized away by host_speed — above the sanity bound it must
    surface as a violation instead of silently absorbing a repo-wide
    shared-code-path regression."""
    doc = _doc()
    crawl = {q: f * 2.5 for q, f in doc["canaries"].items()}
    ev = gen_baseline.evaluate(doc, crawl)
    assert any("HOST_SPEED_INSANE" in v for v in ev["violations"])
    # ...while a merely-slow host (inside the bound) still passes.
    slow = {q: f * 1.9 for q, f in doc["canaries"].items()}
    assert gen_baseline.evaluate(doc, slow)["violations"] == []


def test_gate_fails_loud_without_canaries():
    doc = _doc()
    ev = gen_baseline.evaluate(doc, {"graph_kcore": 1.0})
    assert any("NO_CANARY" in v for v in ev["violations"])


def test_gate_reports_unfloored_queries():
    doc = _doc()
    measured = dict(doc["canaries"])
    measured["some_future_query"] = 1.0
    ev = gen_baseline.evaluate(doc, measured)
    assert ev["unfloored"] == ["some_future_query"]


def test_load_rejects_non_anchor_sf(tmp_path, monkeypatch):
    """A BENCH_DETAIL.json produced at sf!=0.1 must not be compared
    against sf0.1-anchored floors."""
    detail = {"sf": 0.01, "queries": {"graph_kcore": 1.0}}
    p = tmp_path / "BENCH_DETAIL.json"
    p.write_text(json.dumps(detail))
    monkeypatch.setattr(gen_baseline, "DETAIL_PATH", str(p))
    _, measured = gen_baseline.load()
    assert measured == {}
    detail["sf"] = 0.1
    p.write_text(json.dumps(detail))
    _, measured2 = gen_baseline.load()
    assert measured2 == {"graph_kcore": 1.0}

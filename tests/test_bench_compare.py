"""bench_compare.py — the mechanical regression gate's verdict rules
on crafted grids (pure-function logic; the CLI is exercised in the
round-close workflow against real committed grids)."""

from __future__ import annotations

from bench_compare import ITERATIVE_ALLOWLIST, compare_grids


def _grid(queries):
    return {"metric": "workload_total_runtime", "queries": queries}


def test_flat_total_passes_and_reports_additions():
    anchor = _grid({"a": 1.0, "b": 2.0, "c": 3.0})
    new = _grid({"a": 1.1, "b": 1.9, "c": 3.0, "d": 5.0})
    verdict, lines = compare_grids(anchor, new)
    assert verdict == "PASS"
    assert "+1 new queries (5.0s)" in lines[0]
    assert any("d=5.00s" in ln for ln in lines)


def test_total_growth_warns_then_fails():
    anchor = _grid({"a": 10.0, "b": 10.0})
    verdict, _ = compare_grids(anchor, _grid({"a": 12.0, "b": 11.5}))
    assert verdict == "WARN"  # 1.175x
    verdict, _ = compare_grids(anchor, _grid({"a": 14.0, "b": 13.0}))
    assert verdict == "FAIL"  # 1.35x


def test_small_absolute_movers_are_noise_not_suspects():
    """A 3x mover under the 2s absolute floor is run-to-run noise on
    this box — never flagged, never escalates."""
    anchor = _grid({"a": 0.3, "b": 50.0})
    verdict, lines = compare_grids(anchor, _grid({"a": 1.0, "b": 50.0}))
    assert verdict == "PASS"
    assert not any("suspect" in ln for ln in lines)


def test_big_mover_escalates_unless_allowlisted():
    anchor = _grid({"a": 2.0, "b": 100.0})
    # 4x and +6s on a non-allowlisted query: PASS-by-total escalates
    verdict, lines = compare_grids(anchor, _grid({"a": 8.0, "b": 100.0}))
    assert verdict == "WARN"
    assert any("suspect: a" in ln for ln in lines)

    # the same movement on an allowlisted iterative query: reported
    # as noise-class, verdict untouched
    it = next(iter(ITERATIVE_ALLOWLIST))
    anchor2 = _grid({it: 2.0, "b": 100.0})
    verdict2, lines2 = compare_grids(anchor2, _grid({it: 8.0, "b": 100.0}))
    assert verdict2 == "PASS"
    assert any("noise-class" in ln for ln in lines2)
    assert not any("suspect" in ln for ln in lines2)


def test_removed_queries_reported():
    anchor = _grid({"a": 1.0, "b": 2.0})
    verdict, lines = compare_grids(anchor, _grid({"a": 1.0}))
    assert verdict == "PASS"
    assert "-1 removed" in lines[0]
    assert any("removed: b" in ln for ln in lines)

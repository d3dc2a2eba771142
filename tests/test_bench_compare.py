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


def test_full_width_mover_list_names_sub_suspect_movers():
    """VERDICT r12 #7: every >=1.5x & >=0.5s mover is NAMED in the
    report (informational), even below the 2x/2s suspect threshold
    and even when allowlisted — without changing the verdict."""
    from bench_compare import compare_grids

    anchor = {"queries": {"a": 1.0, "b": 1.0, "c": 0.2, "bpe_train_merges": 2.0}}
    new = {"queries": {
        "a": 1.7,                 # 1.7x, +0.7s -> named mover
        "b": 1.2,                 # 1.2x -> quiet
        "c": 0.36,                # 1.8x but +0.16s < 0.5s abs -> quiet
        "bpe_train_merges": 3.4,  # 1.7x, +1.4s, allowlisted -> named+tag
    }}
    verdict, lines = compare_grids(anchor, new)
    text = "\n".join(lines)
    assert "mover(>=1.5x): a: 1.00s -> 1.70s (1.7x)" in text
    assert "mover(>=1.5x): bpe_train_merges" in text and "[allowlisted]" in text
    assert "c:" not in text.replace("common-", "")
    assert "total >=1.5x movers" in lines[0]


def test_suspects_not_double_counted_in_mover_list():
    """A >=2x suspect appears once (as a suspect), not again in the
    informational mover list; the headline total counts both classes."""
    from bench_compare import compare_grids

    anchor = {"queries": {"a": 1.0, "b": 1.0}}
    new = {"queries": {"a": 3.5, "b": 1.8}}
    verdict, lines = compare_grids(anchor, new)
    text = "\n".join(lines)
    assert text.count("a: 1.00s -> 3.50s") == 1
    assert "suspect: a:" in text
    assert "mover(>=1.5x): b:" in text
    assert "2 total >=1.5x movers" in lines[0]

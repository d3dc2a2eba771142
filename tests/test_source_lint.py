"""Source-level lint gate over the workload package (VERDICT r13 #6):
no dev-box partition-count literals in query bodies — cluster fan-out
comes from defaultParallelism/AQE, and deliberate file-count scenarios
carry an explicit '# lint: fixture-files' justification marker."""

from __future__ import annotations

import glob
import os

from hubsit_health_analytics_etl_spark.plans.lint import (
    Finding,
    lint_source_fixture_constants,
)

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hubsit_health_analytics_etl_spark",
)


def _workload_sources() -> list[str]:
    paths = sorted(
        glob.glob(os.path.join(PKG, "workload*.py"))
        + glob.glob(os.path.join(PKG, "workloads", "*.py"))
    )
    assert len(paths) >= 19  # workload, workload_ext shim, 17 families + _shared
    return paths


def test_no_literal_core_counts_in_workloads() -> None:
    bad: list[str] = []
    for path in _workload_sources():
        with open(path) as f:
            findings = lint_source_fixture_constants(f.read())
        bad += [f"{os.path.basename(path)}: {x.detail}" for x in findings]
    assert bad == [], "\n".join(bad)


def test_lint_rule_fires_on_literal_and_respects_marker() -> None:
    hit = lint_source_fixture_constants("df = df.repartition(32)\n")
    assert [f.code for f in hit] == ["literal-core-count"]
    assert isinstance(hit[0], Finding) and hit[0].severity == "error"
    # same-line and previous-line markers both opt out
    assert (
        lint_source_fixture_constants(
            "df.repartition(64)  # lint: fixture-files\n"
        )
        == []
    )
    assert (
        lint_source_fixture_constants(
            "# lint: fixture-files — scenario\ndf.repartition(8, 'k')\n"
        )
        == []
    )
    # keyed/dynamic repartition without a literal is fine
    assert lint_source_fixture_constants("df.repartition('k')\n") == []
    assert (
        lint_source_fixture_constants(
            "df.repartition(spark.sparkContext.defaultParallelism)\n"
        )
        == []
    )
    # commented-out code does not fire
    assert lint_source_fixture_constants("# df.repartition(32)\n") == []

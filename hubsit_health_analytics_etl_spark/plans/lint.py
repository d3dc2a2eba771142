"""Plan linter — pre-flight scale review for ad-hoc queries.

`tests/test_plan_quality.py` pins the plan shape of the SHIPPED
queries; this module turns the same contracts into a reusable check a
user runs on their OWN DataFrame before launching it at a 1000-executor
cluster: ``lint_plan(df)`` returns the list of anti-patterns whose
fixture-scale cost rounds to zero but whose 100 TB cost is the job.

Heuristics are deliberately conservative (inspection of the formatted
physical plan): everything flagged is a pattern this repo bans or
restricts in its own plan tests — cartesian products, non-broadcast
nested loops, row-at-a-time Python UDFs, sorts/windows funneled
through a single partition, and scans that push no filter down while
a Filter sits above them.

No reference counterpart (a pandas script has no plan to lint); this
is engine tooling for the scale posture SCALING.md documents.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from .explain import physical_plan

SEVERITIES = ("error", "warn", "info")

_TREE_NODE = re.compile(r"^([\s:+\-*]*)([A-Za-z][\w ]*?) \((\d+)\)\s*$")


@dataclass(frozen=True)
class Finding:
    severity: str  # error | warn | info
    code: str
    detail: str


def _parse_tree(plan: str) -> list[tuple[int, str, int]]:
    """[(indent, node_name, node_id)] for the plan-tree section."""
    out = []
    for line in plan.split("\n\n")[0].splitlines():
        m = _TREE_NODE.match(line)
        if m:
            out.append((len(m.group(1)), m.group(2).strip(), int(m.group(3))))
    return out


def _node_details(plan: str) -> dict[int, str]:
    """node_id → its detail block ('(N) NodeName\\nArguments: ...')."""
    out: dict[int, str] = {}
    for block in re.split(r"\n(?=\(\d+\) )", plan):
        m = re.match(r"\((\d+)\) ", block)
        if m:
            out[int(m.group(1))] = block
    return out


def _ancestors(tree: list[tuple[int, str, int]], idx: int) -> list[str]:
    """Node names on the path from tree[idx] up to the root."""
    names = []
    indent = tree[idx][0]
    for j in range(idx - 1, -1, -1):
        if tree[j][0] < indent:
            names.append(tree[j][1])
            indent = tree[j][0]
    return names


def lint_plan(df: DataFrame) -> list[Finding]:
    """Scan the executed plan for scale anti-patterns. Empty list =
    nothing flagged (not a proof of optimality)."""
    p = physical_plan(df)
    tree = _parse_tree(p)
    details = _node_details(p)
    f: list[Finding] = []

    if "CartesianProduct" in p:
        f.append(
            Finding(
                "error",
                "cartesian-product",
                "unbounded pair explosion: every left row × every right row "
                "crosses the cluster. Add an equi-key (bucketize/band the "
                "predicate) or broadcast a provably tiny side.",
            )
        )

    for seg in p.split("BroadcastNestedLoopJoin")[1:]:
        head = seg.splitlines()[0].strip()
        if head and not head.startswith("Cross BuildRight"):
            f.append(
                Finding(
                    "warn",
                    "nested-loop-join",
                    f"non-equi join streams the big side per broadcast row "
                    f"({head[:60]}); restate as an equi-join if any key exists.",
                )
            )
            break
    else:
        if "BroadcastNestedLoopJoin" in p:
            f.append(
                Finding(
                    "info",
                    "broadcast-cross-join",
                    "Cross BuildRight nested loop: bounded ONLY if the "
                    "broadcast side is provably tiny (a one-row scalar or a "
                    "centroid table); verify the build side's row bound.",
                )
            )

    if "BatchEvalPython" in p:
        f.append(
            Finding(
                "warn",
                "row-python-udf",
                "row-at-a-time Python UDF (pickle per row); an Arrow "
                "pandas_udf is 10-100x faster, a builtin expression more.",
            )
        )

    # single-partition funnels: a Sort/Window above an Exchange
    # SinglePartition serializes the full input through one task.
    # (Global one-row aggregates and collect-limit edges are fine.)
    for idx, (_, name, nid) in enumerate(tree):
        if name != "Exchange" or "SinglePartition" not in details.get(nid, ""):
            continue
        anc = _ancestors(tree, idx)
        funnel = next(
            (a for a in anc[:2] if a in ("Sort", "Window", "WindowGroupLimit")),
            None,
        )
        if funnel:
            f.append(
                Finding(
                    "warn",
                    "single-partition-stage",
                    f"{funnel} runs on ONE task over the full input; "
                    "partition the window by a key, or use orderBy+limit "
                    "(TakeOrderedAndProject) for global top-k.",
                )
            )
            break

    if re.search(r"PushedFilters: \[\]", p) and "Filter" in p:
        f.append(
            Finding(
                "info",
                "no-pushed-filters",
                "a scan pushes no filters while Filter nodes exist above; "
                "if the predicate is on scanned columns, restate it so the "
                "source can skip row groups (cast/UDF-wrapped columns block "
                "pushdown).",
            )
        )

    order = {s: i for i, s in enumerate(SEVERITIES)}
    return sorted(f, key=lambda x: order[x.severity])


def lint_driver_output(df: DataFrame) -> list[Finding]:
    """Schema contract for driver-facing query results: every
    top-level column must be a hashable SCALAR.

    The correctness gate canonicalizes results by sorting a pandas
    frame and hashing its values; a top-level ``array``/``map``/
    ``struct`` column arrives as ``numpy.ndarray``/``dict``/``Row``
    and crashes that canonicalizer (``TypeError: unhashable type`` —
    the r7 ``embedding_pca_reduce`` failure). Nested data belongs
    behind a deterministic scalar signature instead: md5 of the
    rounded, comma-joined array (the ``embedding_quantize`` /
    ``embedding_pca_reduce`` pattern), plus whatever scalar metrics
    (min/max/energy) the consumer needs to reason about the payload."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    f: list[Finding] = []
    for field in df.schema.fields:
        if isinstance(field.dataType, (ArrayType, MapType, StructType)):
            f.append(
                Finding(
                    "error",
                    "nested-output-column",
                    f"column '{field.name}' is {field.dataType.simpleString()}: "
                    "unhashable in the gate's pandas canonicalizer — emit a "
                    "scalar md5 signature of the rounded payload instead "
                    "(embedding_quantize pattern).",
                )
            )
    return f


def lint_source_fixture_constants(source: str) -> list[Finding]:
    """Source-level gate: no dev-box core counts baked into query
    bodies (VERDICT r13 nit #1 — ``repartition(32)`` in a query that
    claims cluster posture follows the fixture box, not the cluster).

    Flags ``repartition(<int literal> ...)`` / ``coalesce(<int>)``
    outside comments. Cluster-sized fan-out must come from
    ``spark.sparkContext.defaultParallelism`` (or be left to AQE).
    A literal that is genuinely a SCENARIO constant — e.g. "write 64
    small files so compaction has something to compact", "8 bloom
    files so point lookups can skip" — opts out with an explicit
    ``# lint: fixture-files`` marker on the same line or the line
    above, which doubles as the reviewer-facing justification."""
    f: list[Finding] = []
    lines = source.splitlines()
    for i, line in enumerate(lines):
        code = line.split("#", 1)[0]
        m = re.search(r"\.(repartition|coalesce)\(\s*(\d+)", code)
        if not m:
            continue
        marked = "lint: fixture-files" in line or (
            i > 0 and "lint: fixture-files" in lines[i - 1]
        )
        if marked:
            continue
        f.append(
            Finding(
                "error",
                "literal-core-count",
                f"line {i + 1}: .{m.group(1)}({m.group(2)}…) hardcodes a "
                "partition count — use spark.sparkContext."
                "defaultParallelism (or AQE), or mark a deliberate "
                "file-count scenario with '# lint: fixture-files'.",
            )
        )
    return f

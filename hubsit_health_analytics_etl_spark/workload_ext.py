"""EXT workload — back-compat facade over the ``workloads`` package.

The former 15.7k-line single-file EXT workload (SURVEY.md §7.2 step 7:
time windows, text analysis, dedup, similarity search, multimodal
plumbing, graph, sketches, retrieval, lifecycle, behavioral
statistics) now lives in per-family modules under ``workloads/``
(VERDICT r13 #2). Importing either ``workload`` or this module
triggers the package's ordered family imports, so the ``@query``
registry is byte-identical to the pre-split single file.

Attribute access is LAZY (PEP 562): names resolve against the ordered
family modules at lookup time, which keeps every legacy import working
— public queries and constants AND the underscore helpers tests pin
(``_llm_dataset_plan``, ``_markov_maintain``, …) — without a fragile
static re-export list, and without star-importing from a partially
initialized package (the circular-import trap: ``workload`` ⇄
``workloads`` resolve because the package tail-import binds module
OBJECTS only; attributes are touched after init completes).

NOTE for monkeypatching in tests: patch the DEFINING family module
(e.g. ``workloads.w11_warehouse_ops.load_table``) — setting an
attribute here shadows the facade only.
"""

from __future__ import annotations

from . import workload as _workload  # noqa: F401  (registry + family init)
from . import workloads as _pkg


def __getattr__(name: str):
    for mod in _pkg.FAMILY_MODULES:
        if hasattr(mod, name):
            return getattr(mod, name)
    if hasattr(_pkg._shared, name):
        return getattr(_pkg._shared, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )


def __dir__():
    names = set(globals())
    for mod in _pkg.FAMILY_MODULES:
        names.update(n for n in dir(mod) if not n.startswith("__"))
    return sorted(names)

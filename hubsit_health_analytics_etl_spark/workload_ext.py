"""EXT workload — back-compat facade over the ``workloads`` package.

The former 15.7k-line single-file EXT workload (SURVEY.md §7.2 step 7:
time windows, text analysis, dedup, similarity search, multimodal
plumbing, graph, sketches, retrieval, lifecycle, behavioral statistics)
now lives in per-family modules under ``workloads/`` (VERDICT r13 #2).
Importing THIS module imports them in the original registration order,
so ``workload.QUERIES``/``ORACLES`` are byte-identical to the
pre-split registry; every public name (``q_*`` queries, tuning
constants) is re-exported here so existing imports keep working.
"""

from __future__ import annotations

from .workloads import *  # noqa: F401,F403
from .workloads._shared import *  # noqa: F401,F403

# Underscore helpers pinned by tests — re-exported explicitly because
# star-imports skip them.
from .workloads._shared import _spread  # noqa: F401
from .workloads.w02_dedup import _run_scoped_index_dir  # noqa: F401
from .workloads.w08_ann_composites import _two_stage_rerank  # noqa: F401
from .workloads.w09_curation_lifecycle import _QLR_TEST_PCT  # noqa: F401
from .workloads.w10_dataset_build import _llm_dataset_plan  # noqa: F401
from .workloads.w12_retrieval_sketches import _rot_pq_topk  # noqa: F401
from .workloads.w17_quality_calendar import (  # noqa: F401
    _markov_counts,
    _markov_maintain,
)

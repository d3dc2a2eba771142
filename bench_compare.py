"""Mechanical bench regression gate (VERDICT r8 #5): diff a fresh
bench grid against the committed anchor and print ONE verdict line,
applying the noise rules BASELINE.md previously adjudicated in prose.

Usage:
    python bench_compare.py [new_grid.json] [anchor_grid.json]

Defaults: new = bench_evidence/latest_full_grid.json, anchor = the
grid named in bench_evidence/ANCHOR. Exit code 0 on PASS/WARN, 1 on
FAIL — run it at round close and paste the verdict into BASELINE.md.

Rules (from the measurement-box noise model in
.claude/skills/verify/SKILL.md — single-query timings vary ±2x
run-to-run; totals across full runs are the comparable statistic):

- The verdict statistic is the COMMON-QUERY TOTAL ratio (new/anchor
  over queries present in both grids): PASS <= 1.10, WARN <= 1.25,
  FAIL above.
- Per-query movers are SUSPECTS, not verdicts: flagged when a
  non-allowlisted query grows >= 2x AND >= 2s absolute (below that
  is the documented noise floor). Any suspect >= 3x AND >= 3s
  escalates the verdict one level — that is past what scheduling
  noise produces on this box.
- Full-width mover LIST (VERDICT r12 #7): every common query >=1.5x
  AND >= 0.5s absolute is NAMED in the report (informational — the
  verdict rules above are unchanged), so a regression anywhere in the
  registry is attributed automatically instead of by-hand grid
  diffing at round close.
- ITERATIVE_ALLOWLIST: driver-sequenced / ML-fit queries whose
  wall-clock includes per-round scheduling latency or a distributed
  fit — the class every past round's noise adjudication concerned
  (e.g. ann_pq_adc_topk 2.4s->5.8s in one r8 grid, 2.2-2.7s in four
  others). They are reported but never flip the verdict.
- Added/removed queries are reported with their cost so a grown
  total is attributable.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
EVIDENCE = os.path.join(HERE, "bench_evidence")

# Driver-sequenced loops (per-round scheduling latency dominates) and
# distributed ML fits (KMeans/LogReg/PCA) — the documented
# high-variance class. Kept explicit so a new query must OPT IN here
# with a reason, not inherit leniency silently.
ITERATIVE_ALLOWLIST = {
    # connected-components loops (driver-sequenced rounds)
    "dedup_clusters",
    "dedup_clusters_new_batch",
    "dedup_clusters_merge_only",
    "dedup_clusters_forget",
    "dedup_cluster_size_histogram",
    "dedup_keep_by_source",
    "corpus_dedup_pipeline",
    "corpus_curation_pipeline",
    "corpus_scrub_pipeline",  # CC loop + full scrub chain in one job
    "leakage_safe_split",
    # BPE trainer (k driver-sequenced merge rounds)
    "bpe_train_merges",
    "bpe_symbol_vocab",
    "bpe_doc_token_counts",
    # distributed ML fits
    "ann_kmeans_ivf_recall",
    "ann_pq_trained_recall",
    "ann_opq_adc_topk",
    "doc_quality_trained_model",
    "embedding_pca_reduce",
    # multi-pipeline composites / index write+read round-trips whose
    # sequential sub-jobs stack scheduling noise
    "ann_recall_at_k",
    "ann_forget_topk",
    "ann_pq_adc_topk",
    "compaction_roundtrip",
    "export_manifest_roundtrip",
    "orders_version_diff",
    "orders_version_history",
    "versioned_pruned_read",  # commit (write+verify read) inside the timed query
    "versioned_zorder_read",  # z-clustered commit inside the timed query
    "spans_new_batch",  # gram-df index write+read round-trip inside the query
    "scrub_new_batch",  # gram-ownership index write+read inside the query
    "vocab_new_batch",  # same posture: index write+read inside the query
    "moments_new_batch",  # moments index write+read inside the query
    "moments_forget",  # same posture: index write+read inside the query
    "llm_dataset_build",  # CC loop + BPE rounds + verified export in one job
    "llm_dataset_new_batch",  # same classes: affected-CC + BPE retrain + export
    "theta_new_batch",  # theta index write+read round-trip inside the query
    "theta_forget",  # same posture: index write+read inside the query
    "supplier_customer_pagerank",  # driver-sequenced iterations + eager edge materialization
    "related_parts_ppr",  # same: per-iteration driver sequencing + eager edges
    "textrank_keywords",  # page_rank composition — same driver-sequenced class
    "versioned_bloom_read",  # commit (write + bloom build) inside the timed query
    "copurchase_triangles",  # eager edge materialization inside the timed query
    # r13 session 2 members of the same classes
    "part_weighted_distance",  # Bellman-Ford driver-sequenced relaxation rounds
    "markov_new_batch",  # transition index write+read round-trip inside the query
    "markov_forget",  # same posture: index write+read inside the query
    "export_orc_roundtrip",  # ORC write+read round-trip inside the timed query
}

PASS_RATIO, WARN_RATIO = 1.10, 1.25
SUSPECT_X, SUSPECT_ABS = 2.0, 2.0
ESCALATE_X, ESCALATE_ABS = 3.0, 3.0
MOVER_X, MOVER_ABS = 1.5, 0.5  # named-in-report threshold (full width)


def load_grid(path: str) -> dict:
    with open(path) as f:
        g = json.load(f)
    if "queries" not in g:
        raise ValueError(f"{path}: not a bench grid (no 'queries')")
    return g


def compare_grids(anchor: dict, new: dict) -> tuple[str, list[str]]:
    """(verdict, report_lines). Pure function — unit-tested."""
    aq, nq = anchor["queries"], new["queries"]
    common = sorted(set(aq) & set(nq))
    added = sorted(set(nq) - set(aq))
    removed = sorted(set(aq) - set(nq))
    a_tot = sum(aq[q] for q in common)
    n_tot = sum(nq[q] for q in common)
    ratio = (n_tot / a_tot) if a_tot else float("inf")

    suspects, escalate = [], False
    noisy, movers = [], []
    for q in common:
        old, cur = aq[q], nq[q]
        line = f"{q}: {old:.2f}s -> {cur:.2f}s ({cur / old:.1f}x)"
        if cur >= old * SUSPECT_X and cur - old >= SUSPECT_ABS:
            if q in ITERATIVE_ALLOWLIST:
                noisy.append(line + " [allowlisted iterative/fit]")
            else:
                suspects.append(line)
                if cur >= old * ESCALATE_X and cur - old >= ESCALATE_ABS:
                    escalate = True
        elif cur >= old * MOVER_X and cur - old >= MOVER_ABS:
            movers.append(
                line + (" [allowlisted]" if q in ITERATIVE_ALLOWLIST else "")
            )

    levels = ["PASS", "WARN", "FAIL"]
    level = 0 if ratio <= PASS_RATIO else (1 if ratio <= WARN_RATIO else 2)
    if escalate:
        level = min(level + 1, 2)
    verdict = levels[level]

    added_cost = sum(nq[q] for q in added)
    lines = [
        f"VERDICT: {verdict} common-{len(common)} total "
        f"{n_tot:.1f}s vs anchor {a_tot:.1f}s ({ratio:.2f}x); "
        f"{len(suspects)} non-allowlisted >=2x movers; "
        f"{len(movers) + len(suspects) + len(noisy)} total >=1.5x movers; "
        f"+{len(added)} new queries ({added_cost:.1f}s), "
        f"-{len(removed)} removed"
    ]
    for s in suspects:
        lines.append(f"  suspect: {s}")
    for s in noisy:
        lines.append(f"  noise-class: {s}")
    for s in sorted(movers):
        lines.append(f"  mover(>=1.5x): {s}")
    if added:
        top = sorted(added, key=lambda q: -nq[q])[:5]
        lines.append(
            "  new: " + ", ".join(f"{q}={nq[q]:.2f}s" for q in top)
            + ("..." if len(added) > 5 else "")
        )
    if removed:
        lines.append("  removed: " + ", ".join(removed[:10]))
    return verdict, lines


def main(argv: list[str]) -> int:
    new_path = argv[1] if len(argv) > 1 else os.path.join(
        EVIDENCE, "latest_full_grid.json"
    )
    if len(argv) > 2:
        anchor_path = argv[2]
    else:
        with open(os.path.join(EVIDENCE, "ANCHOR")) as f:
            anchor_path = os.path.join(EVIDENCE, f.read().strip())
    anchor, new = load_grid(anchor_path), load_grid(new_path)
    verdict, lines = compare_grids(anchor, new)
    print(
        f"anchor={os.path.basename(anchor_path)} "
        f"new={os.path.basename(new_path)}"
    )
    for ln in lines:
        print(ln)
    return 1 if verdict == "FAIL" else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

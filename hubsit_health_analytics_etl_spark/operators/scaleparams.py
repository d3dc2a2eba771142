"""Scale-derivation rules for the banded/bucketed operators.

The LSH/IVF family keeps per-reducer work bounded through three knobs
— hyperplane count, IVF cell count, band-bucket caps. The shipped
workload queries pin them to fixture-tuned constants because their SQL
oracles inline the same literals (``operators/similarity.py:N_PLANES``
etc.); a production deployment derives them from the corpus row count
with the rules here, so block/bucket/cell sizes stay CONSTANT as the
corpus grows instead of growing linearly with N (which would make the
in-bucket pair expansion quadratic).

The rules (all pure integer math — call once on the driver with a
``df.count()`` or a catalog row-count estimate):

- sign-LSH planes: expected bucket size is N / 2^planes, so
  ``planes = ceil(log2(N / target))`` holds it at ``target``.
- IVF cells: query cost is C centroid scores + N/C cell-member
  scores; the product is minimized at C ≈ sqrt(N). The FAISS-style
  working rule is C = 4·sqrt(N) (cells a few× smaller than sqrt
  buys recall at negligible centroid-scan cost while the broadcast
  centroid table stays tiny: 4·sqrt(10^12) × 64 dims ≈ 2 GB total,
  sharded trivially if ever too big for one broadcast).
- band-bucket caps: a bucket of m members emits m(m-1)/2 pairs on
  one reducer, so a PAIR budget per bucket is the primitive:
  ``cap = floor(sqrt(2 · max_pairs))``. The default budget 528
  reproduces the shipped MINHASH_BUCKET_CAP=32; SimHash ships 64
  (budget ≈ 2k) because its 256-value band keys concentrate more.
"""

from __future__ import annotations

import math

TARGET_LSH_BUCKET = 16      # docs per sign-LSH bucket the planes aim for
MAX_PAIRS_PER_BUCKET = 528  # C(32,2) — the shipped MinHash cap's budget


def lsh_planes_for(n_rows: int, target_bucket: int = TARGET_LSH_BUCKET) -> int:
    """Hyperplane count holding the expected sign-LSH bucket size at
    ``target_bucket``: buckets double per plane, so planes grow with
    log2(N) — the property the block-key-cardinality tests pin."""
    if n_rows <= target_bucket:
        return 1
    return max(1, math.ceil(math.log2(n_rows / target_bucket)))


def ivf_cells_for(n_rows: int) -> int:
    """IVF coarse-quantizer cell count: 4·sqrt(N) (FAISS working
    rule). Balances centroid-scan cost (C) against cell-scan cost
    (N/C); nprobe then buys recall linearly."""
    return max(1, round(4 * math.sqrt(n_rows)))


def bucket_cap_for(max_pairs: int = MAX_PAIRS_PER_BUCKET) -> int:
    """Band-bucket member cap from a per-bucket PAIR budget: a bucket
    of m members emits m(m-1)/2 ≤ max_pairs pairs on one reducer."""
    return max(2, math.floor(math.sqrt(2 * max_pairs)))


PQ_MIN_TRAIN_PER_CODEWORD = 39  # FAISS's min-points-per-centroid rule


def pq_codewords_for(n_rows: int, max_codewords: int = 256) -> int:
    """Per-subspace PQ codeword count: 256 (8-bit codes, the standard
    production choice) once the corpus can train that many, bounded
    below that by FAISS's ≥39 training points per centroid rule so
    every codeword's centroid stays estimable. Tiny corpora degrade to
    k=2 rather than failing."""
    return max(2, min(max_codewords, n_rows // PQ_MIN_TRAIN_PER_CODEWORD))


def derive_scale_params(
    n_rows: int,
    target_bucket: int = TARGET_LSH_BUCKET,
    max_pairs_per_bucket: int = MAX_PAIRS_PER_BUCKET,
) -> dict[str, int]:
    """All knobs at once for a corpus of ``n_rows``:
    (n_planes, n_cells, bucket_cap). The expected sign-LSH bucket size
    N / 2^planes lands in (target/2, target] for any N > target —
    asserted by tests across nine orders of magnitude."""
    return {
        "n_planes": lsh_planes_for(n_rows, target_bucket),
        "n_cells": ivf_cells_for(n_rows),
        "bucket_cap": bucket_cap_for(max_pairs_per_bucket),
    }

"""Shape-bucketing helper (XLA static shapes; SURVEY.md §7 hard part 5).

Serving pads variable request sizes to power-of-two buckets so
concurrent traffic reuses a handful of compiled graphs.  One shared
definition: the batcher's grouping buckets and the quantum reranker's
doc-count padding MUST agree, or coalesced calls stop hitting the
single-request paths' compile cache.
"""

from __future__ import annotations


def pow2_bucket(n: int, floor: int = 8) -> int:
    """Smallest power-of-two >= max(n, floor)."""
    bucket = max(1, int(floor))
    n = max(1, int(n))
    while bucket < n:
        bucket *= 2
    return bucket

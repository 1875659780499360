"""Shared actor-pool sizing policy.

One definition of the autoscaling (cpus//2, cpus) pool shape so the
stateful stages (scorer, BPE encode/vocab, media decode callers that
opt in) cannot drift: the min of half the CPUs keeps spin-up cost
small while guaranteeing a downstream sort/shuffle is never starved
by idle actors holding every core (the deadlock pack_bins hit when a
fixed-size pool equalled the session's CPU count)."""

from __future__ import annotations


def coalesce_small_blocks(mds, target_bytes: int = 32 << 20,
                          max_extra: int = 2):
    """Collapse a pathological tiny-block layout (a materialized
    dataset holding thousands of few-row blocks, the residue of
    chained bucket shuffles over small corpora).  Every sort-based
    shuffle downstream allocates O(blocks_in x blocks_out) object
    slices, so fragmentation compounds quadratically across stages —
    measured 5 s -> 110 s for the same `dedup_cut_spans` input at
    32 vs 384 input blocks.

    No-op whenever the average block already carries real payload
    (>= ``target_bytes``) or the count is within ``max_extra`` x
    cluster CPUs — at production block sizes (64-128 MB) this never
    fires, so the 100-TB plan is unchanged.  The coalesce itself is
    ``repartition(shuffle=False)``: a split/merge of existing blocks,
    not an all-to-all."""
    import ray

    try:
        nb = mds.num_blocks()
        sz = mds.size_bytes() or 0
    except Exception:
        return mds  # not materialized — caller keeps the lazy plan
    cpus = (
        int(ray.cluster_resources().get("CPU", 8))
        if ray.is_initialized()
        else 8
    )
    floor = max(1, cpus * max_extra)
    if nb <= floor or sz / max(nb, 1) >= target_bytes:
        return mds
    target = max(floor, int(sz // target_bytes) + 1)
    if target >= nb:
        return mds
    return mds.repartition(target, shuffle=False).materialize()


def autoscaling_pool(concurrency=None):
    """None → (max(1, cpus // 2), cpus); int n → (1, n) (bounded
    autoscaling); tuple passes through."""
    if concurrency is not None:
        return (1, concurrency) if isinstance(concurrency, int) else concurrency
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (max(1, cpus // 2), cpus)

"""Shared actor-pool sizing policy.

One definition of the autoscaling (cpus//2, cpus) pool shape so the
stateful stages (scorer, BPE encode/vocab, media decode callers that
opt in) cannot drift: the min of half the CPUs keeps spin-up cost
small while guaranteeing a downstream sort/shuffle is never starved
by idle actors holding every core (the deadlock pack_bins hit when a
fixed-size pool equalled the session's CPU count)."""

from __future__ import annotations


def autoscaling_pool(concurrency=None):
    """None → (max(1, cpus // 2), cpus); int n → (1, n) (bounded
    autoscaling); tuple passes through."""
    if concurrency is not None:
        return (1, concurrency) if isinstance(concurrency, int) else concurrency
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (max(1, cpus // 2), cpus)

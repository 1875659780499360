"""Distributed logistic regression: exact equality with a pure numpy
replay, partition invariance (the integer-gradient design goal), and a
separability sanity check for the learned pair scorer."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from email_address_parser_ray.stages.logreg import (
    GRAD_GRID,
    _features,
    grad_partial,
    predict_logreg,
    train_logreg,
)


def _make_pairs(n=400, seed=11):
    """Synthetic labeled match/non-match pairs: two features (name
    similarity, domain equality) separate the classes with noise."""
    rng = np.random.RandomState(seed)
    y = (rng.rand(n) < 0.5).astype(np.float64)
    sim = np.clip(0.35 + 0.45 * y + 0.18 * rng.randn(n), 0, 1)
    dom = ((y + 0.15 * rng.randn(n)) > 0.5).astype(np.float64)
    return pa.table(
        {
            "sim": pa.array(sim),
            "dom_eq": pa.array(dom),
            "label": pa.array(y),
        }
    )


def _reference_fit(t: pa.Table, iters, lr, l2=0.0):
    """Driver-side replay of the same quantized-gradient arithmetic."""
    X = _features(t, ["sim", "dom_eq"])
    y = t["label"].to_numpy(zero_copy_only=False).astype(np.float64)
    w = np.zeros(3)
    for _ in range(iters):
        n, g = grad_partial(X, y, w)
        w = w - lr * (g.astype(np.float64) / GRAD_GRID / n + l2 * w)
    return w


def test_matches_numpy_replay_exactly(ray_session):
    import ray.data as rd

    t = _make_pairs()
    want = _reference_fit(t, iters=30, lr=0.5)
    got = train_logreg(
        rd.from_arrow(t).repartition(7), ["sim", "dom_eq"], "label",
        iters=30, lr=0.5,
    )
    # single-block distributed == driver replay must be bit-identical;
    # multi-block differs only by int64 partial-sum order (commutative)
    assert np.array_equal(got, want)


def test_partition_invariance(ray_session):
    import ray.data as rd

    t = _make_pairs(seed=5)
    fits = [
        train_logreg(
            rd.from_arrow(t).repartition(b), ["sim", "dom_eq"], "label",
            iters=20, lr=0.4, l2=0.01,
        )
        for b in (1, 4, 13)
    ]
    assert np.array_equal(fits[0], fits[1])
    assert np.array_equal(fits[0], fits[2])


def test_learned_scorer_separates(ray_session):
    import ray.data as rd

    t = _make_pairs(n=600, seed=3)
    ds = rd.from_arrow(t).repartition(6)
    w = train_logreg(ds, ["sim", "dom_eq"], "label", iters=80, lr=1.0)
    scored = predict_logreg(ds, w, ["sim", "dom_eq"]).to_pandas()
    acc = ((scored["p_match"] > 0.5) == (scored["label"] > 0.5)).mean()
    assert acc > 0.9
    # probabilities are calibrated-ish: mean p on matches >> non-matches
    assert (
        scored.loc[scored["label"] == 1, "p_match"].mean()
        - scored.loc[scored["label"] == 0, "p_match"].mean()
        > 0.5
    )


def test_empty_training_set_raises(ray_session):
    import ray.data as rd
    import pytest

    t = _make_pairs(n=2).slice(0, 0)
    with pytest.raises(ValueError):
        train_logreg(rd.from_arrow(t), ["sim", "dom_eq"], "label", iters=1)

"""Distributed logistic-regression training — a learned pair scorer.

Entity resolution at production scale replaces hand-tuned match weights
with a model trained on labeled pairs (match / non-match).  This stage
trains binary logistic regression over a feature table as a Ray Data
iteration loop with the same shape as ``stages/kmeans.py``:

* weights (d+1 float64, tiny) are broadcast once per iteration via
  ``ray.put`` — never re-shipped per batch;
* each ``map_batches`` task computes its rows' gradient contribution
  with one numpy matmul and emits ONE row of (count, d+1 int64 partial
  sums) — per-sample contributions are quantized to a 1e-9 grid BEFORE
  summation, so block sums are order-independent int64 and the fitted
  weights are bit-identical under ANY partitioning (the float-sum-order
  problem that makes naive distributed SGD non-reproducible is designed
  out, same trick as the integer-exact k-means / PageRank stages);
* the driver folds nblocks partial rows (bounded by block count, never
  data size) and applies the full-batch update  w -= lr * (g/n + l2*w).

Full-batch gradient descent is the deliberate choice over SGD: each
iteration is one streaming pass with backpressure (no per-sample state),
and determinism is exact.  At 100 TB, fit on a seeded hash-sample of the
labeled pairs (labels are scarce relative to the corpus) and score the
full candidate stream with ``predict_logreg`` — scoring is a stateless
vectorized map.

No reference counterpart (the reference is a parser); engine addition
for the trainable-scorer surface, validated by pytest against a pure
numpy replay (exact equality) + partition invariance + a separability
sanity check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GRAD_GRID = 1_000_000_000  # 1e-9 per-sample gradient quantization


def _features(batch: pa.Table, feature_cols: list[str]) -> np.ndarray:
    cols = [
        batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
        for c in feature_cols
    ]
    return np.column_stack(cols + [np.ones(batch.num_rows, dtype=np.float64)])


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically stable piecewise form
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def grad_partial(
    X: np.ndarray, y: np.ndarray, w: np.ndarray
) -> tuple[int, np.ndarray]:
    """One block's quantized gradient partial: per-SAMPLE contributions
    ``(p_i - y_i) * x_i`` are rounded to the 1e-9 grid and summed in
    int64, so the fold is exact and order-independent.  Shared by the
    distributed stage and the pytest numpy replay."""
    resid = _sigmoid(X @ w) - y  # (n,)
    per_sample = resid[:, None] * X  # (n, d+1)
    q = np.round(per_sample * GRAD_GRID).astype(np.int64)
    return len(y), q.sum(axis=0)


def train_logreg(
    ds,
    feature_cols: list[str],
    label_col: str,
    iters: int = 50,
    lr: float = 0.5,
    l2: float = 0.0,
) -> np.ndarray:
    """Fit weights (len(feature_cols) + 1, bias last) by full-batch
    gradient descent; bit-reproducible under any block layout.

    ``ds`` is materialized once so iterations re-read object-store
    blocks instead of re-running the scan (kmeans precedent)."""
    import ray

    d1 = len(feature_cols) + 1
    ds = ds.materialize()
    w = np.zeros(d1, dtype=np.float64)
    for _ in range(iters):
        w_ref = ray.put(w.copy())

        def block_grad(t: pa.Table, wref=w_ref) -> pa.Table:
            wv = ray.get(wref)
            X = _features(t, feature_cols)
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            n, g = grad_partial(X, y, wv)
            return pa.table(
                {
                    "n": pa.array([n], pa.int64()),
                    "g": pa.array([g.tolist()], pa.list_(pa.int64())),
                }
            )

        parts = (
            ds.map_batches(block_grad, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        n_total = 0
        g_total = np.zeros(d1, dtype=np.int64)
        for blk in ray.get(parts.to_arrow_refs()):
            if blk.num_rows == 0:
                continue
            n_total += int(np.sum(blk["n"].to_numpy(zero_copy_only=False)))
            g_total += np.sum(
                np.asarray(blk["g"].to_pylist(), dtype=np.int64), axis=0
            )
        if n_total == 0:
            raise ValueError("train_logreg: empty training set")
        grad = g_total.astype(np.float64) / GRAD_GRID / n_total + l2 * w
        w = w - lr * grad
    return w


def predict_logreg(ds, w: np.ndarray, feature_cols: list[str], out_col: str = "p_match"):
    """Stateless vectorized scoring pass: adds ``out_col`` (float64
    match probability) to every row.  The weights are closure-captured
    (tiny) — this is the streaming full-corpus path."""
    wv = np.asarray(w, dtype=np.float64)

    def score(t: pa.Table) -> pa.Table:
        p = _sigmoid(_features(t, feature_cols) @ wv)
        return t.append_column(out_col, pa.array(p, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")

"""One-pass dataset profiling — the pre-flight operator a 100-TB run
executes before committing cluster-hours to a pipeline: per column,
row count, null count, min/max, and approximate distinct count, all
from ONE streaming pass with O(columns × 2^p) driver state.

Shape: per-block partials (Arrow min/max + null_count + an HLL
register file per column — ``stages/sketches.py``) → tiny driver fold
(counts sum, min/min max/max, registers max).  Every fold is
commutative/associative, so the profile is partition-invariant; no
shuffle, no driver materialization of any data column.

Like the sketches this is an engine addition with no reference analog
and no faithful SQL form for the NDV column (pytest-pinned; the exact
columns are pinned against pandas ground truth)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketches import hash64_column, hll_batch_registers, hll_estimate


def profile_dataset(ds, columns=None, p: int = 12) -> pa.Table:
    """Profile ``columns`` (default: all) of a Dataset.

    Returns a pyarrow Table with one row per column:
    (column, dtype, count, null_count, approx_distinct, min, max) —
    min/max rendered as strings (the fold itself compares typed
    values, never their string forms)."""
    import ray
    import pyarrow.compute as pc

    schema = ds.schema()
    cols = list(columns) if columns is not None else list(schema.names)
    types = dict(zip(schema.names, schema.types))

    def partial(t: pa.Table) -> pa.Table:
        names, counts, nulls, mins, maxs, regs = [], [], [], [], [], []
        for c in cols:
            col = t[c] if c in t.schema.names else pa.nulls(t.num_rows)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            nv = col.drop_null()
            names.append(c)
            counts.append(t.num_rows)
            nulls.append(col.null_count)
            if len(nv):
                mins.append(pc.min(nv).as_py())
                maxs.append(pc.max(nv).as_py())
                regs.append(
                    hll_batch_registers(hash64_column(nv), p).tobytes()
                )
            else:
                mins.append(None)
                maxs.append(None)
                regs.append(b"")
        # typed min/max travel as columns of the ORIGINAL type so the
        # driver fold compares values, not reprs
        out = {
            "column": pa.array(names, pa.string()),
            "count": pa.array(counts, pa.int64()),
            "null_count": pa.array(nulls, pa.int64()),
            "registers": pa.array(regs, pa.binary()),
        }
        for i, c in enumerate(cols):
            out[f"__min_{i}"] = pa.array(
                [mins[i] if n == c else None for n in names], types[c]
            )
            out[f"__max_{i}"] = pa.array(
                [maxs[i] if n == c else None for n in names], types[c]
            )
        return pa.table(out)

    agg = {
        c: {"count": 0, "nulls": 0, "min": None, "max": None,
            "regs": np.zeros(1 << p, np.uint8)}
        for c in cols
    }
    for ref in ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).to_arrow_refs():
        t = ray.get(ref)
        if "registers" not in t.schema.names:
            continue
        names = t["column"].to_pylist()
        cnts = t["count"].to_pylist()
        nls = t["null_count"].to_pylist()
        blobs = t["registers"].to_pylist()
        for r, name in enumerate(names):
            i = cols.index(name)
            a = agg[name]
            a["count"] += cnts[r]
            a["nulls"] += nls[r]
            mn = t[f"__min_{i}"][r].as_py()
            mx = t[f"__max_{i}"][r].as_py()
            if mn is not None and (a["min"] is None or mn < a["min"]):
                a["min"] = mn
            if mx is not None and (a["max"] is None or mx > a["max"]):
                a["max"] = mx
            if blobs[r]:
                np.maximum(
                    a["regs"], np.frombuffer(blobs[r], np.uint8), out=a["regs"]
                )
    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "dtype": pa.array([str(types[c]) for c in cols], pa.string()),
            "count": pa.array([agg[c]["count"] for c in cols], pa.int64()),
            "null_count": pa.array([agg[c]["nulls"] for c in cols], pa.int64()),
            "approx_distinct": pa.array(
                [
                    int(round(hll_estimate(agg[c]["regs"])))
                    if agg[c]["count"] > agg[c]["nulls"]
                    else 0
                    for c in cols
                ],
                pa.int64(),
            ),
            "min": pa.array(
                [None if agg[c]["min"] is None else str(agg[c]["min"])
                 for c in cols],
                pa.string(),
            ),
            "max": pa.array(
                [None if agg[c]["max"] is None else str(agg[c]["max"])
                 for c in cols],
                pa.string(),
            ),
        }
    )


def profile_quantiles(ds, key_col: str, qs=(0.5, 0.95, 0.99),
                      k: int = 8192, columns=None, seed: int = 7) -> pa.Table:
    """One-pass approximate quantiles for EVERY numeric column at once:
    each block keeps the k rows with the smallest content-keyed
    priority (mix64 of ``key_col`` — partitioning/retries cannot
    change the draw), carrying all numeric columns of those rows; the
    driver merges to the global bottom-k ROW sample and reads each
    column's quantiles off it.  One streaming pass, no shuffle,
    O(k × columns) driver state; exact when the dataset has ≤ k rows.

    The single shared row sample is what makes this one pass — the
    per-column alternative (``sketches.approx_quantiles`` per column)
    costs a pass each.  Lower-nearest-rank, binomial
    O(sqrt(q(1-q)/k)) rank error per column.  Returns (column, q,
    value float64) sorted by (column, q); null values stay out of
    their column's quantile (tracked per column, not per row)."""
    import ray
    import pyarrow.compute as pc

    from ..functions.hashing import mix64

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    num_types = {pa.int8(), pa.int16(), pa.int32(), pa.int64(),
                 pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
                 pa.float16(), pa.float32(), pa.float64()}
    cols = [
        c for c in (columns if columns is not None else schema.names)
        if types[c] in num_types
    ]
    if not cols:
        raise ValueError("profile_quantiles: no numeric columns to profile")
    seed_h = mix64(np.uint64(seed))

    def partial(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [("pri", pa.uint64())] + [(c, pa.float64()) for c in cols]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        h = mix64(hash64_column(t[key_col]) ^ seed_h)
        vs = {
            c: pc.cast(t[c], pa.float64()).to_numpy(zero_copy_only=False)
            for c in cols
        }
        # the SAME total order as the driver fold (pri, then columns):
        # with duplicate keys the cutoff tie must resolve identically
        # on both sides or the sample depends on partitioning
        order = np.lexsort([vs[c] for c in reversed(cols)] + [h])[:k]
        arrays = {"pri": pa.array(h[order], pa.uint64())}
        for c in cols:
            arrays[c] = pa.array(vs[c][order], pa.float64())
        return pa.table(arrays)

    pris = np.zeros(0, np.uint64)
    vals = {c: np.zeros(0, np.float64) for c in cols}
    for ref in ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).to_arrow_refs():
        t = ray.get(ref)
        if "pri" not in t.schema.names or t.num_rows == 0:
            continue
        pris = np.concatenate([pris, t["pri"].to_numpy(zero_copy_only=False)])
        for c in cols:
            vals[c] = np.concatenate(
                [vals[c], t[c].to_numpy(zero_copy_only=False)]
            )
        if len(pris) > k:
            # total order for partition invariance: pri, then columns
            keys = [vals[c] for c in reversed(cols)] + [pris]
            order = np.lexsort(keys)[:k]
            pris = pris[order]
            for c in cols:
                vals[c] = vals[c][order]
    qs = [float(q) for q in qs]
    out_c, out_q, out_v = [], [], []
    for c in cols:
        v = np.sort(vals[c][~np.isnan(vals[c])])
        for q in qs:
            out_c.append(c)
            out_q.append(q)
            out_v.append(
                float(v[min(int(q * len(v)), len(v) - 1)]) if len(v) else None
            )
    return pa.table(
        {
            "column": pa.array(out_c, pa.string()),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        }
    )

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

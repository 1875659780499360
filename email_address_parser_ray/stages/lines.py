"""Corpus-wide frequent-line removal — the CCNet line-level dedup /
boilerplate scrub (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC: hash every normalized
line, drop repeated occurrences corpus-wide — nav menus, cookie
banners and footers are the bulk of what this removes from web text).

Distributed shape (the ``dedup_cut_spans`` discipline — only 16-24 B
line-hash rows and the sparse hit sliver ever shuffle; doc text
crosses the wire exactly once):

1. per batch, every line normalizes + hashes (siphash→mix64 per
   UNIQUE line); (h, n, first_ord) partials fold corpus-wide with
   ``sorted_group_agg`` (line hashes are an unbounded key) — ``n`` is
   the occurrence count, ``first_ord`` the min packed global ordinal
   (doc_id * 2^22 + line_idx), i.e. the canonical first occurrence;
2. a second pass re-emits (doc_id, line_idx, h, ord) occurrence rows
   and ``bucketed_semi_join``s them against the duplicated-hash set;
   with ``keep_first`` the canonical occurrence per hash is recomputed
   from the hit sliver itself (min-ord per hash inside one bucketed
   ``map_groups`` — the duplicated set's occurrences ARE the hits, so
   no join back to pass 1 is needed) and exempted from the cut;
3. ONE union-tag bucket shuffle co-locates each doc with its cut
   positions; affected docs drop those lines, clean docs pass through
   byte-identical.

Full-64-bit siphash line hashes stand in for line content (collision
odds ~n²/2⁶⁴); pytest pins a collision-free reference.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import mix64

_MAX_LINES = 1 << 22  # packed-ordinal budget: line_idx < 2^22, doc_id < 2^41


def _norm_default(line: str) -> str:
    return line.strip().lower()


def _line_rows(texts, doc_ids, normalize, sep="\n"):
    """(doc_idx_in_batch, line_idx, h) per NON-EMPTY normalized unit
    (line by default; paragraphs with ``sep="\n\n"``), plus the packed
    global ordinal.  Hashes computed once per unique normalized
    unit."""
    per_doc = [t.split(sep) for t in texts]
    lens = np.fromiter((len(r) for r in per_doc), np.int64, len(per_doc))
    flat = [normalize(ln) for r in per_doc for ln in r]
    lidx = (
        np.arange(int(lens.sum()), dtype=np.int64)
        - np.repeat(np.cumsum(lens) - lens, lens)
    )
    didx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    keep = np.fromiter((bool(s) for s in flat), bool, len(flat))
    flat = [s for s in flat if s]
    didx, lidx = didx[keep], lidx[keep]
    if len(flat) == 0:
        e = np.empty(0, np.int64)
        return e, e, np.empty(0, np.uint64), e
    arr = np.array(flat, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    # full-64-bit line hash (pandas fixed-key siphash, C speed): a
    # single crc32 carries only 32 bits of entropy, and corpus-wide
    # line counts hit crc32 birthday collisions from ~10^5 unique
    # lines on (one observed at the 50k-doc stress) — a collision
    # here CUTS an innocent line, so the exactness bar is the line
    # hash's, not a candidate stage's
    import pandas as pd

    uh = mix64(
        pd.util.hash_pandas_object(
            pd.Series(uniq, dtype=object), index=False
        ).to_numpy().astype(np.uint64)
    )
    hs = uh[inv]
    dids = np.asarray(doc_ids, np.int64)[didx]
    if lidx.size and int(lidx.max()) >= _MAX_LINES:
        raise ValueError(
            f"doc with >= {_MAX_LINES} lines: packed line ordinal overflows"
        )
    ords = dids * _MAX_LINES + lidx
    return dids, lidx, hs, ords


def remove_frequent_lines(docs_ds, min_count: int = 2, keep_first: bool = True,
                          normalize=_norm_default, n_buckets: int = 32,
                          sep: str = "\n"):
    """Remove every line whose normalized form occurs >= ``min_count``
    times corpus-wide.  ``keep_first=True`` (CCNet semantics) exempts
    the first occurrence in global (doc_id, line_idx) order — the
    surviving copy keeps its ORIGINAL bytes, normalization only decides
    identity.  Blank / whitespace-only lines are never counted or cut.

    ``sep`` picks the dedup unit: ``"\\n"`` (default) is the CCNet
    line/WET-paragraph grain; ``"\\n\\n"`` scrubs blank-line-separated
    PARAGRAPHS instead (repeated multi-line boilerplate blocks).

    Returns every input doc with the input column set, ``text``
    rewritten (surviving units re-joined with ``sep``), plus
    ``n_lines_cut``."""
    from .dedup import sorted_group_agg
    from .joins import bucketed_semi_join
    from .sketches import hash64_column
    from .pools import coalesce_small_blocks

    # heal fragmented materialized inputs (three passes, two shuffles)
    docs_ds = coalesce_small_blocks(docs_ds)

    def line_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "h": pa.array([], pa.uint64()),
                "n": pa.array([], pa.int64()),
            })
        _, _, hs, _ = _line_rows(
            t["text"].to_pylist(), t["doc_id"].to_numpy(zero_copy_only=False),
            normalize, sep,
        )
        uniq, cnt = np.unique(hs, return_counts=True)
        return pa.table({
            "h": pa.array(uniq, pa.uint64()),
            "n": pa.array(cnt, pa.int64()),
        })

    counts = sorted_group_agg(
        docs_ds.map_batches(line_counts, batch_format="pyarrow"),
        keys=["h"], aggs=[("n", "sum")],
    )
    dup_h = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_count)).select(["h"]),
        batch_format="pyarrow",
    )

    occ_schema = pa.schema([
        ("doc_id", pa.int64()), ("line_idx", pa.int64()),
        ("h", pa.uint64()), ("ord", pa.int64()),
    ])

    def occurrences(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return occ_schema.empty_table()
        dids, lidx, hs, ords = _line_rows(
            t["text"].to_pylist(), t["doc_id"].to_numpy(zero_copy_only=False),
            normalize, sep,
        )
        return pa.table({
            "doc_id": pa.array(dids, pa.int64()),
            "line_idx": pa.array(lidx, pa.int64()),
            "h": pa.array(hs, pa.uint64()),
            "ord": pa.array(ords, pa.int64()),
        })

    hits = bucketed_semi_join(
        docs_ds.map_batches(occurrences, batch_format="pyarrow"),
        dup_h, on="h", n_buckets=n_buckets,
    )

    cut_schema = pa.schema([("doc_id", pa.int64()), ("line_idx", pa.int64())])

    if keep_first:
        # canonical = min ord per hash, recomputed from the hit sliver
        # (hits ARE every occurrence of every duplicated line)
        def bucket_of_h(t: pa.Table) -> pa.Table:
            b = (hash64_column(t["h"]) % np.uint64(n_buckets)).astype(np.int64)
            return t.append_column("__hbucket", pa.array(b, pa.int64()))

        def drop_canonical(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return cut_schema.empty_table()
            hs = t["h"].to_numpy(zero_copy_only=False)
            ords = t["ord"].to_numpy(zero_copy_only=False)
            order = np.argsort(hs, kind="stable")
            hs_s, ords_s = hs[order], ords[order]
            starts = np.flatnonzero(np.r_[True, hs_s[1:] != hs_s[:-1]])
            min_ord = np.minimum.reduceat(ords_s, starts)
            seg = np.zeros(len(hs_s), np.int64)
            seg[starts] = 1
            seg = np.cumsum(seg) - 1
            cut = ords_s != min_ord[seg]
            keep_rows = order[cut]
            out = t.take(pa.array(np.sort(keep_rows)))
            return out.select(["doc_id", "line_idx"])

        cuts = (
            hits.map_batches(bucket_of_h, batch_format="pyarrow")
            .groupby("__hbucket")
            .map_groups(drop_canonical, batch_format="pyarrow")
        )
    else:
        cuts = hits.select_columns(["doc_id", "line_idx"])

    ds_schema = docs_ds.schema()
    doc_cols = list(ds_schema.names)
    types = dict(zip(ds_schema.names, ds_schema.types))
    out_schema = pa.schema(
        [(c, types[c]) for c in doc_cols] + [("n_lines_cut", pa.int64())]
    )

    def tag(is_doc):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            b = (hash64_column(t["doc_id"]) % np.uint64(n_buckets)).astype(
                np.int64
            )
            arrays = {
                "__bucket": pa.array(b, pa.int64()),
                "__is_doc": pa.array([is_doc] * n, pa.bool_()),
            }
            for c in doc_cols:
                arrays[c] = t[c] if c in t.schema.names else pa.nulls(n, types[c])
            arrays["line_idx"] = (
                pc.cast(t["line_idx"], pa.int64())
                if "line_idx" in t.schema.names
                else pa.nulls(n, pa.int64())
            )
            return pa.table(arrays)

        return f

    both = docs_ds.map_batches(tag(True), batch_format="pyarrow").union(
        cuts.map_batches(tag(False), batch_format="pyarrow")
    )

    def rewrite(t: pa.Table) -> pa.Table:
        is_doc = pc.fill_null(t["__is_doc"], False)
        dt = t.filter(is_doc)
        if dt.num_rows == 0:
            return out_schema.empty_table()
        ht = t.filter(pc.invert(is_doc))
        zeros = pa.array(np.zeros(dt.num_rows, np.int64), pa.int64())
        if ht.num_rows == 0:
            return dt.select(doc_cols).append_column("n_lines_cut", zeros)
        h_did = ht["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h_idx = ht["line_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(h_did, kind="stable")
        h_did, h_idx = h_did[order], h_idx[order]
        starts = np.flatnonzero(np.r_[True, h_did[1:] != h_did[:-1]])
        ends = np.r_[starts[1:], len(h_did)]
        idx_by_doc = {int(h_did[s]): h_idx[s:e] for s, e in zip(starts, ends)}
        d_ids = dt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = dt["text"].to_pylist()
        n_cut = np.zeros(len(texts), np.int64)
        for i, did in enumerate(d_ids):
            cut_idx = idx_by_doc.get(int(did))
            if cut_idx is None:
                continue
            lines = texts[i].split(sep)
            mask = np.zeros(len(lines), bool)
            mask[cut_idx] = True
            n_cut[i] = int(mask.sum())
            texts[i] = sep.join(
                ln for ln, c in zip(lines, mask) if not c
            )
        arrays = {c: dt[c] for c in doc_cols}
        arrays["text"] = pa.array(texts, types["text"])
        arrays["n_lines_cut"] = pa.array(n_cut, pa.int64())
        return pa.table(arrays).cast(out_schema)

    return both.groupby("__bucket").map_groups(rewrite, batch_format="pyarrow")

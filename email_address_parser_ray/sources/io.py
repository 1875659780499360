"""Source / sink adapters.

The engine's canonical input is sharded Parquet (``transcripts/``), but
ingestion also accepts CSV and JSON-lines drops of the same schema —
``read_transcripts_any`` normalizes all three to the canonical Arrow
schema (conv_id string, turn_idx int32, role/text/tool string,
ts timestamp[us]).

The sink side is the resumable layout the north rule asks for:
``write_partitioned`` writes one directory per key-hash partition with
an atomic per-partition publish + manifest, so a failed export reruns
only the missing partitions.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import List

import pyarrow as pa
import pyarrow.compute as pc

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _normalize(batch: pa.Table) -> pa.Table:
    cols = {}
    for field in TRANSCRIPT_SCHEMA:
        col = batch[field.name]
        if col.type != field.type:
            col = pc.cast(col, field.type)
        cols[field.name] = col
    return pa.table(cols)


def md5_partition(value, n_partitions: int) -> int:
    """Deterministic cross-engine partition hash: the low 8 little-endian
    bytes of md5(str(value)) mod ``n_partitions`` — bit-identical to
    DuckDB's ``md5_number_lower(value) % n`` so partition row counts are
    SQL-oracle-checkable, and stable across processes/machines (no
    PYTHONHASHSEED, no pandas version dependence)."""
    import hashlib

    digest = hashlib.md5(str(value).encode("utf-8")).digest()
    return int.from_bytes(digest[8:], "little") % n_partitions


def fast_partition(col, n_partitions: int):
    """Vectorized production partitioner: pandas' stable C-speed
    string/int hash (siphash with a fixed key — no PYTHONHASHSEED, no
    per-row Python) → splitmix64 finisher → mod n.  Deterministic
    across processes, retries and cluster size, so a resumed export
    routes every row to the same partition it had before the failure.
    The md5 path stays the cross-engine SQL-replayable oracle —
    same two-path precedent as ``fast_hash_sample`` vs ``hash_sample``
    (stages/sampling.py)."""
    import numpy as np
    import pandas as pd

    from ..functions.hashing import mix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = pd.util.hash_pandas_object(col.to_pandas(), index=False).to_numpy()
    part = mix64(h.astype(np.uint64)) % np.uint64(n_partitions)
    return pa.array(part.astype(np.int64), pa.int64())


def _strip_meta(batch: pa.Table) -> pa.Table:
    return batch.replace_schema_metadata(None)


def read_parquet_clean(path: str, columns=None, **kwargs):
    """``read_parquet`` with an explicit metadata-free schema.

    The driver's testdata parquet carries ``b'pandas'`` schema metadata,
    which makes ``pyarrow.Schema`` unhashable and defeats Ray Data's
    shuffle schema deduplication (every read/reduce task logs ``Failed
    to hash the schemas`` and re-ships the schema per block).  Passing
    the pruned file schema with metadata stripped fixes it at the read."""
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    f = path
    if os.path.isdir(path):
        cand = sorted(glob.glob(os.path.join(path, "*.parquet")))
        f = cand[0] if cand else None
    schema = None
    if f is not None and os.path.exists(f):
        fs = pq.read_schema(f).remove_metadata()
        schema = pa.schema([fs.field(c) for c in columns]) if columns else fs
    ds = rd.read_parquet(path, columns=columns, schema=schema, **kwargs)
    if schema is None:
        ds = ds.map_batches(_strip_meta, batch_format="pyarrow")
    return ds


def read_transcripts_any(path: str, fmt: str = "parquet", columns=None):
    """Read transcripts from parquet (default), csv, or json-lines, cast
    to the canonical schema.  Column pruning applies after the format
    decode for csv/json (parquet prunes at the read).

    ``.gz``-suffixed csv/json paths decode transparently (web corpora
    ship as .jsonl.gz): the compression is passed to Arrow's stream
    opener, so decompression happens inside each read task — streamed,
    never driver-side."""
    import ray.data as rd

    gz = {}
    if str(path).endswith(".gz") or str(path).endswith(".gzip"):
        gz = {
            "arrow_open_stream_args": {"compression": "gzip"},
            "file_extensions": None,
        }
    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=columns)
    elif fmt == "csv":
        ds = rd.read_csv(path, **gz)
    elif fmt == "json":
        ds = rd.read_json(path, **gz)
    else:
        raise ValueError(f"unknown transcript format: {fmt}")
    if fmt != "parquet":
        ds = ds.map_batches(_normalize, batch_format="pyarrow")
        if columns:
            ds = ds.select_columns(columns)
    return ds


def write_partitioned(
    ds, out_dir: str, key: str, n_partitions: int = 16, partitioner: str = "md5"
) -> List[dict]:
    """Resumable partitioned Parquet sink — fully streaming.

    Rows are hash-partitioned on ``key`` into ``n_partitions``
    directories (``part=K/``) by ``partitioner``: ``"md5"`` (default)
    is the per-row SQL-replayable oracle hash (``md5_partition``);
    ``"mix64"`` is the vectorized production path (``fast_partition``
    — no per-row Python on the export stream).  Both are content-keyed
    and deterministic across reruns, so resume semantics are identical;
    a rerun must pass the SAME partitioner it started with (the layouts
    differ).  The write itself is Ray Data's native
    hive-partitioned ``write_parquet`` (one fragment file per block per
    partition — no task ever holds a whole partition, so a partition can
    exceed worker memory).  Finalization then publishes each pending
    partition atomically (rename) with a tiny manifest whose row count
    comes from parquet footers; partitions whose manifest already exists
    are SKIPPED UPSTREAM (filtered out of the write), so a rerun after a
    failure streams only the missing key ranges.  Returns the
    per-partition manifests.
    """
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    todo = {
        k
        for k in range(n_partitions)
        if not os.path.exists(os.path.join(out_dir, f"part={k}", "manifest.json"))
    }
    if todo:
        todo_arr = pa.array(sorted(todo), pa.int64())

        if partitioner not in ("md5", "mix64"):
            raise ValueError(f"unknown partitioner: {partitioner!r}")

        def add_part(batch: pa.Table) -> pa.Table:
            if partitioner == "mix64":
                part = fast_partition(batch[key], n_partitions)
            else:
                part = pa.array(
                    [md5_partition(v, n_partitions) for v in batch[key].to_pylist()],
                    pa.int64(),
                )
            return batch.append_column("__part", part).filter(
                pc.is_in(part, value_set=todo_arr)
            )

        tmp_root = os.path.join(out_dir, f"_inflight.{os.getpid()}")
        shutil.rmtree(tmp_root, ignore_errors=True)
        ds.map_batches(add_part, batch_format="pyarrow").write_parquet(
            tmp_root, partition_cols=["__part"]
        )
        for k in sorted(todo):
            src = os.path.join(tmp_root, f"__part={k}")
            pdir = os.path.join(out_dir, f"part={k}")
            shutil.rmtree(pdir, ignore_errors=True)
            if not os.path.isdir(src):
                os.makedirs(src, exist_ok=True)  # empty partition: publish 0 rows
            rows = sum(
                pq.read_metadata(f).num_rows
                for f in glob.glob(os.path.join(src, "*.parquet"))
            )
            # manifest written inside BEFORE the atomic rename publishes it
            with open(os.path.join(src, "manifest.json"), "w") as f:
                json.dump({"part": k, "rows": rows, "key": key}, f)
            os.rename(src, pdir)
        shutil.rmtree(tmp_root, ignore_errors=True)
    manifests = []
    for k in range(n_partitions):
        mp = os.path.join(out_dir, f"part={k}", "manifest.json")
        if os.path.exists(mp):
            with open(mp) as f:
                manifests.append(json.load(f))
    return manifests


def eval_train_split(docs_ds, modulus: int = 97):
    """Deterministic (train, eval) split by ``doc_id % modulus == 0`` —
    the bench/stress convention for synthesizing an eval corpus from
    the documents table (content-keyed: partitioning cannot move a doc
    across the split).  One definition so the three harnesses that
    need it cannot drift."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def part(keep_eval):
        def f(t):
            m = pc.equal(
                pc.subtract(
                    t["doc_id"],
                    pc.multiply(
                        pc.divide(t["doc_id"], modulus),
                        pa.scalar(modulus, pa.int64()),
                    ),
                ),
                pa.scalar(0, pa.int64()),
            )
            return t.filter(m if keep_eval else pc.invert(m))

        return f

    return (
        docs_ds.map_batches(part(False), batch_format="pyarrow"),
        docs_ds.map_batches(part(True), batch_format="pyarrow"),
    )

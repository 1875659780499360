"""Per-stage Parquet checkpoints with lineage manifests (resume support).

North-rule requirement: "every stage checkpoints per-partition lineage
and counters to Parquet so runs resume idempotently".  Model:

* each stage writes its output as a directory of Parquet part files
  under ``<root>/<stage>/data/`` (written to a temp dir, then atomically
  renamed — retries can never publish a half-written stage);
* a ``manifest.json`` records the stage name, an *input fingerprint*
  (hash of upstream manifests + config), the output row count, per-file
  row counts (the per-partition lineage/counters), and the schema;
* ``run_stage`` skips recompute when a manifest exists whose fingerprint
  matches — so a rerun of the whole pipeline fast-forwards through
  finished stages and resumes at the first stale/missing one.

The reference has no runtime persistence at all (SURVEY §4.1); this
module is pure engine infrastructure.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Callable, Optional

import pyarrow.parquet as pq


def fingerprint(*parts: object) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _manifest_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, "manifest.json")


def load_manifest(root: str, stage: str) -> Optional[dict]:
    try:
        with open(_manifest_path(root, stage)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def run_stage(root: str, stage: str, input_fp: str, build: Callable[[], "object"]):
    """Compute-or-resume one pipeline stage.

    ``build()`` must return a ray.data.Dataset; its output is persisted
    under ``root/stage/data`` and re-read lazily (so downstream stages
    stream from Parquet rather than holding the object-store blocks).
    Returns (dataset, manifest_dict).
    """
    import ray.data as rd

    man = load_manifest(root, stage)
    data_dir = os.path.join(root, stage, "data")
    if man is not None and man.get("input_fp") == input_fp and os.path.isdir(data_dir):
        return rd.read_parquet(data_dir), man

    ds = build()
    tmp = data_dir + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    shutil.rmtree(data_dir, ignore_errors=True)
    os.makedirs(os.path.dirname(data_dir), exist_ok=True)
    os.rename(tmp, data_dir)

    files = sorted(
        f for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    partitions = []
    total = 0
    for f in files:
        md = pq.ParquetFile(os.path.join(data_dir, f)).metadata
        partitions.append({"file": f, "rows": md.num_rows})
        total += md.num_rows
    man = {
        "stage": stage,
        "input_fp": input_fp,
        "rows": total,
        "partitions": partitions,
        "schema": [str(c) for c in pq.ParquetFile(
            os.path.join(data_dir, files[0])
        ).schema_arrow] if files else [],
    }
    mp = _manifest_path(root, stage)
    with open(mp + ".tmp", "w") as f:
        json.dump(man, f, indent=1)
    os.replace(mp + ".tmp", mp)
    return rd.read_parquet(data_dir), man

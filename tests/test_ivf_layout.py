"""End-to-end IVF index layout: build (k-means cells → cell-
partitioned parquet), pruned probing, recall vs brute force, resume
semantics, and build determinism under repartitioning.

Approximate by design at nprobe < cells — pinned here, not
SQL-oracled (the established pattern for ANN); at nprobe == cells the
probe is exhaustive and row-equality with brute_force_topk is exact."""

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from email_address_parser_ray.stages.ann import (
    brute_force_topk,
    ivf_build,
    ivf_probe_cells,
    ivf_probe_topk,
)


def _blob_embeddings(n_per=60, k=5, d=16, seed=3):
    """Clustered blobs so IVF cells are meaningful."""
    rng = np.random.RandomState(seed)
    centers = rng.normal(scale=4.0, size=(k, d))
    rows = []
    for c in range(k):
        pts = centers[c] + rng.normal(scale=0.4, size=(n_per, d))
        rows.append(pts)
    m = np.concatenate(rows)
    return m


def _emb_ds(m, blocks=4):
    import ray.data as rd

    t = pa.table(
        {
            "vec_id": pa.array(range(len(m)), pa.int64()),
            "embedding": pa.array([row.tolist() for row in m]),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


@pytest.fixture()
def index(ray_session, tmp_path):
    m = _blob_embeddings()
    ds = _emb_ds(m)
    out = str(tmp_path / "ivf")
    manifests = ivf_build(ds, out, k=5, iters=2)
    return m, ds, out, manifests


def _rows(res):
    df = res.to_pandas().sort_values(
        ["cos_e4", "vec_id"], ascending=[False, True]
    )
    return list(zip(df["vec_id"], df["cos_e4"]))


def test_ivf_exhaustive_probe_equals_brute(index):
    m, ds, out, manifests = index
    assert sum(man["rows"] for man in manifests) == len(m)
    q = m[7] + 0.01
    exact = _rows(brute_force_topk(ds, q, k=10))
    got = _rows(ivf_probe_topk(out, q, k=10, nprobe=5))
    assert got == exact


def test_ivf_low_nprobe_recall_and_pruned_bytes(index):
    m, ds, out, _ = index
    hits = 0
    for qi in (3, 77, 141, 200, 288):
        q = m[qi]
        exact = {v for v, _ in _rows(brute_force_topk(ds, q, k=10))}
        got = {v for v, _ in _rows(ivf_probe_topk(out, q, k=10, nprobe=1))}
        hits += len(exact & got)
    # blobs are well-separated: nprobe=1 should recover nearly all
    assert hits >= 0.9 * 50
    # pruning evidence: the probe dataset lists only the probed cell's
    # files, not the index's
    import ray.data as rd

    cell = ivf_probe_cells(out, m[3], 1)[0]
    probed = rd.read_parquet(
        os.path.join(out, f"cell={cell}"),
        columns=["vec_id"],
        file_extensions=["parquet"],
    )
    all_files = glob.glob(os.path.join(out, "cell=*", "*.parquet"))
    assert set(probed.input_files()) < set(all_files)


def test_ivf_resume_skips_finished_cells(index):
    m, ds, out, manifests = index
    mtimes = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(out, "cell=*", "*.parquet"))
    }
    again = ivf_build(ds, out, k=5, iters=2)
    assert again == manifests
    # nothing rewritten
    assert all(os.path.getmtime(p) == t for p, t in mtimes.items())
    # blow away one cell: only that cell is rebuilt
    victim = os.path.join(out, "cell=2")
    shutil.rmtree(victim)
    rebuilt = ivf_build(ds, out, k=5, iters=2)
    assert rebuilt == manifests
    untouched = {
        p: os.path.getmtime(p)
        for p in mtimes
        if not p.startswith(victim)
    }
    assert all(os.path.getmtime(p) == t for p, t in untouched.items())


def test_ivf_build_partition_invariant(ray_session, tmp_path):
    m = _blob_embeddings(seed=9)
    out1, out8 = str(tmp_path / "a"), str(tmp_path / "b")
    ivf_build(_emb_ds(m, blocks=1), out1, k=4, iters=2)
    ivf_build(_emb_ds(m, blocks=8), out8, k=4, iters=2)
    c1 = json.load(open(os.path.join(out1, "centroids.json")))
    c8 = json.load(open(os.path.join(out8, "centroids.json")))
    assert c1 == c8
    for c in range(4):
        m1 = json.load(open(os.path.join(out1, f"cell={c}", "manifest.json")))
        m8 = json.load(open(os.path.join(out8, f"cell={c}", "manifest.json")))
        assert m1 == m8


def test_ivf_k_mismatch_raises(index, tmp_path):
    m, ds, out, _ = index
    with pytest.raises(ValueError):
        ivf_build(ds, out, k=7)


def test_ivf_add_incremental_equals_rebuild(index, tmp_path):
    """ivf_add: append new vectors to the existing cells; probing the
    grown index == brute force over the union; a retried add with the
    same tag is a no-op."""
    from email_address_parser_ray.stages.ann import ivf_add

    m, ds, out, _ = index
    rng = np.random.RandomState(77)
    new = m[:40] + rng.normal(scale=0.05, size=(40, m.shape[1]))
    new_t = pa.table(
        {
            "vec_id": pa.array(range(len(m), len(m) + 40), pa.int64()),
            "embedding": pa.array([r.tolist() for r in new]),
        }
    )
    import ray.data as rd

    new_ds = rd.from_arrow(new_t).repartition(2)
    manifests = ivf_add(new_ds, out, add_tag="day1")
    assert sum(man["rows"] for man in manifests) == len(m) + 40

    union = _emb_ds(np.concatenate([m, new]))
    q = m[11] - 0.02
    exact = _rows(brute_force_topk(union, q, k=10))
    got = _rows(ivf_probe_topk(out, q, k=10, nprobe=5))
    assert got == exact

    # retry with the same tag: no duplicates, manifests unchanged
    again = ivf_add(new_ds, out, add_tag="day1")
    assert again == manifests
    assert _rows(ivf_probe_topk(out, q, k=10, nprobe=5)) == exact


def test_ivf_build_clears_crashed_attempt_orphans(ray_session, tmp_path):
    """A crashed build leaves fragments in an unmanifested cell dir; a
    rerun must REPLACE them (stage-then-publish), never append."""
    import pyarrow.parquet as pq

    m = _blob_embeddings(seed=21)
    ds = _emb_ds(m)
    out = str(tmp_path / "ivf")
    ivf_build(ds, out, k=4, iters=1)
    # simulate the crash: fabricate an orphan fragment + drop the manifest
    victim = os.path.join(out, "cell=1")
    orphan = pa.table(
        {"vec_id": pa.array([999999], pa.int64()),
         "embedding": pa.array([m[0].tolist()])}
    )
    pq.write_table(orphan, os.path.join(victim, "orphan.parquet"))
    os.remove(os.path.join(victim, "manifest.json"))
    manifests = ivf_build(ds, out, k=4, iters=1)
    assert sum(man["rows"] for man in manifests) == len(m)
    frags = glob.glob(os.path.join(victim, "*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in frags])
    assert 999999 not in t["vec_id"].to_pylist()


def test_ivf_add_retry_after_crash_mid_publish(index):
    """Crash AFTER fragments were published but BEFORE the done-marker:
    the retry must sweep this tag's partially-published fragments and
    republish — never append duplicates (Ray names fragments randomly,
    so a blind republish would double-count)."""
    from email_address_parser_ray.stages.ann import ivf_add, ivf_probe_topk

    m, ds, out, _ = index
    new_t = pa.table(
        {
            "vec_id": pa.array(range(len(m), len(m) + 10), pa.int64()),
            "embedding": pa.array([(m[i] + 0.01).tolist() for i in range(10)]),
        }
    )
    import ray.data as rd

    new_ds = rd.from_arrow(new_t).repartition(2)
    manifests = ivf_add(new_ds, out, add_tag="crashy")
    total = sum(man["rows"] for man in manifests)
    assert total == len(m) + 10
    # simulate the crash: fragments live, marker missing
    os.remove(os.path.join(out, "add_crashy.done"))
    retried = ivf_add(new_ds, out, add_tag="crashy")
    assert sum(man["rows"] for man in retried) == total  # no duplicates
    got = ivf_probe_topk(out, m[0], k=10, nprobe=5).to_pandas()
    assert got["vec_id"].is_unique

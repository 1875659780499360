"""SemDeDup semantic dedup: matches a pure-numpy reference end-to-end
(same integer-grid centroids), keeps exactly one representative per
planted duplicate group via the lowest-centroid-sim rule, is
partition-invariant, and the per-cell O(n^2) guard raises."""

import numpy as np
import pyarrow as pa
import pytest

from email_address_parser_ray.stages.ann import semantic_dedup
from email_address_parser_ray.stages.kmeans import kmeans_fit


def _emb_table(vecs):
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [np.asarray(v, np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
        }
    )


def _ds(vecs, blocks=4):
    import ray.data as rd

    return rd.from_arrow(_emb_table(vecs)).repartition(blocks)


def _planted(seed=7, d=16, groups=6, dup_sizes=(3, 3, 2, 1, 1, 1)):
    """Well-separated base directions; the first few get near-identical
    copies (semantic duplicates), the rest are singletons."""
    rng = np.random.RandomState(seed)
    bases = rng.normal(size=(groups, d))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    vecs, gid = [], []
    for g, sz in enumerate(dup_sizes):
        for _ in range(sz):
            v = bases[g] + rng.normal(scale=1e-3, size=d)  # cos ~ 0.999998
            vecs.append(v.astype(np.float32))
            gid.append(g)
    return vecs, np.array(gid)


def _norm(m):
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _ref_semdedup(vecs, cents_e6, eps):
    """Numpy reference of the whole algorithm given fitted centroids."""
    M = np.stack([np.asarray(v, np.float32) for v in vecs]).astype(np.float64)
    cents = np.asarray(cents_e6, np.int64).astype(np.float64) / 1e6
    d2 = (
        (M * M).sum(1)[:, None] - 2.0 * (M @ cents.T) + (cents * cents).sum(1)[None, :]
    )
    cell = d2.argmin(1)
    mn_all, cn = _norm(M), _norm(cents)
    cent_sim_e6 = np.floor((mn_all * cn[cell]).sum(1) * 1e6).astype(np.int64)
    n = len(vecs)
    keep = np.ones(n, bool)
    for c in np.unique(cell):
        idx = np.where(cell == c)[0]
        mn = mn_all[idx]
        adj = (mn @ mn.T) >= 1.0 - eps
        # components by repeated boolean closure (tiny n)
        comp = np.arange(len(idx))
        for _ in range(len(idx)):
            prev = comp.copy()
            for i in range(len(idx)):
                comp[i] = comp[adj[i]].min()
            if np.array_equal(prev, comp):
                break
        for g in np.unique(comp):
            mem = idx[comp == g]
            if len(mem) > 1:
                order = sorted(mem, key=lambda i: (cent_sim_e6[i], i))
                keep[order[1:]] = False
    return cell, cent_sim_e6, keep


def test_matches_numpy_reference(ray_session):
    vecs, _ = _planted()
    cents = kmeans_fit(_ds(vecs), k=4, iters=2)
    cell_r, sim_r, keep_r = _ref_semdedup(vecs, cents, eps=0.03)
    got = (
        semantic_dedup(_ds(vecs), k=4, iters=2, eps=0.03)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (got["cell"].to_numpy() == cell_r).all()
    assert (got["cent_sim_e6"].to_numpy() == sim_r).all()
    assert (got["keep"].to_numpy() == keep_r).all()


def test_drops_planted_duplicates_keeps_singletons(ray_session):
    vecs, gid = _planted()
    # k=2: cells coarser than the planted groups, so no duplicate group
    # straddles a cell boundary (at k>=3 this seed splits group 0 across
    # two cells and both halves keep a member — the documented
    # duplicates-don't-span-cells property, not a bug)
    got = (
        semantic_dedup(_ds(vecs), k=2, iters=2, eps=0.03)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # one survivor per planted group (groups are far apart: cosine of
    # distinct random directions in d=16 is << 1-eps)
    for g in np.unique(gid):
        assert got["keep"][gid == g].sum() == 1, g
    # and the survivor of each multi-member group has the group's
    # lowest (cent_sim_e6, vec_id)
    for g in np.unique(gid):
        mem = np.where(gid == g)[0]
        if len(mem) > 1:
            kept = mem[got["keep"][mem].to_numpy()][0]
            best = min(mem, key=lambda i: (got["cent_sim_e6"][i], i))
            assert kept == best


def test_partition_invariant(ray_session):
    vecs, _ = _planted(seed=11, dup_sizes=(4, 2, 2, 1, 1, 1))
    a = (
        semantic_dedup(_ds(vecs, blocks=1), k=3, iters=2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        semantic_dedup(_ds(vecs, blocks=7), k=3, iters=2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    for col in ("cell", "cent_sim_e6", "keep"):
        assert (a[col] == b[col]).all(), col


def test_ivf_variant_matches_inmemory(ray_session, tmp_path):
    """The shuffle-free persisted-IVF path returns exactly the
    in-memory result when the index was built with the same fit."""
    from email_address_parser_ray.stages.ann import ivf_build, semantic_dedup_ivf

    vecs, _ = _planted(seed=13, dup_sizes=(3, 2, 2, 1, 1, 1))
    idx = str(tmp_path / "ivf")
    ivf_build(_ds(vecs), idx, k=3, iters=2)
    a = (
        semantic_dedup(_ds(vecs), k=3, iters=2, eps=0.03)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        semantic_dedup_ivf(idx, eps=0.03)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert (~b["keep"]).sum() > 0  # the fixture really has duplicates


def test_ivf_incremental_add_matches_fresh(ray_session, tmp_path):
    """Incremental add re-resolves only touched cells and equals the
    fresh full resolve on the grown index."""
    import ray.data as rd

    from email_address_parser_ray.stages.ann import (
        ivf_build,
        semantic_dedup_ivf,
        semantic_dedup_ivf_add,
    )

    vecs, _ = _planted(seed=29, dup_sizes=(3, 2, 2, 1, 1, 1))
    base, delta_vecs = vecs[:7], vecs[7:]
    idx = str(tmp_path / "ivf_inc")
    ivf_build(_ds(base), idx, k=3, iters=2)
    prev = semantic_dedup_ivf(idx).materialize()
    delta = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(7, 7 + len(delta_vecs)), pa.int64()),
                "embedding": pa.array(
                    [np.asarray(v, np.float32) for v in delta_vecs],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    inc = (
        semantic_dedup_ivf_add(delta, idx, "t1", prev)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    fresh = (
        semantic_dedup_ivf(idx)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert inc.equals(fresh)
    assert len(inc) == len(vecs)
    # a retried add with the same tag is a no-op and still matches
    inc2 = (
        semantic_dedup_ivf_add(delta, idx, "t1", prev)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert inc2.equals(fresh)


def test_ivf_retract_promotes_and_matches_fresh(ray_session, tmp_path):
    """Retracting a duplicate group's KEPT member promotes the next
    member, identically to a fresh resolve of the shrunken index."""
    import ray.data as rd

    from email_address_parser_ray.stages.ann import (
        ivf_build,
        semantic_dedup_ivf,
        semantic_dedup_ivf_retract,
    )

    vecs, gid = _planted(seed=47)
    idx = str(tmp_path / "ivf_ret")
    ivf_build(_ds(vecs), idx, k=2, iters=2)
    prev = semantic_dedup_ivf(idx).materialize()
    pdf = prev.to_pandas().sort_values("vec_id").reset_index(drop=True)
    group0 = np.where(gid == 0)[0]  # a 3-member duplicate group
    kept0 = int(group0[pdf["keep"][group0].to_numpy()][0])
    removed = rd.from_arrow(
        pa.table({"vec_id": pa.array([kept0], pa.int64())})
    )
    inc = (
        semantic_dedup_ivf_retract(removed, idx, "r1", prev)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    fresh = (
        semantic_dedup_ivf(idx)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert inc.equals(fresh)
    assert kept0 not in set(inc["vec_id"])
    remaining = [i for i in group0 if i != kept0]
    sub = inc[inc["vec_id"].isin(remaining)]
    assert sub["keep"].sum() == 1  # the group still keeps exactly one
    # a retried retract with the same tag is a no-op and still matches
    inc2 = (
        semantic_dedup_ivf_retract(removed, idx, "r1", prev)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert inc2.equals(fresh)


def test_ivf_add_then_retract_equals_never_added(ray_session, tmp_path):
    import ray.data as rd

    from email_address_parser_ray.stages.ann import (
        ivf_build,
        semantic_dedup_ivf,
        semantic_dedup_ivf_add,
        semantic_dedup_ivf_retract,
    )

    vecs, _ = _planted(seed=53)
    base, delta_vecs = vecs[:7], vecs[7:]
    idx = str(tmp_path / "ivf_rt")
    ivf_build(_ds(base), idx, k=2, iters=2)
    prev = semantic_dedup_ivf(idx).materialize()
    base_df = prev.to_pandas().sort_values("vec_id").reset_index(drop=True)
    delta_ids = list(range(7, 7 + len(delta_vecs)))
    delta = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(delta_ids, pa.int64()),
                "embedding": pa.array(
                    [np.asarray(v, np.float32) for v in delta_vecs],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    grown = semantic_dedup_ivf_add(delta, idx, "t1", prev).materialize()
    removed = rd.from_arrow(
        pa.table({"vec_id": pa.array(delta_ids, pa.int64())})
    )
    back = (
        semantic_dedup_ivf_retract(removed, idx, "r1", grown)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert back.equals(base_df)  # retract(add(X)) == never-added


def test_ivf_add_mixed_producer_schema(ray_session, tmp_path):
    """An index built from parquet (list child field "element") grown
    with a Ray-rebuilt delta (child field "item") must stay readable:
    ivf_add pins new fragments to the live schema."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from email_address_parser_ray.stages.ann import (
        ivf_build,
        semantic_dedup_ivf,
        semantic_dedup_ivf_add,
    )

    vecs, _ = _planted(seed=41)
    src = str(tmp_path / "src.parquet")
    # parquet round-trip renames the list child to "element"
    pq.write_table(_emb_table(vecs[:7]), src)
    idx = str(tmp_path / "ivf_mixed")
    ivf_build(rd.read_parquet(src), idx, k=2, iters=1)
    prev = semantic_dedup_ivf(idx).materialize()
    # a Ray row-filter rebuilds blocks with the Arrow-default "item"
    delta = _ds(vecs, blocks=2).filter(lambda r: r["vec_id"] >= 7)
    inc = (
        semantic_dedup_ivf_add(delta, idx, "mix", prev)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    fresh = (
        semantic_dedup_ivf(idx)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert inc.equals(fresh)
    assert len(inc) == len(vecs)


def test_ivf_variant_guard_raises(ray_session, tmp_path):
    from email_address_parser_ray.stages.ann import ivf_build, semantic_dedup_ivf

    vecs, _ = _planted()
    idx = str(tmp_path / "ivf_g")
    ivf_build(_ds(vecs), idx, k=1, iters=1)
    with pytest.raises(Exception, match="max_cell_rows"):
        semantic_dedup_ivf(idx, max_cell_rows=3).materialize()


def test_noncontiguous_vec_ids(ray_session):
    """kmeans seeding (and so semantic_dedup) must work on any id set
    — a survivor-filtered table has holes and need not start at 0."""
    import ray.data as rd

    vecs, gid = _planted(seed=61)
    tbl = pa.table(
        {
            "vec_id": pa.array([100 + 3 * i for i in range(len(vecs))], pa.int64()),
            "embedding": pa.array(
                [np.asarray(v, np.float32) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    got = (
        semantic_dedup(rd.from_arrow(tbl).repartition(4), k=2, iters=2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert len(got) == len(vecs)
    for g in np.unique(gid):
        assert got["keep"][gid == g].sum() == 1, g


def test_chunked_pairwise_matches_unchunked(monkeypatch):
    """The row-chunked similarity scan is exact: forcing a tiny chunk
    changes nothing (kernel-level — a Ray worker would not see the
    monkeypatch)."""
    from email_address_parser_ray.stages import ann as ann_mod

    vecs, _ = _planted(seed=67)
    mn = _norm(np.stack(vecs).astype(np.float64))
    ids = np.arange(len(vecs), dtype=np.int64)
    sims_c = np.arange(len(vecs), dtype=np.int64) % 5
    a = ann_mod._semdedup_resolve(ids, sims_c, mn, 0.97)
    monkeypatch.setattr(ann_mod, "SEMDEDUP_PAIR_CHUNK", 3)
    b = ann_mod._semdedup_resolve(ids, sims_c, mn, 0.97)
    assert (a == b).all()
    assert (~a).sum() > 0  # the fixture really has duplicates


def test_edge_budget_raises(monkeypatch):
    from email_address_parser_ray.stages import ann as ann_mod

    vecs, _ = _planted(seed=71, dup_sizes=(5, 1, 1, 1, 1, 1))
    mn = _norm(np.stack(vecs).astype(np.float64))
    ids = np.arange(len(vecs), dtype=np.int64)
    monkeypatch.setattr(ann_mod, "SEMDEDUP_MAX_EDGES", 1)
    with pytest.raises(ValueError, match="duplicate pairs"):
        ann_mod._semdedup_resolve(ids, ids.copy(), mn, 0.97)


def test_retract_retry_after_partial_publish(ray_session, tmp_path):
    """A crash between the swaps and the marker must not lose the
    touched-cell list: the plan file carries it to the retry."""
    import json
    import os

    import ray.data as rd

    from email_address_parser_ray.stages.ann import (
        ivf_build,
        semantic_dedup_ivf,
        semantic_dedup_ivf_retract,
    )

    vecs, gid = _planted(seed=73)
    idx = str(tmp_path / "ivf_crash")
    ivf_build(_ds(vecs), idx, k=2, iters=2)
    prev = semantic_dedup_ivf(idx).materialize()
    removed = rd.from_arrow(pa.table({"vec_id": pa.array([0, 1], pa.int64())}))
    # run the retract fully, then rewind to the mid-crash state: marker
    # gone, plan (written before any swap) still present
    semantic_dedup_ivf_retract(removed, idx, "cx", prev).materialize()
    marker = os.path.join(idx, "retract_cx.done")
    with open(marker) as f:
        plan = json.load(f)["touched"]
    assert plan  # the retract really touched cells
    os.remove(marker)
    with open(os.path.join(idx, "retract_cx.plan"), "w") as f:
        json.dump({"touched": plan}, f)
    retry = (
        semantic_dedup_ivf_retract(removed, idx, "cx", prev)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    fresh = (
        semantic_dedup_ivf(idx)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert retry.equals(fresh)
    assert not set(retry["vec_id"]) & {0, 1}


def test_pre_swap_leftover_tolerated(ray_session, tmp_path):
    """A cell=N.pre-<tag> leftover from a crashed retract must not
    crash a direct semantic_dedup_ivf pass."""
    import os

    from email_address_parser_ray.stages.ann import ivf_build, semantic_dedup_ivf

    vecs, _ = _planted(seed=79)
    idx = str(tmp_path / "ivf_leftover")
    ivf_build(_ds(vecs), idx, k=2, iters=1)
    os.makedirs(os.path.join(idx, "cell=0.pre-r9"), exist_ok=True)
    got = semantic_dedup_ivf(idx).to_pandas()
    assert len(got) == len(vecs)


def test_cell_guard_raises(ray_session):
    vecs, _ = _planted()
    with pytest.raises(Exception, match="max_cell_rows"):
        semantic_dedup(_ds(vecs), k=1, iters=1, max_cell_rows=3).materialize()

"""Incrementality for the embedding near-dup family: add == fresh
recompute and retract(add(X)) == never-added on the verified pair
state — completing the add/retract story across all three resolution
families (resolve, text dedup, embeddings)."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from email_address_parser_ray.sources.io import read_parquet_clean
from email_address_parser_ray.stages.ann import (
    embedding_incremental_pairs,
    embedding_near_dup_pairs,
    embedding_retract_pairs,
)

SF = "/root/testdata/sf0.001"


def _emb_tables():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    mask = pc.equal(pc.bit_wise_and(t["vec_id"], 3), 0)  # ~1/4 arrive "today"
    return t, t.filter(pc.invert(mask)), t.filter(mask)


def _pairs(ds):
    return {(r["vec_a"], r["vec_b"], r["cos_e3"]) for r in ds.take_all()}


def test_embedding_incremental_add_equals_fresh(ray_session):
    full_t, old_t, new_t = _emb_tables()
    old_pairs = embedding_near_dup_pairs(
        rd.from_arrow(old_t), d=64, threshold=0.45
    ).materialize()
    out = embedding_incremental_pairs(
        rd.from_arrow(old_t), old_pairs, rd.from_arrow(new_t), d=64, threshold=0.45
    )
    fresh = embedding_near_dup_pairs(rd.from_arrow(full_t), d=64, threshold=0.45)
    assert _pairs(out) == _pairs(fresh)
    # the delta actually contributed pairs beyond the carried-over state
    assert len(_pairs(out)) > len(_pairs(old_pairs)) > 0


def test_embedding_add_then_retract_roundtrip(ray_session):
    _, old_t, new_t = _emb_tables()
    old_pairs = embedding_near_dup_pairs(
        rd.from_arrow(old_t), d=64, threshold=0.45
    ).materialize()
    added = embedding_incremental_pairs(
        rd.from_arrow(old_t), old_pairs, rd.from_arrow(new_t), d=64, threshold=0.45
    )
    back = embedding_retract_pairs(
        added, rd.from_arrow(new_t.select(["vec_id"]))
    )
    assert _pairs(back) == _pairs(old_pairs)


def test_embedding_retract_noop_and_unknown(ray_session):
    full_t, _, _ = _emb_tables()
    pairs = embedding_near_dup_pairs(
        rd.from_arrow(full_t), d=64, threshold=0.45
    ).materialize()
    empty = rd.from_arrow(pa.table({"vec_id": pa.array([], pa.int64())}))
    assert _pairs(embedding_retract_pairs(pairs, empty)) == _pairs(pairs)
    ghost = rd.from_arrow(pa.table({"vec_id": pa.array([10**9], pa.int64())}))
    assert _pairs(embedding_retract_pairs(pairs, ghost)) == _pairs(pairs)

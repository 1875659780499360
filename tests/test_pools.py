"""Block-layout healing: ``coalesce_small_blocks`` must collapse
pathological tiny-block layouts without touching content, and must be
a strict no-op on healthy ones (so the 100-TB plan — 64-128 MB blocks
— is unchanged)."""

import pyarrow as pa
import ray.data as rd

from email_address_parser_ray.stages.pools import coalesce_small_blocks


def _docs(n_rows: int, n_blocks: int):
    t = pa.table(
        {
            "doc_id": pa.array(range(n_rows), pa.int64()),
            "text": pa.array([f"doc {i} body" for i in range(n_rows)]),
        }
    )
    return rd.from_arrow(t).repartition(n_blocks).materialize()


def test_coalesce_collapses_fragmented_layout(ray_session):
    mds = _docs(400, 200)  # 2 rows/block — the chained-shuffle residue
    out = coalesce_small_blocks(mds)
    assert out.num_blocks() < 200
    # content is untouched (row set identical)
    assert sorted(out.to_pandas()["doc_id"]) == list(range(400))


def test_coalesce_noop_on_healthy_layout(ray_session):
    mds = _docs(400, 4)  # few blocks — under the CPU floor
    out = coalesce_small_blocks(mds)
    assert out is mds  # identity, not a copy


def test_coalesce_noop_on_lazy_dataset(ray_session):
    lazy = _docs(50, 2).map_batches(lambda t: t, batch_format="pyarrow")
    out = coalesce_small_blocks(lazy)
    assert out is lazy

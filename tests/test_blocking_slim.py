"""The slim int64-key pair shuffle must emit exactly the pair set the
string-keyed grouping defines (hash collisions could only ADD pairs;
none at test scale), independent of input partitioning."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _nodes_table(n=200, seed=21):
    # 10 domains x 20 nodes keeps every block under MAX_BLOCK_SIZE so the
    # reference below can use plain triu emission without the
    # sorted-neighborhood cap
    rng = np.random.RandomState(seed)
    doms = np.array([f"dom{d}.example" for d in range(10)])
    locals_ = [
        "user%03d" % i if i % 3 else "user%03d.x" % (i - 1) for i in range(n)
    ]
    return pa.table(
        {
            "address": pa.array(
                [f"{l}@{doms[i % 10]}" for i, l in enumerate(locals_)]
            ),
            "local_canon": pa.array(locals_),
            "domain_canon": pa.array([doms[i % 10] for i in range(n)]),
            "n_mentions": pa.array(rng.randint(1, 5, size=n), pa.int64()),
        }
    )


def _reference_pairs(t: pa.Table):
    """String-keyed reimplementation of the emission contract over the
    exploded keys (triu per block, affix/deletion passes skip
    dotless-equal pairs, MAX_BLOCK_SIZE ignored at this scale)."""
    from email_address_parser_ray.stages.blocking import explode_block_keys

    ex = explode_block_keys(t).to_pandas()
    pairs = set()
    for key, g in ex.groupby("block_key"):
        rows = g.sort_values("address")
        addrs = rows["address"].to_numpy()
        dots = rows["dotless"].to_numpy()
        is_d = (rows["pass_tag"] == "d").to_numpy()
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if not is_d[i] and dots[i] == dots[j]:
                    continue
                pairs.add((addrs[i], addrs[j]))
    return pairs


def test_slim_pairs_match_string_key_reference(ray_session):
    import ray.data as rd

    from email_address_parser_ray.stages.blocking import candidate_pairs

    t = _nodes_table()
    want = _reference_pairs(t)
    for blocks in (1, 5):
        got = (
            candidate_pairs(rd.from_arrow(t).repartition(blocks))
            .to_pandas()
        )
        got_pairs = set(zip(got["address_a"], got["address_b"]))
        assert got_pairs == want, blocks

"""Decontamination over-gate path: the Bloom-prefiltered distributed
branch must be row-identical to the broadcast branch (gate-flip
equality, the retract families' test pattern), stay exact when the
Bloom bitmap is clamped below its optimal size (fp rate rises, output
must not change), and short-circuit on clean corpora.  Also pins
bucketed_semi_join itself against a plain set-based computation."""

import numpy as np
import pyarrow as pa
import pytest

from email_address_parser_ray.stages import dedup as dedup_mod
from email_address_parser_ray.stages import sketches as sk
from email_address_parser_ray.stages.dedup import decontaminate
from email_address_parser_ray.stages.joins import bucketed_semi_join


def _docs(texts, blocks=3, start_id=0):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    range(start_id, start_id + len(texts)), pa.int64()
                ),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)


def _corpora(seed=5, n_train=400, n_eval=40, contaminate_every=7):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(300)]
    ev = [
        " ".join(rng.choice(vocab, size=rng.randint(5, 15)))
        for _ in range(n_eval)
    ]
    train = []
    for i in range(n_train):
        t = " ".join(rng.choice(vocab, size=rng.randint(8, 30)))
        if i % contaminate_every == 0:
            # splice an eval 3-gram into the middle
            src = ev[i % n_eval].split()
            t = t + " " + " ".join(src[:3])
        train.append(t)
    return train, ev


def _result_map(res):
    df = res.to_pandas()
    return dict(zip(df["doc_id"], df["n_hits"]))


def test_gate_flip_branch_equality(ray_session, monkeypatch):
    train, ev = _corpora()
    broadcast = _result_map(decontaminate(_docs(train), _docs(ev, start_id=10**6)))
    assert broadcast  # the corpus is contaminated by construction
    monkeypatch.setattr(dedup_mod, "DECONTAM_MAX_EVAL_SHINGLES", 1)
    bloom = _result_map(decontaminate(_docs(train), _docs(ev, start_id=10**6)))
    assert bloom == broadcast


def test_over_gate_clamped_bitmap_still_exact(ray_session, monkeypatch):
    """Force BOTH the eval gate and the Bloom byte budget low: the fp
    rate explodes, the verify sliver grows, the output must not."""
    train, ev = _corpora(seed=11)
    broadcast = _result_map(decontaminate(_docs(train), _docs(ev, start_id=10**6)))
    monkeypatch.setattr(dedup_mod, "DECONTAM_MAX_EVAL_SHINGLES", 1)
    monkeypatch.setattr(sk, "BLOOM_MAX_BYTES", 16)  # 128 bits for ~300 keys
    bloom = _result_map(decontaminate(_docs(train), _docs(ev, start_id=10**6)))
    assert bloom == broadcast


def test_over_gate_clean_corpus_empty(ray_session, monkeypatch):
    rng = np.random.RandomState(3)
    train = [" ".join(f"a{rng.randint(1000)}" for _ in range(12)) for _ in range(100)]
    ev = [" ".join(f"b{rng.randint(1000)}" for _ in range(12)) for _ in range(20)]
    monkeypatch.setattr(dedup_mod, "DECONTAM_MAX_EVAL_SHINGLES", 1)
    res = decontaminate(_docs(train), _docs(ev, start_id=10**6))
    assert res.count() == 0
    assert set(res.schema().names) == {"doc_id", "n_hits"}


def test_bucketed_semi_join_matches_set_semantics(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(17)
    lk = [f"k{int(v)}" for v in rng.randint(0, 60, 500)]
    lv = list(range(500))
    rk = sorted({f"k{int(v)}" for v in rng.randint(30, 90, 100)})
    left = rd.from_arrow(
        pa.table({"g": pa.array(lk, pa.string()), "val": pa.array(lv, pa.int64())})
    ).repartition(5)
    right = rd.from_arrow(pa.table({"g": pa.array(rk, pa.string())})).repartition(3)
    got = bucketed_semi_join(left, right, on="g").to_pandas()
    keep = set(rk)
    want = sorted(v for k, v in zip(lk, lv) if k in keep)
    assert sorted(got["val"]) == want
    assert list(got.columns) == ["g", "val"]


def test_bucketed_semi_join_sparse_sides(ray_session):
    """The exact shape Ray's native join dies on: a tiny left sliver
    over many partitions."""
    import ray.data as rd

    left = rd.from_arrow(
        pa.table({"g": pa.array(["x", "y"], pa.string()),
                  "doc_id": pa.array([1, 2], pa.int64())})
    ).repartition(8)
    right = rd.from_arrow(
        pa.table({"g": pa.array(["y", "z"] * 50, pa.string())})
    ).repartition(8)
    got = bucketed_semi_join(left, right, on="g").to_pandas()
    assert got["doc_id"].tolist() == [2]

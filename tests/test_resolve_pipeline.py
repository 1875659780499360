"""End-to-end record-linkage pipeline gates (SURVEY §5 engine strategy):

(d) pairwise F1 >= 0.99 vs gold entity clusters,
(e) per-turn text equality under (conv_id, turn_idx) ordering,
(f) checkpoint resume idempotence.
"""

import itertools
import os
import shutil

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def sf_root(ray_session):
    from email_address_parser_ray.sources.transcripts import ensure_transcripts

    return ensure_transcripts("/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def result(ray_session, sf_root):
    from email_address_parser_ray.pipelines.resolve import resolve

    return resolve(f"{sf_root}/transcripts")


def _gold_maps(sf_root):
    gm = pq.read_table(f"{sf_root}/gold_mentions.parquet").to_pandas()
    ge = pq.read_table(f"{sf_root}/gold_entities.parquet").to_pandas()
    ge = ge[ge["address"].isin(set(gm["address"]))]
    return dict(zip(ge["address"], ge["entity_id"]))


def test_pairwise_f1_at_least_099(result, sf_root):
    clusters = result["clusters"].to_pandas()
    gold = _gold_maps(sf_root)
    pred = dict(zip(clusters["address"], clusters["cluster_id"]))
    assert set(gold) == set(pred)
    tp = fp = fn = 0
    for a, b in itertools.combinations(sorted(gold), 2):
        g = gold[a] == gold[b]
        p = pred[a] == pred[b]
        tp += g and p
        fp += p and not g
        fn += g and not p
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    f1 = 2 * prec * rec / max(1e-9, prec + rec)
    assert f1 >= 0.99, (prec, rec, f1)


def test_turn_text_roundtrip(ray_session, sf_root):
    """Input text must survive the pipeline byte-identically under the
    stable ordering key (BASELINE input_hint invariant)."""
    import ray.data as rd
    from email_address_parser_ray.functions.fastpath import extract_mentions_batch

    ds = rd.read_parquet(f"{sf_root}/transcripts")
    passed = ds.map_batches(lambda t: t, batch_format="pyarrow")
    got = (
        passed.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    import pyarrow.dataset as pds

    want = (
        pds.dataset(f"{sf_root}/transcripts")
        .to_table()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["text"].equals(want["text"])
    assert got["conv_id"].equals(want["conv_id"])


def test_checkpoint_resume_idempotent(ray_session, sf_root, tmp_path):
    from email_address_parser_ray.pipelines.resolve import resolve
    from email_address_parser_ray.state.checkpoint import load_manifest

    root = str(tmp_path / "ckpt")
    r1 = resolve(f"{sf_root}/transcripts", checkpoint_root=root)
    c1 = r1["clusters"].to_pandas().sort_values("address").reset_index(drop=True)
    man1 = load_manifest(root, "clusters")
    assert man1 is not None and man1["rows"] == len(c1)
    assert man1["partitions"], "per-partition lineage must be recorded"

    # simulate failure after the edges stage: delete the final stage only
    shutil.rmtree(os.path.join(root, "clusters"))
    r2 = resolve(f"{sf_root}/transcripts", checkpoint_root=root)
    c2 = r2["clusters"].to_pandas().sort_values("address").reset_index(drop=True)
    assert c1.equals(c2)

    # a full rerun with everything present must fast-forward (same output)
    r3 = resolve(f"{sf_root}/transcripts", checkpoint_root=root)
    c3 = r3["clusters"].to_pandas().sort_values("address").reset_index(drop=True)
    assert c1.equals(c3)


def test_cluster_ids_are_deterministic_min_labels(result):
    clusters = result["clusters"].to_pandas()
    by_cluster = clusters.groupby("cluster_id")["address"].min()
    assert (by_cluster.index == by_cluster.values).all()

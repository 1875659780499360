"""Pairwise evaluation of cluster assignments against gold entities.

The north metric (BASELINE.json): pairwise F1 >= 0.99 on labeled identity
pairs.  ``pairwise_f1`` computes tp/fp/fn over *all* node pairs without
enumerating them: for a partition into predicted clusters and a gold
partition, pair counts follow from contingency-table combinatorics
(sum over cells of C(n_ij,2) etc.), which is exact and O(cells) — the
same result as scoring every labeled pair, but computable at cluster
scale with two small groupbys.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _c2(s) -> int:
    return int((s * (s - 1) // 2).sum())


def pairwise_f1(assign: pd.DataFrame) -> dict:
    """assign: columns (address, cluster_id, entity_id).  Returns the
    pairwise precision/recall/F1 of cluster_id against entity_id."""
    cell = assign.groupby(["cluster_id", "entity_id"]).size()
    tp = _c2(cell)
    pred = assign.groupby("cluster_id").size()
    gold = assign.groupby("entity_id").size()
    pred_pairs = _c2(pred)
    gold_pairs = _c2(gold)
    fp = pred_pairs - tp
    fn = gold_pairs - tp
    precision = tp / pred_pairs if pred_pairs else 1.0
    recall = tp / gold_pairs if gold_pairs else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall)
        else 0.0
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "f1": round(f1, 6),
    }


def _metrics_row(n_nodes: int, tp: int, pred_pairs: int, gold_pairs: int) -> pa.Table:
    fp = pred_pairs - tp
    fn = gold_pairs - tp
    precision = tp / pred_pairs if pred_pairs else 1.0
    recall = tp / gold_pairs if gold_pairs else 1.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "tp": pa.array([tp], pa.int64()),
            "fp": pa.array([fp], pa.int64()),
            "fn": pa.array([fn], pa.int64()),
            "precision_ppm": pa.array([int(round(precision * 1_000_000))], pa.int64()),
            "recall_ppm": pa.array([int(round(recall * 1_000_000))], pa.int64()),
            "f1_ppm": pa.array([int(round(f1 * 1_000_000))], pa.int64()),
        }
    )


def _c2_total(ds, col: str) -> int:
    """Σ C(n,2) over a column, reduced distributively: one tiny partial
    row per block, summed on the driver (never materializes the table)."""
    import pyarrow.compute as pc

    def part(t: pa.Table) -> pa.Table:
        n = pc.cast(t[col], pa.int64())
        c2 = pc.divide(pc.multiply(n, pc.subtract(n, pa.scalar(1, pa.int64()))), pa.scalar(2, pa.int64()))
        return pa.table(
            {
                "c2": pa.array([pc.sum(c2).as_py() or 0], pa.int64()),
                "n": pa.array([pc.sum(n).as_py() or 0], pa.int64()),
            }
        )

    parts = ds.map_batches(part, batch_format="pyarrow").take_all()
    return sum(p["c2"] for p in parts), sum(p["n"] for p in parts)


def f1_report_distributed(clusters_ds, gold_ds) -> pa.Table:
    """Pairwise P/R/F1 of cluster assignments vs gold entities with no
    driver-side materialization of any corpus-sized table (round-1
    verdict fix): one hash join on address, a contingency-cell groupby,
    then two groupbys over the (already aggregated) cell table; only
    per-block partial sums reach the driver.

    clusters_ds: (address, cluster_id); gold_ds: (entity_id, address).
    """
    from ray.data.aggregate import Min, Sum

    from ..stages.joins import hash_join

    gold = gold_ds.groupby("address").aggregate(Min("entity_id", alias_name="entity_id"))
    assign = hash_join(clusters_ds, gold, on="address")

    cells = (
        assign.map_batches(
            lambda t: t.group_by(["cluster_id", "entity_id"])
            .aggregate([("entity_id", "count")])
            .rename_columns(["cluster_id", "entity_id", "p_cnt"]),
            batch_format="pyarrow",
        )
        .groupby(["cluster_id", "entity_id"])
        .aggregate(Sum("p_cnt", alias_name="n"))
        .materialize()  # consumed three times below; one row per cell
    )
    tp, n_nodes = _c2_total(cells, "n")
    pred_sizes = cells.groupby("cluster_id").aggregate(Sum("n", alias_name="sz"))
    gold_sizes = cells.groupby("entity_id").aggregate(Sum("n", alias_name="sz"))
    pred_pairs, _ = _c2_total(pred_sizes, "sz")
    gold_pairs, _ = _c2_total(gold_sizes, "sz")
    return _metrics_row(n_nodes, tp, pred_pairs, gold_pairs)


def f1_report_table(clusters_pdf: pd.DataFrame, gold_pdf: pd.DataFrame) -> pa.Table:
    """Join predicted clusters with gold (address, entity_id) and emit a
    one-row metrics table."""
    assign = clusters_pdf.merge(gold_pdf, on="address", how="inner")
    m = pairwise_f1(assign)
    return pa.table(
        {
            "n_nodes": pa.array([len(assign)], pa.int64()),
            "tp": pa.array([m["tp"]], pa.int64()),
            "fp": pa.array([m["fp"]], pa.int64()),
            "fn": pa.array([m["fn"]], pa.int64()),
            "precision_ppm": pa.array([int(m["precision"] * 1_000_000)], pa.int64()),
            "recall_ppm": pa.array([int(m["recall"] * 1_000_000)], pa.int64()),
            "f1_ppm": pa.array([int(m["f1"] * 1_000_000)], pa.int64()),
        }
    )

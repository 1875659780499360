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

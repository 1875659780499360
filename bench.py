"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "turns_per_sec": ...}

``--scaling`` runs the headline pipeline in two fresh processes at N and
4N CPUs (default 4 and 16) on the same input (default: the sf3.0
15M-turn synthesized corpus, large enough that compute dominates fixed
per-stage overhead) and reports both throughputs + scaling efficiency —
the sandbox stand-in for the north rule's N vs 4N-node cluster
comparison.  Override with GRAFT_SCALING_LO/HI/SF.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# transcripts corpus scale (defaults to the sf of SF_DIR); the --scaling
# run overrides this upward so compute dominates fixed per-stage overhead
TRANS_SF = os.environ.get("GRAFT_TRANSCRIPTS_SF", "")
ONLY = [q for q in os.environ.get("GRAFT_BENCH_QUERIES", "").split(",") if q]


def _transcripts_sf_dir() -> str:
    if TRANS_SF:
        return f"sf{TRANS_SF}"
    return SF_DIR


def _bench_queries(sf_dir: str) -> dict:
    """Timed pipelines (consumed fully; results discarded)."""
    from email_address_parser_ray.pipelines.resolve import resolve
    from email_address_parser_ray.pipelines import relational
    from email_address_parser_ray.sources.transcripts import ensure_transcripts
    from email_address_parser_ray.stages.dedup import minhash_dedup_clusters

    root = ensure_transcripts(_transcripts_sf_dir())
    timings: dict[str, float] = {}

    # EVERY per-query number is the min of 2 back-to-back legs:
    # single-leg walls on this box swing ±25-40% (actor scheduling /
    # object-store warmup / first-touch page allocation), and the
    # per-leg minimum is the repo's standard estimator (BASELINE.md).
    # Raw legs stay visible as scalar entries so regressions are
    # attributable (the driver reads this dict as {query: seconds}).
    def timed(name, fn):
        if ONLY and name not in ONLY:
            return None
        legs = []
        for _ in range(2):
            t0 = time.time()
            fn()
            legs.append(round(time.time() - t0, 3))
        timings[name] = min(legs)
        timings[f"{name}_leg1"] = legs[0]
        timings[f"{name}_leg2"] = legs[1]

    # headline: full record-linkage pipeline, counted by consuming clusters
    def run_resolve():
        res = resolve(f"{root}/transcripts")
        return res["clusters"].count()

    timed("resolve", run_resolve)

    def run_extract():
        from email_address_parser_ray.pipelines.resolve import (
            extract_mentions, read_transcripts,
        )

        return extract_mentions(read_transcripts(f"{root}/transcripts")).count()

    timed("extract", run_extract)
    timed("q1_lineitem", lambda: relational.q1_lineitem(sf_dir).count())
    timed("q5_region_revenue", lambda: relational.q5_region_revenue(sf_dir).count())
    timed("events_hourly", lambda: relational.events_hourly(sf_dir).count())
    timed(
        "minhash_dedup",
        lambda: minhash_dedup_clusters(__import__("ray").data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )).count(),
    )

    def run_decontaminate():
        import ray.data as rd

        from email_address_parser_ray.sources.io import eval_train_split
        from email_address_parser_ray.stages.dedup import decontaminate

        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        train, ev = eval_train_split(docs)
        return decontaminate(train, ev).count()

    timed("decontaminate", run_decontaminate)

    # breadth entries: engine-addition pipelines driven through the same
    # callables the driver's correctness gate uses (__ray_entry__ never
    # calls ray.init, so importing it here is safe)
    import __ray_entry__ as entrymod

    q = entrymod.queries()

    def consume(res) -> int:
        return res.count() if hasattr(res, "count") else len(res)

    timed("embedding_neardup", lambda: consume(q["embedding_neardup"](sf_dir)))
    timed("events_pagerank", lambda: consume(q["events_pagerank"](sf_dir)))
    timed(
        "docs_tfidf_top_terms", lambda: consume(q["docs_tfidf_top_terms"](sf_dir))
    )

    def run_bpe():
        import ray.data as rd

        from email_address_parser_ray.functions.bpe import (
            bpe_token_count_ds, train_bpe,
        )

        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        model = train_bpe(docs, num_merges=256)
        return bpe_token_count_ds(docs, model).count()

    timed("bpe_train_encode", run_bpe)

    def run_pretrain_prep():
        import shutil

        import ray.data as rd

        from email_address_parser_ray.pipelines.pretrain import pretrain_prep
        from email_address_parser_ray.sources.io import eval_train_split

        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        train, ev = eval_train_split(docs)
        out = "/tmp/eap_ray_pretrain_bench"
        shutil.rmtree(out, ignore_errors=True)
        _, counters, _ = pretrain_prep(train, ev, out, num_merges=128)
        return counters["exported_rows"]

    timed("pretrain_prep", run_pretrain_prep)

    def run_pretrain_full():
        """The composed prep with EVERY optional stage on: CCNet line
        dedup, exact-substring span cut, and DSIR selection toward the
        eval split's distribution (kept separate from the plain
        ``pretrain_prep`` entry so round history stays comparable)."""
        import shutil

        import ray.data as rd

        from email_address_parser_ray.pipelines.pretrain import pretrain_prep
        from email_address_parser_ray.sources.io import eval_train_split

        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        train, ev = eval_train_split(docs)
        out = "/tmp/eap_ray_pretrain_full_bench"
        shutil.rmtree(out, ignore_errors=True)
        _, counters, _ = pretrain_prep(
            train, ev, out, num_merges=128,
            line_dedup=True, cut_spans_window=16,
            dsir_target_ds=ev, dsir_k=2000,
        )
        return counters["exported_rows"]

    timed("pretrain_full", run_pretrain_full)
    return timings


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    from email_address_parser_ray.sources.transcripts import ensure_transcripts
    import pyarrow.dataset as pds

    root = ensure_transcripts(_transcripts_sf_dir())
    n_turns = pds.dataset(f"{root}/transcripts").count_rows()

    # warm page cache (untimed) on the columns the pipeline actually reads,
    # so we measure compute+shuffle, not cold disk (matters when a prior
    # bench leg evicted the corpus)
    _ = pds.dataset(f"{root}/transcripts").to_table(
        columns=["conv_id", "turn_idx", "text"]
    )

    timings = _bench_queries(SF_DIR)
    headline = timings.get("resolve")
    out = {
        "metric": "resolve_pipeline_sec_sf_dir",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1) if headline else None,
    }
    ray.shutdown()
    print(json.dumps(out))


def scaling() -> None:
    """Same job, same input, two fresh processes at N and 4N CPUs (sandbox
    stand-in for N vs 4N nodes).  Uses a larger transcript corpus
    (default sf3.0, 15M turns) so per-stage fixed overhead doesn't mask
    the parallel fraction the criterion is about."""
    lo = int(os.environ.get("GRAFT_SCALING_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "16"))

    def run(ncpu: int) -> dict:
        # drop stale spill dirs from earlier legs so each leg starts clean
        subprocess.run(
            "rm -rf /tmp/ray/session_* 2>/dev/null", shell=True, check=False
        )
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_TRANSCRIPTS_SF=os.environ.get("GRAFT_SCALING_SF", "3.0"),
            GRAFT_BENCH_QUERIES="resolve",
        )
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        )
        return json.loads(res.stdout.strip().splitlines()[-1])

    # per-leg minimum with a cooldown between legs: single-run walls vary
    # ±20-40% with page-cache/object-store state, and the min is the
    # reproducible figure.  main() itself now runs resolve twice and
    # reports the min, so each leg's process already IS a best-of-2 —
    # one process per parallelism level suffices.
    r_hi = run(hi)
    time.sleep(20)
    r_lo = run(lo)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                f"turns_per_sec_{lo}": r_lo["turns_per_sec"],
                f"turns_per_sec_{hi}": r_hi["turns_per_sec"],
                "cpus": [lo, hi],
                "n_turns": r_hi.get("n_turns"),
                "scaling_efficiency": round(eff, 3),
                "scaling_corpus_sf": os.environ.get("GRAFT_SCALING_SF", "3.0"),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()

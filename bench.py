"""Benchmark harness.

Headline: the full KG-construction snapshot (pages -> HTML extraction
-> chunk -> triple extraction -> entity/edge shuffles -> partitioned
Parquet) over the synthetic page corpus sized to ``$GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1`` -> 15,000 pages).  Secondary queries
time the curation extras and relational operators.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ..., "triples_per_sec": ...}

``--scaling`` reruns the headline in fresh processes at 8 and 32 CPUs
on the same input and reports both throughputs + scaling efficiency
(the sandbox proxy for the north rule's N -> 4N-node criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(sf_dir: str) -> float:
    try:
        return float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        return 0.0


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from neo4j_document_pipeline_ray.config import PipelineConfig
    from neo4j_document_pipeline_ray.pipelines import relational as rel
    from neo4j_document_pipeline_ray.pipelines.snapshot import build_snapshot
    from neo4j_document_pipeline_ray.sources.corpus import ensure_corpus

    paths = ensure_corpus(SF_DIR)  # cached; generation excluded from timing

    # warm the page cache so we measure compute + shuffle, not cold reads
    rd.read_parquet(paths["pages"], columns=["url"]).count()

    cfg = PipelineConfig(
        extract_concurrency=(1, max(2, NUM_CPUS // 8)),
        embed_concurrency=(1, max(2, NUM_CPUS // 4)),
        join_partitions=max(4, NUM_CPUS // 4),
        shuffle_partitions=max(8, NUM_CPUS),
        shard_parallelism=max(2, NUM_CPUS // 4),
    )
    out_dir = f"/tmp/bench_snapshot_{NUM_CPUS}"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)

    t0 = time.time()
    root = build_snapshot(paths["pages"], out_dir, cfg, resume=False, shard_files=1)
    headline = time.time() - t0

    n_docs = root["counts"]["n_docs"]
    n_triples = root["counts"]["n_triples"]

    queries = {"kg_snapshot": round(headline, 3)}

    def timed(name, fn):
        t = time.time()
        res = fn(SF_DIR)
        # consume
        if hasattr(res, "count"):
            res.count()
        queries[name] = round(time.time() - t, 3)

    timed("rel_lineitem_agg", rel.q_lineitem_agg)
    timed("rel_segment_topk", rel.q_segment_revenue_topk)
    timed("rel_events_hourly", rel.q_events_hourly)

    from neo4j_document_pipeline_ray.extras.dedup import (
        exact_dedup_sf,
        minhash_dedup_pairs,
    )
    from neo4j_document_pipeline_ray.extras.similarity import (
        brute_force_topk,
        query_vector,
    )
    from neo4j_document_pipeline_ray.extras.textstats import quality_stats

    timed("docs_exact_dedup", exact_dedup_sf)
    timed("docs_quality", quality_stats)

    def _minhash(sf):
        docs = rd.read_parquet(os.path.join(sf, "documents.parquet"),
                               columns=["doc_id", "text"])
        return minhash_dedup_pairs(docs, threshold=0.8)

    timed("docs_minhash_pairs", _minhash)

    def _ann(sf):
        emb = rd.read_parquet(os.path.join(sf, "embeddings.parquet"))
        return brute_force_topk(emb, query_vector(sf), k=10)

    timed("ann_topk", _ann)

    result = {
        "metric": "kg_snapshot_sec_end_to_end",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_of(SF_DIR),
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "docs_per_sec": round(n_docs / headline, 2),
        "triples_per_sec": round(n_triples / headline, 2),
        "stage_timings_s": root["stage_timings_s"],
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job at 8 and 32 CPUs in fresh processes (N vs 4N proxy)."""
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "docs_per_sec_8": lo["docs_per_sec"],
        "docs_per_sec_32": hi["docs_per_sec"],
        "triples_per_sec_8": lo["triples_per_sec"],
        "triples_per_sec_32": hi["triples_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

"""Pipeline configuration.

Replaces the reference's YAML + env config sprawl (``embedConfig.yaml``,
``neo4jConfig`` — reference ``ingestMD.py:16-35``, ``graphutil.py:22-50``)
with one dataclass.  Defaults mirror the reference's code defaults:
chunk size 1500 tokens (``ingestMD.py:33``), overlap 0 (``ingestMD.py:34``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PipelineConfig:
    # --- chunking (reference ingestMD.py:33-34) ---
    chunk_size: int = 1500
    chunk_overlap: int = 0

    # --- embedding ---
    # The reference asserts dim 3072 (main.py:180-181).  The deterministic
    # hash embedder used in tests/bench defaults much smaller so embedding
    # payloads do not dominate object-store traffic at test scale; the
    # backend protocol supports any dim.
    embed_dim: int = 64

    # --- stage sizing (tune per cluster; these are per-stage knobs, the
    # streaming executor handles global backpressure) ---
    extract_batch_size: int = 256        # chunks per extractor batch
    extract_concurrency: int | tuple = 4  # actor pool size for TripleExtractor
    embed_batch_size: int = 4096         # distinct text keys per embed batch
    embed_concurrency: int | tuple = 2   # actor pool size for Embedder
    map_batch_size: int = 4096           # stateless map_batches rows per batch
    #                                      (text-bearing stages: html/docs)
    agg_batch_size: int = 65536          # in-batch partial-aggregation passes
    #                                      over slim rows (edge partials, node
    #                                      candidates, mention pairs): bigger
    #                                      batches collapse more per batch and
    #                                      push far fewer blocks through the
    #                                      exchange — measured 53-61 s -> 17.7 s
    #                                      edge merge at 228k docs / 16 CPUs
    #                                      going 4096 -> 65536

    # --- shuffles / joins ---
    # These are FLOORS, not fixed counts: every corpus-keyed exchange
    # derives its partition count from the input's byte size
    # (stages.grouped.derive_partitions — one partition per ~256 MB,
    # from parquet-footer / plan metadata, no execution), so a 100 TB
    # exchange gets ~400k partitions while sandbox-scale runs keep
    # these measured values.
    join_partitions: int = 8             # floor for Dataset.join exchanges
    shuffle_partitions: int = 8          # floor for groupby exchanges

    # --- snapshot layout ---
    entity_buckets: int = 16             # entity-id range partitions of nodes/edges
    input_shards: int = 4                # url-hash shards for resumable extraction
    shard_parallelism: int = 4           # concurrent shard pipelines in stage A
    read_blocks_per_file: int = 8        # block-split hint per input file

    # --- entity identity scope ---
    # "norm" (default): label-BLIND canonicalization — the cluster key
    #   is normalize_name_for_key(name) alone, promoting the
    #   reference's read-time alias dedup (graphutil.py:653-674) to
    #   construction time (SURVEY §2.5 A3/A4 divergence note).
    # "label": strict reference parity with MERGE (n:Label {name})
    #   (ingestMD.py:505-511) — the key is scoped by the sanitized
    #   label, so "Paris" the City and "Paris" the Person stay
    #   distinct entities.
    entity_scope: str = "norm"

    # --- extraction dedup strategy ---
    # Extract once per DISTINCT chunk (shuffle + join-back, the
    # reference's chunk-cache semantics, ingestMD.py:744-752) — pays off
    # when extraction is expensive (LLM/model backends).  With the cheap
    # deterministic rule extractor the two extra barriers cost more than
    # the duplicate extractions, and results are identical because
    # extraction is a pure function of chunk text.
    dedupe_chunks_before_extract: bool = True

    # --- edge provenance exchange strategy ---
    # "inline": ship source_text through the edge exchange (fastest when
    #   the triples table is small); "ref": ship a 16-hex content hash and
    #   join the distinct snippet table onto the winners (wins when text
    #   dominates the exchange); "auto": pick by materialized input size.
    edge_text_exchange: str = "auto"
    edge_ref_threshold_bytes: int = 2 << 30

    # --- embedding backend selection ---
    # "hash": the deterministic SQL-mirrorable hash embedder (default —
    #   the only one that works in this offline sandbox);
    # "http": HTTPEmbedderBackend against an OpenAI/vLLM-style
    #   /embeddings endpoint, configured via
    #   extra["embed_http"] = {"base_url": ..., "api_key": ...,
    #   "model": ..., "timeout": 60.0} (the reference's
    #   embedConfig.yaml, ingestMD.py:16-35).  Resolved by
    #   stages.embed.make_embedder_backend(cfg); an explicit backend
    #   object passed to the pipeline entry points wins over this.
    embed_backend: str = "hash"

    # --- misc ---
    src_text_max_chars: int = 1000       # normal-triple provenance truncation
    #                                      (reference ingestMD.py:494)
    seed: int = 42

    extra: dict = field(default_factory=dict)

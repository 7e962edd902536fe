"""Empirical scale check: the heaviest pipeline/ANN operators at 1x
(sf0.1) vs Nx (synthesized 10x by default), recording wall-time scaling.

WHY (r7 verdict task #8): the repo's 100-TB claims rest on plan-shape
arguments (bucketed equi-joins, valves, per-shard windows). This script
is the empirical counterpart: if an operator were secretly quadratic in
corpus size, a 10x corpus would cost ~100x — the measured exponent
log(t_N/t_1)/log(N) exposes that with data instead of prose.

SYNTHESIS RULES (what makes the measurement fair):
- documents x10: replica r of every doc gets doc_id*N+r and, for r>0,
  every whitespace token suffixed with "x<r>" — replicas of the same doc
  share NO shingles/tokens across replicas, so the near-dup RATE stays
  that of the base corpus (naive duplication would give every doc ~N
  clones: pair output would grow ~N^2/2 by construction and the check
  would measure the corpus, not the engine). Within a replica the
  planted-dup structure is preserved exactly (the %7/%11/%5 planting in
  the queries derives from text AFTER this transform).
- embeddings x10: vec_id*N+r with a small deterministic per-replica,
  per-component jitter (replicas are near but not identical vectors —
  realistic density growth, no degenerate exact ties).
- IVFPQ at Nx runs with n_centroids scaled by N (constant CELL SIZE,
  n_probe fixed): this is the documented IVF deployment rule — index
  granularity grows with the pool so per-query candidate work stays
  constant; holding 8 cells at any scale would measure a config error,
  not the operator (FAISS sizes nlist ~ O(sqrt(n)..n/target_cell)).

Timing: min-of-2 per (operator, scale) — episodic whole-VM stalls on
this box poison single-shot numbers (see bench.py timed_med). Output:
SCALING_LOCAL.json, merged into BENCH_LOCAL.json by the next bench run.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def stage_scaled(spark, base: str, factor: int) -> str:
    """Stage the Nx documents+embeddings dir (content-addressed by the
    source stats + factor; rebuilt when the driver regenerates data)."""
    tag = base.rstrip("/").replace("/", "_")
    d = f"/tmp/xesmf_scale{tag}_x{factor}"
    marker = os.path.join(d, ".staged.json")
    st_d = os.stat(f"{base}/documents.parquet")
    st_e = os.stat(f"{base}/embeddings.parquet")
    want = {
        "doc_size": st_d.st_size,
        "doc_mtime": st_d.st_mtime,
        "emb_size": st_e.st_size,
        "emb_mtime": st_e.st_mtime,
        "factor": factor,
    }
    if os.path.isfile(marker):
        try:
            if json.load(open(marker)) == want:
                return d
        except (ValueError, OSError):
            pass
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)

    reps = spark.range(factor).select(F.col("id").cast("int").alias("r"))
    docs = spark.read.parquet(f"{base}/documents.parquet")
    scaled_docs = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * factor + F.col("r")).alias("doc_id"),
        F.when(F.col("r") == 0, F.col("text"))
        .otherwise(
            # suffix every token: replicas share no shingles across
            # replicas ('$1' = the captured token; literal 'x' keeps
            # the group ref unambiguous before the digit)
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1x"), F.col("r").cast("string")),
            )
        )
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    # repartition so the Nx corpus starts from the same per-partition
    # row count the 1x single file gives — not from factor-inflated
    # tiny partitions that would bias per-task overheads
    scaled_docs.repartition(max(2, factor // 2)).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    scaled_emb = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") * factor + F.col("r")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x + F.col("r").cast("float") * (((i % 5) - 2).cast("float")) * 0.0037
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    scaled_emb.repartition(max(2, factor // 2)).write.mode("overwrite").parquet(
        f"{d}/embeddings.parquet"
    )
    with open(marker, "w") as f:
        json.dump(want, f)
    return d


def _bpe64_summary(spark, sf_dir: str, incremental: bool, batch_merges: int = 1):
    """64-merge bpe_train over the documents table, returned as a 1-row
    summary DataFrame so the shared measure() (which counts rows) times
    exactly the training loop."""
    from xesmf_spark.bpe import bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train(
        docs, n_merges=64, incremental=incremental, batch_merges=batch_merges
    )
    return spark.createDataFrame([(len(merges),)], "n_merges long")


_JPEG_CACHE: dict = {}


def _jpeg_corpus(spark, s: int):
    """96·s pseudorandom 48x48 RGB baseline-4:2:0 JPEG payloads,
    encoded DRIVER-side once per scale and persisted so the timed
    section is the executor-side decode, not the fixture build."""
    if s not in _JPEG_CACHE:
        import numpy as np

        from xesmf_spark.jpeg import encode_jpeg

        rng = np.random.default_rng(5 + s)
        payloads = [
            bytes(
                encode_jpeg(
                    rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8),
                    quality=80,
                    subsampling="4:2:0",
                )
            )
            for _ in range(96 * s)
        ]
        df = (
            spark.createDataFrame(
                [(i, bytearray(p)) for i, p in enumerate(payloads)],
                "doc_id long, payload binary",
            )
            .repartition(32)
            .persist()
        )
        df.count()
        _JPEG_CACHE[s] = df
    return _JPEG_CACHE[s]


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    # optional op-name filter: re-measure just the named ops and MERGE
    # them into the existing SCALING_LOCAL.json (for when one operator
    # changed and a full 26-op re-run would waste an hour)
    only = set(sys.argv[3:])

    from xesmf_spark import release_persisted
    from xesmf_spark import queries as Q
    from xesmf_spark import multimodal as MM
    from xesmf_spark import pipeline as PIPE
    from xesmf_spark import quality as QUAL
    from xesmf_spark import relational as REL
    from xesmf_spark import similarity as SIM
    from xesmf_spark import timeseries as TS
    from xesmf_spark.session import get_spark

    spark = get_spark("xesmf_scale_check")
    spark.sparkContext.setLogLevel("ERROR")

    scaled = stage_scaled(spark, base, factor)
    print(f"staged {factor}x corpus at {scaled}", file=sys.stderr)

    def emb_at(sf_dir):
        return Q._par(spark, Q._t(spark, sf_dir, "embeddings"))

    # r16: shared builder for the 4-out-regular + hub graph the
    # triangle-family entries triplicate inline, plus a wrapper that
    # pins the ABOVE-BOUND closing-probe strategy (bloom-pruned
    # shuffled semi — the 100-TB branch): the strategy is chosen at
    # DataFrame-construction time from the driver-measured edge count,
    # so toggling the module constant around the build is sufficient
    def tri_hub_graph(s):
        return (
            spark.range(50_000 * s)
            .select(F.col("id").alias("src"))
            .select(
                "src",
                F.explode(
                    F.array(
                        *[
                            F.pmod(
                                F.col("src") * F.lit(m) + F.lit(a),
                                F.lit(50_000 * s),
                            )
                            for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                        ]
                    )
                ).alias("dst"),
            )
            .union(
                spark.range(4096).select(
                    F.lit(0).cast("long").alias("src"),
                    (F.col("id") * 12 + 1).alias("dst"),
                )
            )
        )

    def forced_above_bound(build):
        old = REL.TRIANGLE_BROADCAST_MAX_EDGES
        REL.TRIANGLE_BROADCAST_MAX_EDGES = 0
        try:
            return build()
        finally:
            REL.TRIANGLE_BROADCAST_MAX_EDGES = old

    # (name, fn(sf_dir, scale) -> DataFrame); IVFPQ grows index
    # granularity with the pool (constant cell size — see module doc)
    workloads = [
        ("pipeline_minhash_dedup", lambda d, s: Q.pipeline_minhash_dedup(spark, d)),
        ("pipeline_simhash_pairs", lambda d, s: Q.pipeline_simhash_pairs(spark, d)),
        # r8 additions: the bipartite LSH decontamination (same bucket
        # economics as minhash_dedup — must scale the same) and the
        # span scrubber (claimed LINEAR: explode + keyed joins + one
        # per-doc window, no pair join anywhere)
        (
            "pipeline_decontaminate_fuzzy",
            lambda d, s: Q.pipeline_decontaminate_fuzzy(spark, d),
        ),
        ("pipeline_span_dedup", lambda d, s: Q.pipeline_span_dedup(spark, d)),
        ("pipeline_curate", lambda d, s: Q.pipeline_curate(spark, d)),
        ("pipeline_pack_contexts", lambda d, s: Q.pipeline_pack_contexts(spark, d)),
        (
            "ann_ivfpq_top3",
            lambda d, s: SIM.ivfpq_topk(
                emb_at(d), k=3, n_centroids=8 * s, n_probe=2
            ),
        ),
        # r9 additions, synthetic inputs sized by the scale factor
        # (their sf-dir queries use fixed-size corpora/graphs):
        # hamming_pairs over n pseudo-random 64-bit hashes — honest
        # caveat: with FIXED 16-bit bands, random-hash candidate pairs
        # grow ~n^2/2^width once n >> band space; at true 100-TB n you
        # widen the bands (the simhash_pairs bits=60 rule). 30k -> 300k
        # stays in the ~linear regime the deployment would sit in.
        (
            "multimodal_hamming_pairs",
            lambda d, s: MM.hamming_pairs(
                spark.range(30_000 * s).select(
                    F.col("id").alias("doc_id"),
                    F.pmod(F.xxhash64("id"), F.lit(1 << 32)).alias("hash_lo"),
                    F.pmod(
                        F.xxhash64(F.col("id") + 1_000_000_000), F.lit(1 << 32)
                    ).alias("hash_hi"),
                ),
                radius=3,
            ),
        ),
        # 3-iteration integer PageRank on a synthetic 4-regular graph
        # (n nodes, 4n edges, plus n/16 dangling sinks so the r9
        # teleport term is exercised): per iteration one keyed
        # edge-rank join + map-side SUM + one scalar anti-join agg
        # sweep-line concurrency: 200k -> 2M synthetic intervals over a
        # fixed horizon; phase 1 is parallel per-bucket windows, phase 2
        # a constant-size carry scan — time should track endpoint volume
        (
            "relational_concurrency",
            lambda d, s: REL.concurrency_profile(
                spark.range(200_000 * s).select(
                    F.pmod(F.col("id") * 7919, F.lit(86_400_000)).alias("s"),
                    (
                        F.pmod(F.col("id") * 7919, F.lit(86_400_000))
                        + F.pmod(F.col("id"), F.lit(600_000))
                        + 1
                    ).alias("e"),
                ),
                "s",
                "e",
                3_600_000,
            ),
        ),
        # r10: the distributed BPE trainer — 8 merge iterations over
        # the scaled corpus. Cost = one corpus word-count shuffle +
        # per-iteration work on the DISTINCT-WORD table; the suffixed
        # 10x replicas multiply the distinct vocab ~10x, so this
        # measures the vocab-table loop, the part that grows.
        # (Training runs during query CONSTRUCTION — the returned
        # merge table is driver-side — so the timed section is the
        # whole train.)
        ("pipeline_bpe_train", lambda d, s: Q.pipeline_bpe_train(spark, d)),
        # r12: unigram-LM hard-EM train (2 iters + prune + final E-step)
        # on the scaled corpus — per iteration one mapInPandas Viterbi
        # pass over the DISTINCT-WORD table + one keyed count shuffle
        ("pipeline_unigram_tok", lambda d, s: Q.pipeline_unigram_tok(spark, d)),
        # r12: graduated-support multi-level span dedup (3 gram levels,
        # each an explode + two keyed equi-joins; still no pair join)
        (
            "pipeline_span_dedup_multilevel",
            lambda d, s: Q.pipeline_span_dedup_multilevel(spark, d),
        ),
        # r10 additions: the two r9 verdict stragglers. table_diff is
        # ONE full-outer keyed join with both sides scaled (left = n
        # rows, right = same keys with 1/16 changed, 1/32 dropped,
        # n/32 added) — time must track the join volume linearly.
        (
            "relational_table_diff",
            lambda d, s: REL.table_diff(
                spark.range(400_000 * s).select(
                    F.col("id").alias("k"),
                    F.pmod(F.col("id") * 7919, F.lit(1_000_000)).alias("v"),
                ),
                spark.range(400_000 * s + 12_500 * s)
                .select(
                    F.col("id").alias("k"),
                    (
                        F.pmod(F.col("id") * 7919, F.lit(1_000_000))
                        + F.when(F.col("id") % 16 == 3, 1).otherwise(0)
                    ).alias("v"),
                )
                .filter(F.col("k") % 32 != 5),
                "k",
            ),
        ),
        # merge_upsert(op_col): one left-anti keyed join + union; the
        # update stream is 1/8 the base (the common CDC ratio), with
        # 1/3 of updates tombstones
        (
            "relational_upsert_delete",
            lambda d, s: REL.merge_upsert(
                spark.range(400_000 * s).select(
                    F.col("id").alias("k"),
                    F.pmod(F.col("id") * 104_729, F.lit(1_000_000)).alias("v"),
                ),
                spark.range(50_000 * s).select(
                    (F.col("id") * 8).alias("k"),
                    F.pmod(F.col("id"), F.lit(1_000_000)).alias("v"),
                    F.when(F.col("id") % 3 == 0, "delete")
                    .otherwise("upsert")
                    .alias("op"),
                ),
                "k",
                op_col="op",
            ),
        ),
        (
            "relational_pagerank",
            lambda d, s: REL.pagerank(
                spark.range(50_000 * s)
                .select(F.col("id").alias("src"))
                .select(
                    "src",
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.col("src") * F.lit(m) + F.lit(a),
                                    # route edges AWAY from ids
                                    # divisible by 17 -> those nodes
                                    # have no out-edges (dangling)
                                    F.lit(50_000 * s),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                            ]
                        )
                    ).alias("dst"),
                )
                .filter(F.col("src") % 17 != 0),
                iters=3,
            ),
        ),
        # late-r10: CDC chunking + bigram LM run on the scaled docs dir
        # (suffixed replicas multiply the distinct vocab / bigram table
        # ~Nx — these measure the count-table growth, the part a 100-TB
        # corpus scales); zero-shuffle chunking should track scan volume
        ("pipeline_cdc_chunks", lambda d, s: Q.pipeline_cdc_chunks(spark, d)),
        ("pipeline_bigram_lm", lambda d, s: Q.pipeline_bigram_lm(spark, d)),
        # synchronous LPA on the same synthetic 4-out-regular graph as
        # pagerank (minus the dangling carve-out — LPA symmetrizes):
        # per-iteration cost = one keyed join + vote agg + top-1 window
        (
            "relational_lpa",
            lambda d, s: REL.label_propagation(
                spark.range(50_000 * s)
                .select(F.col("id").alias("src"))
                .select(
                    "src",
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.col("src") * F.lit(m) + F.lit(a),
                                    F.lit(50_000 * s),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                            ]
                        )
                    ).alias("dst"),
                ),
                iters=3,
            ),
        ),
        # degree-ordered triangle count on the same graph family plus a
        # degree-4096 hub (node 0): the orientation must keep the wedge
        # join bounded — an unoriented wedge join would pay hub_deg^2
        (
            "relational_triangles",
            lambda d, s: REL.triangle_count(
                spark.range(50_000 * s)
                .select(F.col("id").alias("src"))
                .select(
                    "src",
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.col("src") * F.lit(m) + F.lit(a),
                                    F.lit(50_000 * s),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                            ]
                        )
                    ).alias("dst"),
                )
                .union(
                    spark.range(4096).select(
                        F.lit(0).cast("long").alias("src"),
                        (F.col("id") * 12 + 1).alias("dst"),
                    )
                ),
            ),
        ),
        # r11 additions (r10 verdict task 6): the ops the 18-op record
        # missed. k-core on the same 4-out-regular family (+ the hub) —
        # per round a degree agg + two LEFT SEMI joins on the shrinking
        # edge list; must track edge volume
        (
            "relational_kcore",
            lambda d, s: REL.kcore_nodes(
                spark.range(50_000 * s)
                .select(F.col("id").alias("src"))
                .select(
                    "src",
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.col("src") * F.lit(m) + F.lit(a),
                                    F.lit(50_000 * s),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                            ]
                        )
                    ).alias("dst"),
                ),
                k=3,
                iters=3,
            ),
        ),
        # clustering coefficient = the triangle machinery + one explode
        # + keyed count; same graph + hub as relational_triangles
        (
            "relational_clustering",
            lambda d, s: REL.clustering_coefficient(
                spark.range(50_000 * s)
                .select(F.col("id").alias("src"))
                .select(
                    "src",
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.col("src") * F.lit(m) + F.lit(a),
                                    F.lit(50_000 * s),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                            ]
                        )
                    ).alias("dst"),
                )
                .union(
                    spark.range(4096).select(
                        F.lit(0).cast("long").alias("src"),
                        (F.col("id") * 12 + 1).alias("dst"),
                    )
                ),
            ),
        ),
        # r16: the same triangle/clustering graphs with the broadcast
        # bound forced to 0 — the BLOOM-PRUNED shuffled-semi closing
        # probe (the 100-TB branch) measured at 1x/10x edge volume
        (
            "relational_triangles_bloom",
            lambda d, s: forced_above_bound(
                lambda: REL.triangle_count(tri_hub_graph(s))
            ),
        ),
        (
            "relational_clustering_bloom",
            lambda d, s: forced_above_bound(
                lambda: REL.clustering_coefficient(tri_hub_graph(s))
            ),
        ),
        # r11: fixed-5-round connected components on the same family —
        # per round one keyed join + MIN agg
        (
            "relational_components",
            lambda d, s: REL.connected_components(
                spark.range(50_000 * s)
                .select(F.col("id").alias("src"))
                .select(
                    "src",
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.col("src") * F.lit(m) + F.lit(a),
                                    F.lit(50_000 * s),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                            ]
                        )
                    ).alias("dst"),
                ),
                iters=5,
            ),
        ),
        # r11: CONVERGED components (pointer shortcutting) on the same
        # family — rounds are O(log diameter) so 10x nodes should cost
        # ~one extra doubling round on top of linear per-round work
        (
            "relational_components_converged",
            lambda d, s: REL.connected_components_converged(
                spark.range(50_000 * s)
                .select(F.col("id").alias("src"))
                .select(
                    "src",
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.col("src") * F.lit(m) + F.lit(a),
                                    F.lit(50_000 * s),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                            ]
                        )
                    ).alias("dst"),
                ),
                max_rounds=30,
            ),
        ),
        # PSI drift between two synthetic samples (new = base shifted by
        # a mode jump for 1/8 of rows): two column-pruned histogram
        # scans + a constant-size bin join — time must track scan volume
        (
            "quality_psi",
            lambda d, s: QUAL.psi_drift(
                spark.range(2_000_000 * s).select(
                    F.pmod(F.col("id") * 7919, F.lit(1_000)).alias("v")
                ),
                spark.range(2_000_000 * s).select(
                    (
                        F.pmod(F.col("id") * 104_729, F.lit(1_000))
                        + F.when(F.col("id") % 8 == 0, 200).otherwise(0)
                    ).alias("v")
                ),
                "v",
                lo=0,
                width=100,
                nbins=12,
            ),
        ),
        # PMI collocations over the scaled docs (suffixed replicas grow
        # the bigram count table ~Nx — the part that scales)
        ("pipeline_pmi", lambda d, s: Q.documents_pmi_collocations(spark, d)),
        # the sharded PQ scan — its scaling IS its reason to exist:
        # codes never collected, SUMMA-style shard x query-block
        # cogroup; trained on the 1x pool, scanned over the Nx pool
        (
            "similarity_pq_sharded",
            lambda d, s: SIM.pq_topk(emb_at(d), k=3, sharded=True),
        ),
        # r11 (r10 verdict task 3): 64-merge BPE train, incremental
        # (delta-maintained pair counts) vs full recount, same corpus.
        # The full twin pays the whole exploded-pair shuffle + a
        # full-vocab materialization PER MERGE; the incremental one
        # pays the seed shuffle once, then per-merge work bounded by
        # the affected words + the distinct-pair table. The committed
        # evidence is the widening inc-vs-full gap at 10x vocab, not
        # just the exponent (both paths also scan the vocab per merge).
        # Trains run at query-construction time; count() on the 1-row
        # summary forces nothing further.
        (
            "bpe_train64_incremental",
            lambda d, s: _bpe64_summary(spark, d, incremental=True),
        ),
        (
            "bpe_train64_full",
            lambda d, s: _bpe64_summary(spark, d, incremental=False),
        ),
        # r12: batched exact merge selection (top-m disjoint prefix per
        # driver round-trip) — the metric of record is round-trips per
        # merge (< 1; see bpe_train docstring), the time column is the
        # same overhead-dominated regime as the full twin
        (
            "bpe_train64_batched8",
            lambda d, s: _bpe64_summary(
                spark, d, incremental=False, batch_merges=8
            ),
        ),
        # r12 (r11 verdict task 8): native JPEG decode throughput at
        # 1x/10x payload count — an Arrow-batched map-only stage, the
        # exponent should be ~0 on a 32-core box until tasks saturate
        (
            "multimodal_resize_jpeg",
            lambda d, s: MM.resize_images(_jpeg_corpus(spark, s), out_h=8, out_w=8),
        ),
        # shared-neighbor Jaccard on a synthetic bipartite graph with
        # the IVF-style deployment rule: the RIGHT key space scales
        # with the corpus (constant right-degree ~128), mirroring how
        # a real catalog grows with its fact table; the valve then
        # guards outliers, not the whole graph
        (
            "relational_jaccard",
            lambda d, s: REL.shared_neighbor_jaccard(
                spark.range(50_000 * s).select(
                    F.col("id").alias("src"),
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.col("id") * F.lit(m) + F.lit(a),
                                    F.lit(max(50_000 * s // 16, 1)),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11))
                            ]
                        )
                    ).alias("dst"),
                ),
                max_neighbor_degree=1000,
                min_inter=2,
            ),
        ),
        # r12 session additions ------------------------------------
        # directional containment: same valve-bounded inverted-index
        # join economics as ngram_jaccard (suffixed replicas keep the
        # near-dup rate constant, so output rows grow ~Nx)
        ("pipeline_containment", lambda d, s: Q.pipeline_containment(spark, d)),
        # r16 (verdict task 7): the prefix-filter pair generator — the
        # one r15-optimized inverted-index family member the ledger
        # lacked an exponent for
        (
            "pipeline_prefix_filter",
            lambda d, s: Q.pipeline_prefix_filter_pairs(spark, d),
        ),
        # corpus TextRank: explode + per-doc lead + distinct-edge agg +
        # fixed-3 pagerank; vocab (nodes) and edges both grow ~Nx with
        # the suffixed replicas
        ("documents_textrank", lambda d, s: Q.documents_textrank(spark, d)),
        # char entropy: linear explode + two doc-keyed aggs
        ("documents_char_entropy", lambda d, s: Q.documents_char_entropy(spark, d)),
        # WAV attach+decode+window stats: two map-only Arrow passes
        ("multimodal_audio_wav", lambda d, s: Q.multimodal_audio_wav(spark, d)),
        # SQ8 GEMM: queries AND pool both scale Nx (self-join), so
        # total distance work is N^2 — the honest pq_sharded-style note
        ("ann_sq8_top3", lambda d, s: SIM.sq8_topk(emb_at(d), k=3)),
        # W1 drift over synthetic value samples (200k -> 2M per side):
        # two-phase prefix scan — time should track distinct-value
        # volume, never a global sort
        (
            "quality_w1_drift",
            lambda d, s: __import__(
                "xesmf_spark.quality", fromlist=["w1_drift"]
            ).w1_drift(
                spark.range(200_000 * s).select(
                    F.pmod(F.col("id") * 7919, F.lit(1_000_003)).alias("v")
                ),
                spark.range(200_000 * s).select(
                    (F.pmod(F.col("id") * 104_729, F.lit(1_000_003)) + 50_000).alias(
                        "v"
                    )
                ),
                "v",
                n_buckets=64,
            ),
        ),
        # weighted PageRank on the same synthetic shape (weights from
        # the id mix): per-round cost identical to the uniform op
        (
            "relational_pagerank_weighted",
            lambda d, s: REL.pagerank_weighted(
                spark.range(50_000 * s)
                .select(F.col("id").alias("src"))
                .select(
                    "src",
                    F.explode(
                        F.array(
                            *[
                                F.struct(
                                    F.pmod(
                                        F.col("src") * F.lit(m) + F.lit(a),
                                        F.lit(50_000 * s),
                                    ).alias("d"),
                                    (F.pmod(F.col("src"), F.lit(9)) + 1).alias(
                                        "wt"
                                    ),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                            ]
                        )
                    ).alias("e"),
                )
                .select("src", F.col("e.d").alias("dst"), F.col("e.wt").alias("w")),
                iters=3,
            ),
        ),
        # HITS on the pagerank synthetic graph shape: two keyed joins +
        # two scalar broadcasts per iteration — same O(E)/round contract
        (
            "relational_hits",
            lambda d, s: REL.hits(
                spark.range(50_000 * s)
                .select(F.col("id").alias("src"))
                .select(
                    "src",
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.col("src") * F.lit(m) + F.lit(a),
                                    F.lit(50_000 * s),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                            ]
                        )
                    ).alias("dst"),
                ),
                iters=3,
            ),
        ),
        # personalized PageRank on the pagerank synthetic shape with
        # a fixed 1000-node seed set: per-round cost identical to the
        # uniform op (one keyed join + SUM + scalar dangling agg)
        (
            "relational_ppr",
            lambda d, s: REL.pagerank_personalized(
                spark.range(50_000 * s)
                .select(F.col("id").alias("src"))
                .select(
                    "src",
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.col("src") * F.lit(m) + F.lit(a),
                                    F.lit(50_000 * s),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                            ]
                        )
                    ).alias("dst"),
                ),
                spark.range(1000).select(F.col("id").alias("node")),
                iters=3,
            ),
        ),
        # r13 additions --------------------------------------------
        # skyline: uniform-random 2-D points (hash-mixed), expected
        # frontier O(log n) — phase 1 is a linear per-batch prune,
        # phase 2 a frontier-sized broadcast anti-join
        (
            "relational_skyline",
            lambda d, s: REL.skyline(
                spark.range(500_000 * s).select(
                    "id",
                    F.pmod(F.col("id") * 7919 + 13, F.lit(1_000_003))
                    .cast("double")
                    .alias("price"),
                    F.pmod(F.col("id") * 104_729 + 7, F.lit(1_000_003)).alias(
                        "size"
                    ),
                ),
                maximize=["size"],
                minimize=["price"],
            ),
        ),
        # basket rules: baskets grow Nx, catalog (200 items) and
        # basket size (4) constant — pair space bounded at 200^2,
        # per-basket pair join basket-size-bounded
        (
            "relational_basket_rules",
            lambda d, s: REL.basket_rules(
                spark.range(100_000 * s).select(
                    F.col("id").alias("basket_id"),
                    F.explode(
                        F.array(
                            *[
                                F.pmod(
                                    F.col("id") * F.lit(m) + F.lit(a),
                                    F.lit(200),
                                )
                                for m, a in ((17, 3), (31, 7), (13, 11), (7, 29))
                            ]
                        )
                    ).alias("item"),
                ),
                min_pair_support=2,
            ),
        ),
        # record linkage: records grow Nx at CONSTANT block size (20)
        # — the number of blocks grows, within-block quadratic fixed;
        # the honest linear regime of any blocked matcher
        (
            "pipeline_record_linkage",
            lambda d, s: PIPE.record_linkage_pairs(
                spark.range(200_000 * s).select(
                    "id",
                    F.expr("id div 20").alias("blk"),
                    F.format_string(
                        "rec-%09d",
                        F.pmod(F.col("id") * 7919, F.lit(1_000_000_000)),
                    ).alias("name"),
                    F.pmod(F.col("id") * 31, F.lit(50)).alias("ab"),
                ),
                id_col="id",
                block_cols=["blk"],
                fields=[("name", "lev", 700_000), ("ab", "exact", 300_000)],
                # hash-mixed 9-digit names sit at lev ~7-9 of 13; 500k
                # keeps the ab-match + name-similarity tail so the
                # measured run emits real pairs (0-row outputs measure
                # the filter, not the matcher)
                min_score_micro=500_000,
            ),
        ),
        # CUSUM on synthetic rollup state: keys grow Nx at constant
        # 1000-bucket series length; per-key windows + one scalar agg
        (
            "timeseries_cusum",
            lambda d, s: TS.cusum_changepoints(
                spark.range(1_000_000 * s).select(
                    F.expr("id div 1000").alias("k"),
                    F.pmod(F.col("id"), F.lit(1000)).alias("t"),
                    F.pmod(F.col("id") * 7919, F.lit(1000)).alias("x"),
                ),
                ["k"],
                "t",
                "x",
            ),
        ),
        # JL projection: one posexplode + broadcast sign join + keyed
        # SUM — linear in n * in_dim * out_dim
        (
            "similarity_rp_project",
            lambda d, s: SIM.random_projection(
                emb_at(d), out_dim=16, in_dim=64
            ),
        ),
        # hashing trick: one explode + one keyed SUM over the scaled
        # corpus — linear in token volume, vocabulary-free
        (
            "pipeline_feature_hash",
            lambda d, s: PIPE.feature_hash(
                spark.read.parquet(f"{d}/documents.parquet"), n_features=64
            ),
        ),
        # positional proximity: posexplode + two term filters + one
        # doc-keyed pair join; replica suffixing means only the base
        # replica's tokens match the query terms, so the MEASURED cost
        # is the tokenize+filter scan (linear in corpus) at constant
        # match volume
        (
            "search_proximity",
            lambda d, s: __import__(
                "xesmf_spark.search", fromlist=["proximity_pairs"]
            ).proximity_pairs(
                spark.read.parquet(f"{d}/documents.parquet"),
                "merge",
                "join",
                max_gap=3,
            ),
        ),
        # sequential patterns: one window pass + union + keyed agg
        # over a synthetic session stream (sessions grow Nx at
        # constant length/alphabet)
        (
            "relational_sequential",
            lambda d, s: REL.sequential_patterns(
                spark.range(1_000_000 * s).select(
                    F.expr("id div 10").alias("sess"),
                    (F.col("id") % 10).alias("t"),
                    F.concat(
                        F.lit("e"),
                        F.pmod(
                            F.col("id") * 7 + F.expr("id div 10") * 3,
                            F.lit(6),
                        ).cast("string"),
                    ).alias("item"),
                ),
                "sess",
                ["t"],
                "item",
                max_len=3,
                min_support=2,
            ),
        ),
        # seasonal decomposition on the same synthetic state shape:
        # one RANGE window + one phase-mean agg + join-back per key
        (
            "timeseries_seasonal",
            lambda d, s: TS.seasonal_decompose(
                spark.range(1_000_000 * s).select(
                    F.expr("id div 1000").alias("k"),
                    F.pmod(F.col("id"), F.lit(1000)).alias("t"),
                    F.pmod(F.col("id") * 7919, F.lit(1000)).alias("x"),
                ),
                ["k"],
                "t",
                "x",
                period=7,
            ),
        ),
        # r14 ledger-debt entries (r13 verdict task 6) ----------------
        # temperature mixing: per-source size agg (sources constant) +
        # one per-source rank window over the scaled corpus
        (
            "pipeline_mixture_sample",
            lambda d, s: PIPE.mixture_sample(
                spark.read.parquet(f"{d}/documents.parquet"), total=200
            ),
        ),
        # RRF fusion: two ranked legs FULL-OUTER joined on
        # (query, neighbor) + one per-query top-k window; queries grow
        # Nx at constant leg depth 5
        (
            "search_hybrid_rrf",
            lambda d, s: __import__(
                "xesmf_spark.search", fromlist=["hybrid_rrf"]
            ).hybrid_rrf(
                spark.range(500_000 * s).select(
                    F.expr("id div 5").alias("query_id"),
                    F.pmod(F.col("id") * 7919 + 13, F.lit(100_000 * s)).alias(
                        "neighbor_id"
                    ),
                    (F.col("id") % 5 + 1).alias("rank"),
                ),
                spark.range(500_000 * s).select(
                    F.expr("id div 5").alias("query_id"),
                    F.pmod(F.col("id") * 104729 + 7, F.lit(100_000 * s)).alias(
                        "neighbor_id"
                    ),
                    (F.col("id") % 5 + 1).alias("rank"),
                ),
                topk=3,
            ),
        ),
        # MMR rerank: queries AND pool both scale Nx (self set), so the
        # retrieval stage's total work is N^2 — the sq8/pq_sharded
        # honest-exponent note; the rerank itself is pool_k-bounded
        ("similarity_mmr_topk", lambda d, s: SIM.mmr_topk(emb_at(d), k=3, pool_k=8)),
        # leakage-free split: one group join + md5 route; docs grow Nx
        # at constant group size 4
        (
            "pipeline_grouped_split",
            lambda d, s: PIPE.grouped_split(
                spark.range(1_000_000 * s).select(
                    F.col("id").alias("doc_id"),
                    F.col("id").cast("string").alias("text"),
                ),
                spark.range(1_000_000 * s).select(
                    F.col("id").alias("doc_id"),
                    F.expr("id div 4").alias("keep_id"),
                ),
            ),
        ),
        # KS drift: two-sample CDF prefix scan over distinct values —
        # time tracks distinct-value volume (the w1_drift shape)
        (
            "quality_ks_drift",
            lambda d, s: QUAL.ks_drift(
                spark.range(1_000_000 * s).select(
                    F.pmod(F.col("id") * 7919, F.lit(100_000)).alias("v")
                ),
                spark.range(1_000_000 * s).select(
                    (F.pmod(F.col("id") * 104729, F.lit(100_000)) + 5_000).alias(
                        "v"
                    )
                ),
                "v",
            ),
        ),
        # multi-source Bellman-Ford: 4 fixed rounds of keyed edge join
        # + min agg; nodes/edges grow Nx, sources constant
        (
            "trade_graph_shortest_paths",
            lambda d, s: REL.shortest_paths(
                spark.range(600_000 * s).select(
                    F.expr("id div 3").alias("src"),
                    F.pmod(
                        F.expr("id div 3") * (F.col("id") % 3 * 2 + 3) + 1,
                        F.lit(200_000 * s),
                    ).alias("dst"),
                    (F.pmod(F.col("id") * 7919, F.lit(90)) + 10).alias("w"),
                ),
                spark.range(10).select(F.col("id").alias("node")),
                iters=4,
            ),
        ),
        # Theil-Sen: keys grow Nx at CONSTANT 200-bucket series — the
        # per-key B^2/2 pair join is the fixed domain constant the
        # max_buckets valve pins; time tracks key volume
        (
            "timeseries_theilsen",
            lambda d, s: TS.theilsen_slope(
                spark.range(200_000 * s).select(
                    F.expr("id div 200").alias("k"),
                    F.pmod(F.col("id"), F.lit(200)).alias("t"),
                    (
                        F.pmod(F.col("id"), F.lit(200)) * 3
                        + F.pmod(F.col("id") * 7919, F.lit(40))
                    ).alias("x"),
                ),
                ["k"],
                "t",
                "x",
            ),
        ),
        # sample ACF: one keyed equi-join of state against its
        # lag-exploded self (state x max_lag rows); keys grow Nx at
        # constant 1000-bucket length
        (
            "timeseries_acf",
            lambda d, s: TS.acf(
                spark.range(1_000_000 * s).select(
                    F.expr("id div 1000").alias("k"),
                    F.pmod(F.col("id"), F.lit(1000)).alias("t"),
                    F.pmod(F.col("id") * 7919, F.lit(1000)).alias("x"),
                ),
                ["k"],
                "t",
                "x",
                max_lag=5,
            ),
        ),
        # gap interpolation: LEAD window + range explode of gap spans;
        # keys grow Nx at constant series length and 50% gap density
        (
            "timeseries_interpolate",
            lambda d, s: TS.interpolate_gaps(
                spark.range(500_000 * s).select(
                    F.expr("id div 500").alias("k"),
                    (F.pmod(F.col("id"), F.lit(500)) * 2).alias("t"),
                    F.pmod(F.col("id") * 7919, F.lit(1000)).alias("x"),
                ),
                ["k"],
                "t",
                "x",
            ),
        ),
        # trimmed/winsorized means: two rank windows + one agg per
        # group; groups grow Nx at constant 1000-value size
        (
            "quality_robust_stats",
            lambda d, s: QUAL.robust_stats(
                spark.range(1_000_000 * s).select(
                    F.expr("id div 1000").alias("k"),
                    F.pmod(F.col("id") * 7919, F.lit(100_000)).alias("x"),
                ),
                ["k"],
                "x",
            ),
        ),
        # Benford audit: one projection + 9-bucket map-combinable count
        # + broadcast digit axis; groups grow Nx at constant size
        (
            "quality_benford",
            lambda d, s: QUAL.benford_audit(
                spark.range(1_000_000 * s).select(
                    F.expr("id div 10000").alias("k"),
                    (F.pmod(F.col("id") * 7919, F.lit(99_999)) + 1).alias("x"),
                ),
                "x",
                group_cols=["k"],
            ),
        ),
        # native AVI attach+decode+frame stats: two map-only Arrow
        # passes over the scaled documents table (payload count ~Nx)
        ("multimodal_video_avi", lambda d, s: Q.multimodal_video_avi(spark, d)),
        # r14 second-half ops ------------------------------------------
        # winnowing: linear char-gram explode x w window memberships +
        # keyed MIN; suffixed replicas share no grams, so pair volume
        # stays base-rate while fingerprint volume grows Nx
        ("pipeline_winnowing", lambda d, s: Q.documents_winnowing(spark, d)),
        # Dirichlet QL: one token explode filtered to |q| terms + a
        # docs x |q| broadcast score — linear in corpus tokens
        (
            "search_query_likelihood",
            lambda d, s: Q.documents_query_likelihood(spark, d),
        ),
        # attribution: user-keyed conversion x touch join + one
        # per-conversion window; users grow Nx at constant 20-event
        # activity (19 touches then a purchase) — linear in events
        (
            "relational_attribution",
            lambda d, s: REL.attribution(
                spark.range(1_000_000 * s).select(
                    F.col("id").alias("event_id"),
                    (F.col("id") * 1_000_000_000).alias("ts"),
                    F.expr("id div 20").alias("user_id"),
                    F.when(F.col("id") % 20 == 19, F.lit("purchase"))
                    .when(F.col("id") % 2 == 0, F.lit("view"))
                    .otherwise(F.lit("click"))
                    .alias("event_type"),
                    (F.pmod(F.col("id"), F.lit(500)) + 1).cast("double").alias(
                        "value"
                    ),
                ),
                conversion_type="purchase",
                touch_types=["view", "click"],
                lookback_days=7,
            ),
        ),
        # CCF: one bucket-keyed equi-join of A devs against B's
        # lag-exploded devs — state-shaped; buckets grow Nx
        (
            "timeseries_ccf",
            lambda d, s: TS.cross_correlation(
                spark.range(100_000 * s).select(
                    F.col("id").alias("day"),
                    F.pmod(F.col("id") * 7919, F.lit(1000)).alias("cents"),
                ),
                spark.range(100_000 * s).select(
                    (F.col("id") + 2).alias("day"),
                    (F.pmod(F.col("id") * 7919, F.lit(1000)) + 50).alias("cents"),
                ),
                "day",
                "cents",
                max_lag=3,
            ),
        ),
        # RAKE: one per-doc window pass + two keyed aggs over the
        # scaled corpus — linear in tokens
        ("pipeline_rake", lambda d, s: Q.documents_rake(spark, d)),
        # Holt smoothing: per-key sequential fold over collected STATE
        # (constant 1000-bucket series); keys grow Nx
        (
            "timeseries_holt",
            lambda d, s: TS.holt_smooth(
                spark.range(1_000_000 * s).select(
                    F.expr("id div 1000").alias("k"),
                    F.pmod(F.col("id"), F.lit(1000)).alias("t"),
                    F.pmod(F.col("id") * 7919, F.lit(1000)).alias("x"),
                ),
                ["k"],
                "t",
                "x",
            ),
        ),
        # r15 ledger stragglers (r14 verdict #5): NB training IS one
        # token-keyed groupBy (word counting) + the keyed vocab scoring
        # join + per-doc agg — linear in corpus tokens
        ("pipeline_nb_quality", lambda d, s: Q.pipeline_nb_quality(spark, d)),
        # dedup_spans(exact_run=...): the longest-run refinement adds
        # one diagonal-chain keyed agg + window on the existing gram
        # explode — still no pair join, linear in gram volume
        ("pipeline_exactsubstr", lambda d, s: Q.pipeline_exactsubstr(spark, d)),
        # r15: trigram LM — three Zipf-bounded count shuffles + five
        # keyed scoring joins; linear in corpus tokens
        ("pipeline_trigram_lm", lambda d, s: Q.pipeline_trigram_lm(spark, d)),
        # r15: domain caps — pure projection + salted two-stage top-k
        # window + zero-shuffle stratified filter; linear in docs
        ("pipeline_domain_caps", lambda d, s: Q.pipeline_domain_caps(spark, d)),
        # r15: Kneser-Ney — ONE persisted bigram-type shuffle + three
        # aggregates OF the type table + keyed scoring joins
        ("pipeline_kneser_ney_lm", lambda d, s: Q.pipeline_kneser_ney_lm(spark, d)),
        # r15: hashed-feature importance weights — one explode + one
        # (id, bucket) keyed count + an n_buckets-row broadcast model;
        # linear in token volume
        ("pipeline_dsir", lambda d, s: Q.pipeline_dsir(spark, d)),
        # r15: recency sampling — pure projection + filter, zero shuffle
        ("pipeline_recency_sample", lambda d, s: Q.pipeline_recency_sample(spark, d)),
        # r15: Gopher dup-line stats — per-row higher-order array ops,
        # zero shuffle
        ("documents_dup_lines", lambda d, s: Q.documents_dup_lines(spark, d)),
        # r15: prefix-doubling suffix ranks over the WHOLE scaled
        # corpus (the registered query caps at 60 docs) — log2(16)=4
        # rounds of keyed join + two-phase distributed dense rank;
        # expect ~linear in total chars
        (
            "relational_suffix_ranks",
            lambda d, s: REL.suffix_ranks(
                spark.read.parquet(f"{d}/documents.parquet").select(
                    "doc_id", PIPE.normalize_text(F.col("text")).alias("text")
                ),
                k=16,
            ),
        ),
        # r15: full-order suffix ranking + rank-stack LCP walk over the
        # WHOLE scaled corpus — ~log2(max_len) doubling + as many walk
        # rounds, each one keyed join per leg; rounds are constant in
        # corpus SIZE (max doc length doesn't grow), so expect ~linear
        (
            "relational_longest_repeats",
            lambda d, s: REL.longest_repeats(
                spark.read.parquet(f"{d}/documents.parquet").select(
                    "doc_id", PIPE.normalize_text(F.col("text")).alias("text")
                ),
                top_k=10,
            ),
        ),
    ]

    def measure(fn, sf_dir, scale):
        best, rows = math.inf, None
        for _ in range(trials):
            release_persisted()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = fn(sf_dir, scale).count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), rows

    # per-op context the exponent alone can't carry — merged into the
    # written entries so the artifact is self-explaining
    notes = {
        "relational_triangles_bloom": (
            "closing probe FORCED above the broadcast bound: bloom-pruned "
            "wedge table + shuffled semi join (the 100-TB branch); same "
            "graph as relational_triangles, which measures the broadcast "
            "branch at these edge counts"
        ),
        "relational_clustering_bloom": (
            "bloom-pruned shuffled-semi closing probe (see "
            "relational_triangles_bloom)"
        ),
        "pipeline_exactsubstr": (
            "count() prunes the final cleaned-text md5 projection (a "
            "key-unique left join is cardinality-neutral), so the exponent "
            "tracks the gram/valve/island machinery — the part the r16 "
            "two-level agg restructured"
        ),
        "similarity_pq_sharded": (
            "queries AND codes both scale Nx (the pool is the query set), "
            "so total ADC work grows N^2 and exponent ~1 IS the honest "
            "linear-per-query result; the op's scale claim is per-QUERY "
            "cost flat in shards, not sublinear total work"
        ),
        "bpe_train64_incremental": (
            "per-merge cost flat at 10x vocab (the delta design's claim); "
            "absolute time LOSES to the full recount at this scale — "
            "fixed per-merge costs dominate, crossover documented on "
            "bpe_train (default is incremental=False)"
        ),
        "bpe_train64_full": (
            "the default path: one exploded-pair shuffle per merge; flat "
            "here because at this vocab the shuffle is overhead-dominated"
        ),
        "bpe_train64_batched8": (
            "exact top-m disjoint-prefix selection: 60 sweeps / 64 merges "
            "= 0.94 round-trips per merge on this overlap-dense ranking "
            "(top pairs chain); wall-clock parity with the sequential twin "
            "- the payoff regime (disjoint top-m at 32k-rank vocabs) is "
            "beyond this box's corpora, documented on bpe_train"
        ),
        "multimodal_resize_jpeg": (
            "map-only Arrow decode of driver-staged payloads; near-flat "
            "exponent expected until 96*s tasks saturate 32 cores, then "
            "~linear in payload bytes per core"
        ),
        "pipeline_unigram_tok": (
            "per-iteration cost rides the DISTINCT-WORD table (Viterbi "
            "kernel pass + one keyed count shuffle); corpus size enters "
            "only through the one word-count shuffle"
        ),
        "pipeline_cdc_chunks": (
            "exponent ~ linear in emitted chunks (the output volume any "
            "chunker must emit); n_copies is a map-combinable groupBy + "
            "AQE-splittable join-back since r11, not a hot-key window"
        ),
        "ann_sq8_top3": (
            "queries AND pool both scale Nx (self-join), so total "
            "distance work grows N^2 and exponent ~1 is the honest "
            "linear-per-query result (the pq_sharded note); per-query "
            "cost is flat in pool shards"
        ),
        "quality_w1_drift": (
            "two-phase prefix scan over distinct values + bucket-lead "
            "gap stitch; time tracks distinct-value volume"
        ),
        "relational_skyline": (
            "phase-1 per-batch prune is linear; phase-2 anti-join runs "
            "on the frontier-sized candidate set (O(log n) expected on "
            "this uniform 2-D mix), so wall time tracks the scan"
        ),
        "relational_basket_rules": (
            "pair space bounded by the constant 200-item catalog; "
            "per-basket pair join is basket-size-bounded — time tracks "
            "basket volume"
        ),
        "pipeline_record_linkage": (
            "constant block size (20): block COUNT grows Nx, "
            "within-block quadratic fixed — the honest linear regime of "
            "any blocked matcher; JVM levenshtein, no Python"
        ),
        "similarity_rp_project": (
            "declarative projection path: explode + broadcast sign join "
            "+ map-side-combinable keyed SUM; linear in pool rows at "
            "constant dims"
        ),
        "relational_ppr": (
            "same per-round shape as relational_pagerank (keyed edge "
            "join + SUM + scalar dangling broadcast); the seed set is "
            "a constant"
        ),
        "pipeline_feature_hash": (
            "explode + map-side-combinable keyed SUM; linear in token "
            "volume (the hashing trick's point — no vocabulary pass)"
        ),
        "search_proximity": (
            "tokenize+filter scan linear in corpus; match volume "
            "constant under replica suffixing (only base-replica "
            "tokens equal the query terms) — the pair join itself is "
            "doc-keyed and tf-bounded"
        ),
        "relational_sequential": (
            "window LEADs + union + keyed agg; sessions grow Nx at "
            "constant length — linear in events"
        ),
        "timeseries_cusum": (
            "per-key windows over rollup state; keys grow Nx at "
            "constant series length — linear in state rows"
        ),
        "timeseries_seasonal": (
            "one RANGE window + phase-mean agg + join-back; linear in "
            "state rows at constant period"
        ),
        "documents_textrank": (
            "fixed-3 pagerank over the token co-occurrence graph; "
            "nodes/edges grow ~Nx with suffixed replicas, per-round "
            "cost one keyed join + SUM"
        ),
        "pipeline_mixture_sample": (
            "per-source size agg (sources a constant set) + one "
            "per-source rank window; output bounded by total=200"
        ),
        "search_hybrid_rrf": (
            "full-outer (query, neighbor) join of two ranked legs + "
            "per-query top-k window; queries grow Nx at constant leg "
            "depth — linear in leg rows"
        ),
        "similarity_mmr_topk": (
            "queries AND pool both scale Nx (self set), so the "
            "retrieval stage's total work is N^2 (the sq8/pq_sharded "
            "honest-exponent note); the MMR rerank itself is "
            "pool_k-bounded per query"
        ),
        "pipeline_grouped_split": (
            "one keyed group join + md5 route — linear in docs at "
            "constant group size"
        ),
        "quality_ks_drift": (
            "two-sample CDF prefix scan over distinct values + 1-row "
            "sup agg; time tracks distinct-value volume (constant "
            "100k domain here, so near-flat is the honest shape)"
        ),
        "trade_graph_shortest_paths": (
            "4 fixed rounds of keyed edge join + MIN agg; edge volume "
            "grows Nx, the reached set stays frontier-bounded "
            "(constant 10 sources x branching^4), so rows are flat "
            "while join cost tracks edges"
        ),
        "timeseries_theilsen": (
            "keys grow Nx at CONSTANT 200-bucket series — the per-key "
            "B^2/2 pair join is the fixed domain constant the "
            "max_buckets=2000 valve pins; linear in keys"
        ),
        "timeseries_acf": (
            "state x max_lag keyed self-join + two SUM aggs; keys "
            "grow Nx at constant series length — linear in state rows"
        ),
        "timeseries_interpolate": (
            "one LEAD window + gap-span range explode; output bounded "
            "by filled buckets (constant 50% gap density)"
        ),
        "quality_robust_stats": (
            "two rank windows + one agg per group; groups grow Nx at "
            "constant 1000-value size — linear in rows"
        ),
        "quality_benford": (
            "one projection + 9-bucket map-combinable count + "
            "broadcast 9-row axis; linear in rows (sub-second at both "
            "scales — exponent is JVM-warmup noise, the 1x number "
            "carries first-run overhead)"
        ),
        "multimodal_video_avi": (
            "two map-only Arrow passes (attach + decode/frame-stats); "
            "payload count ~Nx, near-flat until 32 cores saturate"
        ),
        "pipeline_winnowing": (
            "linear char-gram explode x w window memberships + keyed "
            "MIN + df-valved pair join; suffixed replicas share no "
            "grams so pair volume stays base-rate"
        ),
        "search_query_likelihood": (
            "token explode filtered to |q| terms + docs x |q| "
            "broadcast score + doc-keyed agg — linear in corpus tokens"
        ),
        "timeseries_holt": (
            "per-key sequential integer fold over collected rollup "
            "STATE (constant series length, max_buckets valve); keys "
            "grow Nx — linear in state rows"
        ),
        "timeseries_ccf": (
            "two scalar mean join-backs + one bucket-keyed equi-join "
            "against the (2L+1)-exploded B devs — linear in state rows"
        ),
        "pipeline_rake": (
            "one per-doc gaps-and-islands window + two (doc, x)-keyed "
            "map-combinable aggs + one join-back — linear in tokens; "
            "replica suffixing de-stopwords the replicas (no "
            "delimiters -> over-long runs filtered), so OUTPUT stays "
            "base-rate while token volume grows Nx — the time column "
            "is the honest signal"
        ),
        "relational_attribution": (
            "user-keyed conversion x touch join + per-conversion "
            "window; users grow Nx at constant activity — linear in "
            "events (per-user pair volume is the bounded domain "
            "constant every attribution engine pays)"
        ),
        "pipeline_nb_quality": (
            "NB training IS one token-keyed groupBy (word counting); "
            "scoring is the keyed vocab equi-join + per-doc agg — "
            "linear in corpus tokens (vocab grows Nx under replica "
            "suffixing, which the keyed join is built for)"
        ),
        "pipeline_exactsubstr": (
            "dedup_spans(exact_run=50): diagonal-chain run assembly on "
            "the existing gram explode — one extra keyed agg + window, "
            "no pair join; linear in gram volume"
        ),
        "pipeline_trigram_lm": (
            "three Zipf-bounded count shuffles (trigram/bigram/unigram "
            "types) + five keyed scoring joins + per-doc agg — linear "
            "in corpus tokens (type tables grow with suffixed replicas, "
            "all joins keyed equi)"
        ),
        "pipeline_domain_caps": (
            "pure-projection domain extraction + SALTED two-stage "
            "top-cap window (each salt partition's output bounded at "
            "cap — no hot mega-domain partition) + zero-shuffle md5 "
            "stratified filter; linear in docs"
        ),
        "pipeline_kneser_ney_lm": (
            "one persisted Zipf-bounded bigram-type shuffle + three "
            "aggregates OF the type table + three keyed scoring joins "
            "— linear in corpus tokens"
        ),
        "pipeline_dsir": (
            "one unigram+bigram explode + ONE persisted (id, bucket) "
            "keyed count shuffle feeding both the n_buckets-row model "
            "build and the scoring join (a broadcast of n_buckets "
            "rows) — linear in corpus tokens, vocabulary-free"
        ),
        "pipeline_recency_sample": (
            "pure projection + md5-threshold filter — zero shuffle, "
            "linear scan"
        ),
        "documents_dup_lines": (
            "per-row higher-order array ops (split/trim/distinct/"
            "occurrence counts) — zero shuffle, linear scan; per-doc "
            "cost O(lines · distinct), the repetition_stats trade"
        ),
        "relational_suffix_ranks": (
            "4 doubling rounds x (one keyed equi-join + one two-phase "
            "distributed dense rank: range repartition + per-partition "
            "window + O(#partitions) offset broadcast) — linear in "
            "total corpus chars per round, no global single-partition "
            "sort anywhere"
        ),
        "relational_longest_repeats": (
            "full-order doubling + rank-stack LCP walk: round COUNT is "
            "log2(max doc length) with Manber-Myers early termination "
            "(stop when all ranks distinct), constant in corpus size; "
            "each round one keyed join per leg — linear in total chars; "
            "gate measured NEUTRAL here (max doc 577, top repeat 573); "
            "its regime is long-doc corpora"
        ),
    }
    # streaming operators are deliberately ABSENT from this ledger:
    # their cost model is per-microbatch state maintenance (bounded by
    # watermark/valve contracts asserted in tests), not a corpus-
    # scaling exponent — replaying a 10x finite stream would measure
    # the batch engine twice
    exemptions = (
        "streaming ops (stream_*) — state-bounded by watermark/valve "
        "contracts, not corpus-exponent-shaped; see tests/test_streaming.py"
    )
    out = {
        "factor": factor,
        "base": base,
        "trials_min_of": trials,
        "exemptions": exemptions,
        "ops": {},
    }
    here0 = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior = os.path.join(here0, "SCALING_LOCAL.json")
    if only and os.path.isfile(prior):
        with open(prior) as f:
            out = json.load(f)
        out["exemptions"] = exemptions
        # refresh notes on carried-over entries too
        for n, note in notes.items():
            if n in out.get("ops", {}):
                out["ops"][n]["note"] = note
        workloads = [(n, fn) for n, fn in workloads if n in only]
    for name, fn in workloads:
        t1, r1 = measure(fn, base, 1)
        tn, rn = measure(fn, scaled, factor)
        exp = round(math.log(tn / t1) / math.log(factor), 3) if t1 > 0 else None
        out["ops"][name] = {
            "t_1x_sec": t1,
            f"t_{factor}x_sec": tn,
            "rows_1x": r1,
            f"rows_{factor}x": rn,
            "time_ratio": round(tn / t1, 2),
            "scaling_exponent": exp,
            "subquadratic": bool(tn < t1 * factor**2),
        }
        if name in notes:
            out["ops"][name]["note"] = notes[name]
        print(f"{name}: 1x {t1}s ({r1} rows) -> {factor}x {tn}s ({rn} rows) "
              f"exp={exp}", file=sys.stderr)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SCALING_LOCAL.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""r16 phase probes (guide §1: measure first) for the verdict's
candidate targets: pipeline_curate (where do the 3.8 s go — scrub
regex chain vs repetition_stats' higher-order exprs vs the tail?),
unigram train (seed vs EM kernel passes), exactsubstr (valve vs rest).

Each phase is timed with the noop sink in ONE fresh session,
min-of-2, labelled.  Usage: python scripts/probe_r16_phases.py [which ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, n=2):
    best = float("inf")
    for _ in range(n):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    print(f"PHASE {name}: {best:.3f}s")
    return best


def probe_curate(spark):
    from xesmf_spark import queries as Q
    from xesmf_spark.pipeline import repetition_stats, scrub_pii, stratified_sample
    from pyspark.sql import functions as F

    docs = Q._with_planted_pii(Q._docs(spark, SF))
    timed(spark, "curate/0 scan+plant", lambda: noop(docs))
    scrubbed = scrub_pii(docs).withColumn(
        "n_pii", F.col("n_emails") + F.col("n_ips") + F.col("n_phones")
    )
    timed(spark, "curate/1 +scrub", lambda: noop(scrubbed))
    enriched = repetition_stats(scrubbed, carry_cols=("lang", "n_pii"))
    timed(spark, "curate/2 +repetition", lambda: noop(enriched))
    kept = enriched.filter(
        (F.col("distinct_ratio") >= 0.4) & (F.col("top_token_frac") <= 0.12)
    )
    sampled = stratified_sample(kept, {"en": 0.5, "fr": 1.0, "zh": 0.2}, default=0.1)
    timed(spark, "curate/3 full query", lambda: Q.pipeline_curate(spark, SF).collect())
    # repetition WITHOUT the scrub feeding it (is the regex the cost,
    # or the higher-order token exprs?)
    rep_only = repetition_stats(docs, carry_cols=("lang",))
    timed(spark, "curate/4 repetition-minus-scrub", lambda: noop(rep_only))


def probe_unigram(spark):
    from xesmf_spark import queries as Q
    from xesmf_spark.bpe import bpe_word_counts
    from xesmf_spark.unigram import unigram_seed, _score_vocab, unigram_em_counts

    docs = Q._docs(spark, SF)
    t0 = time.perf_counter()
    words = bpe_word_counts(docs, "text").localCheckpoint(eager=True)
    print(f"PHASE unigram/0 word_counts+ckpt: {time.perf_counter()-t0:.3f}s")
    timed(spark, "unigram/1 seed agg", lambda: noop(unigram_seed(words, 4, 256)))
    vocab_rows = _score_vocab(unigram_seed(words, 4, 256)).collect()
    scores = {r["piece"]: int(r["score"]) for r in vocab_rows}
    timed(
        spark,
        "unigram/2 one EM pass (kernel+agg+collect)",
        lambda: unigram_em_counts(words, scores, 4).collect(),
    )
    timed(
        spark,
        "unigram/3 full train",
        lambda: Q.pipeline_unigram_tok(spark, SF).collect(),
    )
    timed(
        spark,
        "unigram/4 full encode query",
        lambda: Q.pipeline_unigram_encode(spark, SF).collect(),
    )


def probe_exactsubstr(spark):
    from xesmf_spark import queries as Q

    timed(
        spark, "exactsubstr/full",
        lambda: Q.pipeline_exactsubstr(spark, SF).collect(),
    )


def main():
    from xesmf_spark.session import get_spark
    from xesmf_spark import release_persisted

    which = sys.argv[1:] or ["curate", "unigram", "exactsubstr"]
    spark = get_spark("probe_r16")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    for w in which:
        globals()[f"probe_{w}"](spark)
        release_persisted()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()

"""End-to-end training-data prep: curate -> decontaminate -> classifier
gate -> semantically dedup -> split -> pack -> epoch-sharded layout.

Composes the round's engine extensions into the workflow an LLM data
team actually runs, end to end on real Spark plans:

1. quality gates: Gopher rule flags + the corpus-trained unigram-LM
   score (both broadcast/row-local -- no text shuffle);
2. benchmark decontamination: MinHash doc-level removal of training
   docs near-duplicate to a (broadcast) eval set;
3. NB classifier gate: weak labels from the unigram-LM score train a
   hashed-ngram Naive Bayes filter, applied via a broadcast weight
   join (the fastText-style curation gate, self-supervised here);
4. semantic dedup: Lloyd-trained k-means clusters over the embeddings
   table, within-cluster cosine prune (SemDeDup);
5. deterministic train/valid/test split (hash-based, replay-stable);
6. sequence packing: two-phase prefix-sum offsets + the per-chunk
   manifest for seq_len-token training blocks; plus a unigram-LM
   subword tokenizer trained on the CLEANED train split (curated text
   in, pieces out -- the order real pipelines use);
7. layout: the dataset written partitioned by split with row-group
   stats, plus epoch-0 training shards in reproducible shuffled order
   (write_epoch_shards -- one hash shuffle, no range exchange) AND a
   curriculum variant: quality-quantile stages, shuffled within stage
   (write_curriculum_shards -- easy-to-hard training order).

Documents pair with embeddings by id (doc_id == vec_id in the
testdata).  Run: ``python examples/run_training_data_prep.py [sf_dir]``
(default /root/testdata/sf0.01; writes under /tmp/spark_graft_prep).
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_stream_flink_user_address_spark.functions.classifier import (
    nb_quality_filter,
    train_nb_quality,
)
from data_stream_flink_user_address_spark.functions.curation import (
    gopher_quality_flags,
)
from data_stream_flink_user_address_spark.functions.dedup import (
    cross_corpus_decontaminate,
)
from data_stream_flink_user_address_spark.functions.ordering import (
    write_curriculum_shards,
    write_epoch_shards,
)
from data_stream_flink_user_address_spark.functions.packing import (
    chunk_manifest,
    histogram_pack,
    sequence_pack_offsets,
)
from data_stream_flink_user_address_spark.functions.sampling import hash_split
from data_stream_flink_user_address_spark.functions.semantic import semantic_dedup
from data_stream_flink_user_address_spark.functions.similarity import (
    train_ivf_centroids,
)
from data_stream_flink_user_address_spark.functions.text import (
    unigram_logprob_scores,
)
from data_stream_flink_user_address_spark.session import get_spark
from data_stream_flink_user_address_spark.sources.layout import write_partitioned
from data_stream_flink_user_address_spark.sources.tables import load_table

OUT = "/tmp/spark_graft_prep"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("training-data-prep")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(OUT, ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents", spread=True)
    embs = load_table(spark, sf_dir, "embeddings", spread=True)
    n_all = docs.count()

    # 1. quality gates ---------------------------------------------------
    flags = gopher_quality_flags(docs).select("doc_id", "keep")
    lm = unigram_logprob_scores(docs).select("doc_id", "logprob_score")
    gated = (
        docs.join(flags, "doc_id")
        .join(lm, "doc_id")
        .filter(F.col("keep") & (F.col("logprob_score") <= 9.0))
        .drop("keep")
    )
    n_gated = gated.count()

    # 2. benchmark decontamination: the "benchmark" here is a planted
    # copy of every 40th doc (id shifted out of range), so the stage
    # demonstrably removes the leaked sources --------------------------
    bench = gated.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    decon, leaks = cross_corpus_decontaminate(gated, bench, min_agreement=0.8)
    n_decon = decon.count()

    # 3. NB classifier gate: weak labels from the unigram-LM score
    # (best third = positive, worst third = negative) train the
    # hashed-ngram filter; threshold 0 keeps docs scoring positive ------
    cuts = decon.agg(
        F.expr("percentile_approx(logprob_score, 0.33)").alias("lo"),
        F.expr("percentile_approx(logprob_score, 0.67)").alias("hi"),
    ).collect()[0]
    seed_set = decon.filter(
        (F.col("logprob_score") <= cuts.lo) | (F.col("logprob_score") >= cuts.hi)
    ).withColumn("label", (F.col("logprob_score") <= cuts.lo).cast("int"))
    weights, info = train_nb_quality(seed_set, n_features=1 << 16)
    classified = nb_quality_filter(decon, weights, info, threshold=-1.0)
    n_classified = classified.count()

    # 4. semantic dedup over the paired embeddings -----------------------
    cent = train_ivf_centroids(embs, iters=2, centroid_stride=31, dim=64)
    sem = semantic_dedup(embs, cent, threshold=0.3, dim=64)
    survivors = classified.join(
        sem.filter("keep").select(F.col("vec_id").alias("doc_id")), "doc_id"
    )
    n_dedup = survivors.count()

    # 5. deterministic split (cached: the gates + Lloyd training + the
    # cluster scan above feed every remaining action -- without the
    # cache each count/write below re-runs the whole curation plan)
    split = hash_split(
        survivors, {"train": 0.9, "valid": 0.05, "test": 0.05}, seed=13
    ).cache()

    # 6. packing ---------------------------------------------------------
    train = split.filter(F.col("split") == "train")
    offs = sequence_pack_offsets(train, seq_len=512, bucket_size=1000)
    man = chunk_manifest(train, seq_len=512, bucket_size=1000)
    n_chunks = man.agg(F.max("chunk_id")).collect()[0][0]
    boundary = offs.filter(F.col("n_chunks_spanned") > 1).count()
    # contamination-free alternative: whole-doc SPFHP bins
    _, hp_stats = histogram_pack(train, seq_len=512)

    # 6b. subword tokenizer trained on the CLEANED train split (train
    # on curated text, not raw crawl -- the order every real pipeline
    # uses): unigram-LM pieces, then the corpus's subword compression
    from data_stream_flink_user_address_spark.functions.unigram_lm import (
        unigram_lm_encode,
        unigram_lm_train,
    )

    ulm_pieces = unigram_lm_train(
        train, vocab_size=256, max_piece_len=6, n_em_iters=2
    )
    ulm = unigram_lm_encode(train, ulm_pieces).agg(
        F.sum("n_pieces").alias("p"), F.sum("n_words").alias("w")
    ).collect()[0]

    # 7. layout ----------------------------------------------------------
    write_partitioned(
        split.select("doc_id", "text", "lang", "source", "split"),
        os.path.join(OUT, "dataset"),
        partition_by=["split"],
        sort_by=["doc_id"],
    )
    man.write.mode("overwrite").parquet(os.path.join(OUT, "manifest"))
    manifest = write_epoch_shards(
        train.select("doc_id", "text"),
        os.path.join(OUT, "epoch0"),
        n_shards=8,
        seed=13,
        epoch=0,
    )
    n_shards = manifest.count()
    # curriculum twin: the unigram-LM score is the difficulty axis
    # (LOW logprob = most fluent = stage 0 trains first)
    curr = write_curriculum_shards(
        train.select("doc_id", "text", "logprob_score"),
        os.path.join(OUT, "curriculum_epoch0"),
        "logprob_score",
        n_stages=3,
        n_shards=4,
        seed=13,
    )
    stage_sizes = {
        r.stage: r.n for r in
        curr.groupBy("stage").agg(F.sum("n_rows").alias("n")).collect()
    }

    per_split = {r["split"]: r["n"] for r in
                 split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"docs: {n_all} -> quality-gated: {n_gated} "
          f"-> decontaminated: {n_decon} (removed {leaks.select('doc_id').distinct().count()} leaks)"
          f" -> classifier-gated: {n_classified} -> semantically deduped: {n_dedup}")
    print(f"splits: {per_split}")
    print(f"epoch-0 train order written as {n_shards} shards under {OUT}/epoch0")
    print(f"curriculum epoch-0 (easy-first by LM score): stage sizes {stage_sizes}")
    print(f"train packs into {n_chunks + 1 if n_chunks is not None else 0} chunks "
          f"of 512 tokens; {boundary} docs cross a chunk boundary")
    print(f"no-split SPFHP packing: {hp_stats['n_bins']} bins, "
          f"padding {hp_stats['padding_frac']:.1%} ({hp_stats['n_patterns']} patterns)")
    print(f"unigram-LM tokenizer (256 pieces) trained on the clean train "
          f"split: {ulm['p'] / ulm['w']:.2f} pieces/word")
    print(f"dataset + manifest written under {OUT}")


if __name__ == "__main__":
    main()

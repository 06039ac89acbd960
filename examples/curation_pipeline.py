"""End-to-end training-data curation on sparkgraft: the full pipeline a
100 TB text corpus runs before pretraining, composed from this engine's
oracle-checked operators.

    scrub (PII) → quality gates (length/stopword + repetition +
    classifier score + bigram-LM coherence + duplicated-span
    coverage + Gopher rule battery + exact-substring coverage) →
    near-dup dedup (MinHash pairs → connected components → keep
    representatives) → semantic dedup (SemDeDup over embeddings) →
    benchmark decontamination (n-gram overlap) → DSIR importance
    selection toward an in-domain target → domain mixing
    (temperature weights → stratified sample → shuffle key + shard) →
    chunk (context windows) → pack (fixed-token sequences) → split
    (leakage-safe train/holdout) → leakage audit (cross-split
    near-dup check) → BPE tokenizer trained on the train split +
    corpus token budget

Every stage is a DataFrame projection/join from `sparkgraft.api` — no
UDFs, no collect() on data paths (only the final per-stage counts) —
so the same script scales from this sf0.001 demo to a cluster by
changing the input path.

Run:  python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkgraft import api as sg  # noqa: E402


def main(sf_dir: str) -> None:
    spark = sg.get_spark("curation-pipeline", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = sg.read_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. PII scrub — typed placeholders, counts kept for audit.
    scrubbed = sg.pii_redact(docs).join(docs.select("doc_id", "lang"), "doc_id")
    scrubbed = scrubbed.withColumnRenamed("redacted", "text")

    # 2. Quality gates: minimum length + repetition/diversity bounds +
    # a model-based gate (feature-hashing classifier serving path; the
    # stand-in hash weights make the demo deterministic — a trained
    # model swaps in through the same feature hash).
    rep = sg.repetition_stats(scrubbed)
    clf = sg.hash_classifier_score(scrubbed).select("doc_id", "score")
    # Bigram-LM coherence (perplexity-filter analog): drop the lowest
    # mean-log-prob tail.  Corpus-trained, so the gate is relative.
    lm = sg.ngram_lm_score(scrubbed).select("doc_id", "avg_logp")
    # Corpus-duplicated-span coverage (Gopher repetition cut).
    spans = sg.span_coverage_gate(scrubbed, max_dup_permille=300).select(
        "doc_id", F.col("keep").alias("span_ok")
    )
    # Gopher rule battery (word-length/symbol/bullet/alpha bounds +
    # char entropy) — the rule-based filter in front of everything
    # model-based.
    gopher = sg.gopher_quality(scrubbed).select(
        "doc_id", F.col("keep").alias("gopher_ok")
    )
    # Character-level exact-substring coverage (suffix-array-class,
    # 25-char windows): catches boilerplate the token-window gate is
    # too coarse for.
    substr = sg.substring_dedup_stats(
        scrubbed, min_len=25, n_shards=8, max_coverage=0.5
    ).select("doc_id", F.col("keep").alias("substr_ok"))
    kept = (
        scrubbed.join(rep, "doc_id")
        .join(clf, "doc_id")
        .join(lm, "doc_id")
        .join(spans, "doc_id")
        .join(gopher, "doc_id")
        .join(substr, "doc_id")
        .filter(
            (F.col("n_tokens") >= 10)
            & (F.col("top_token_share") <= 0.5)
            & (F.col("distinct_ratio") >= 0.1)
            & (F.col("score") >= -0.2)  # drop the worst classifier tail
            & (F.col("avg_logp") >= -9.0)  # incoherent-text tail
            & F.col("span_ok")
            & F.col("gopher_ok")
            & F.col("substr_ok")
        )
        .select("doc_id", "text")
    )
    n_quality = kept.count()

    # 3. Near-dup dedup: pair detection → duplicate groups → keep the
    # deterministic representative of each group.
    pairs = sg.minhash_dedup_pairs(kept)
    groups = sg.dedup_representatives(pairs, "id_a", "id_b")
    drop = groups.filter(~F.col("is_representative")).select(
        F.col("id").alias("doc_id")
    )
    # Truncate lineage here: the components loop above produced a deep
    # iterative plan, and every later stage would re-stack joins onto
    # it (measured: OOMs the tiny demo driver).  A real run writes the
    # post-dedup corpus back to parquet at this point for exactly the
    # same reason (checkpoint the expensive-to-recompute frontier).
    deduped = kept.join(drop, "doc_id", "left_anti").localCheckpoint()
    n_dedup = deduped.count()

    # 3a. Semantic dedup (SemDeDup): cluster the doc embeddings (IVF
    # centroid fit reused as the cluster index), drop any doc whose
    # earlier-id same-cluster neighbor is nearly identical in embedding
    # space — catches paraphrase-level duplicates MinHash misses.
    emb = sg.read_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding", "label"
    )
    cents = sorted(
        (r["cluster"], list(r["centroid"]))
        for r in sg.centroids_from_labels(emb, "label", "embedding").collect()
    )
    sem = sg.semantic_dedup(
        emb.join(deduped.select("doc_id"), "doc_id"),
        cents,
        threshold=0.999,
        id_col="doc_id",
    )
    sem_drop = sem.filter(F.col("is_duplicate")).select("doc_id")
    deduped = deduped.join(sem_drop, "doc_id", "left_anti")
    n_semdedup = deduped.count()

    # 3b. Benchmark decontamination: drop docs sharing 3-grams with the
    # (stand-in) eval set — every 100th doc plays the benchmark here.
    bench = docs.filter(F.col("doc_id") % 100 == 0).select("doc_id", "text")
    overlap = sg.decontaminate(deduped, bench, n=3, max_ratio=0.1)
    clean = deduped.join(
        overlap.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    n_clean = clean.count()

    # 3b'. DSIR importance selection (Xie 2023): weight every surviving
    # doc by how much its hashed-unigram distribution resembles an
    # in-domain target (the English subset stands in), and keep the
    # top-scoring half — the model-free "looks like my target" skew a
    # crawl gets before mixing.  Weights are DECIMAL-quantized per
    # token, so the cut is deterministic at any partitioning.
    target = clean.join(
        docs.filter(F.col("lang") == "en").select("doc_id"), "doc_id"
    )
    dsirw = sg.dsir_weights(clean, target)
    cutoff = dsirw.approxQuantile("logw", [0.5], 0.0)[0]
    clean = clean.join(
        dsirw.filter(F.col("logw") >= cutoff).select("doc_id"), "doc_id"
    )
    n_dsir = clean.count()

    # 3c. Domain mixing: temperature-upweight small sources, sample
    # each source at its weight-derived rate, attach the deterministic
    # global-shuffle key and output shard.
    src = clean.join(docs.select("doc_id", "source"), "doc_id")
    # rates = weight x a global duplication budget (here ~10x so the
    # demo keeps ~half the corpus; a real run tunes this to the token
    # budget), capped at 1.0 — rates above 1 would mean upsampling,
    # which is the loader's job, not the filter's.
    weights = {
        r["source"]: min(1.0, 10.0 * r["weight"])
        for r in sg.domain_weights(src, "source", temperature=2.0).collect()
    }
    mixed = sg.stratified_sample(src, "source", weights, ["doc_id"])
    mixed = mixed.withColumn("shuffle_key", sg.shuffle_key(["doc_id"], seed=7))
    mixed = mixed.withColumn("shard", sg.shard_assignment(["doc_id"], 8))
    n_mixed = mixed.count()

    # 4-5. Chunk into context windows, pack into training sequences.
    deduped = mixed.select("doc_id", "text")
    chunks = sg.chunk_documents(deduped, chunk_tokens=64, overlap=16)
    packed = sg.pack_chunks(chunks, seq_tokens=512, n_shards=8)
    n_packs = packed.select("shard", "pack_id").distinct().count()

    # 6. Leakage-safe split ON DOCUMENTS (pre-chunk key!), propagated to
    # packs — splitting after chunking would leak overlapping windows of
    # one document across train and holdout.
    split = sg.hash_split(deduped.select("doc_id"), ["doc_id"], train_frac=0.9)
    final = packed.join(split, "doc_id")
    per_split = {
        r["split"]: r["n"]
        for r in final.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    # 7. Leakage audit: no holdout document may near-duplicate a train
    # document (cross-side MinHash buckets only — never train×train).
    tagged = deduped.join(split, "doc_id")
    leaks = sg.incremental_dedup(
        tagged.filter(F.col("split") == "holdout").select("doc_id", "text"),
        tagged.filter(F.col("split") == "train").select("doc_id", "text"),
    )
    n_leaks = leaks.filter(F.col("is_duplicate")).count()

    # 8. Tokenizer: train BPE merges on the TRAIN split only (holdout
    # must not shape the vocabulary), then report the token budget the
    # curated corpus yields under it.
    train_docs = tagged.filter(F.col("split") == "train").select(
        "doc_id", "text"
    )
    merges = sg.train_bpe(train_docs, n_merges=16)
    tokens = sg.bpe_segment(deduped, merges).agg(
        F.sum("n_tokens").alias("total_tokens")
    ).collect()[0]["total_tokens"]

    # 9. TRAINED quality classifier (hard-sigmoid logistic GD, exact
    # integer arithmetic): fit on the train split's quantized doc
    # features, serve over the whole corpus — the trained counterpart
    # of the hash-weight gate in stage 2, same scan-speed serving.
    feats = sg.doc_features(docs)
    train_feats = feats.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    weights = sg.train_hard_logistic(
        train_feats, ["x_words", "x_wordlen", "x_digit"], "label", n_iters=4
    )
    n_model_pos = (
        sg.predict_hard_logistic(feats, weights, keep_cols=["doc_id"])
        .filter("label_pred")
        .count()
    )

    # 10. Quality-weighted subsample (A-ES, RNG-free): inclusion ∝
    # document length — the mixing step under a fixed token budget.
    n_weighted = sg.weighted_sample(
        docs.select("doc_id", "n_chars"), "n_chars", ["doc_id"], k=100
    ).count()

    # 11. Corpus health: heavy-hitter tokens (boilerplate detector,
    # exact two-pass Misra-Gries) and a KS check that curation did not
    # collapse the length distribution vs the raw corpus.
    toks = deduped.select(F.explode(sg.tokenize(F.col("text"))).alias("t"))
    n_hot = sg.heavy_hitters(toks, "t", k=100).count()
    ks_row = sg.ks_test(
        docs.select(F.length("text").cast("double").alias("v")),
        deduped.select(F.length("text").cast("double").alias("v")),
        "v",
    ).first()

    # 12. Topic-balanced mix: discover domains (hashed-TF-IDF k-means
    # warm-starting hard-EM PLSA), then cap any one topic's share of
    # the final mix — the unsupervised counterpart of the source-
    # temperature weights in stage 6.
    dt, wt = sg.topic_model(deduped, k=4, dim=64, kmeans_iters=2, em_iters=2)
    dom = sg.dominant_topic(dt)
    w_topic = Window.partitionBy("topic").orderBy(
        F.md5(F.col("d").cast("string")), F.col("d")
    )
    topic_cap = 40  # per-topic document budget
    n_topic_mix = (
        dom.withColumn("rn", F.row_number().over(w_topic))
        .filter(F.col("rn") <= topic_cap)
        .count()
    )
    n_topics = dom.select("topic").distinct().count()

    print(
        f"docs={n_raw} -> quality={n_quality} -> dedup={n_dedup} -> "
        f"semdedup={n_semdedup} -> decontaminated={n_clean} -> "
        f"dsir-selected={n_dsir} -> mixed={n_mixed} | packs={n_packs} | "
        f"chunk-rows per split={per_split} | cross-split leaks={n_leaks} | "
        f"bpe merges={merges.count()} total tokens={tokens} | "
        f"model-positive={n_model_pos} | weighted sample={n_weighted} | "
        f"heavy hitters={n_hot} | "
        f"length-KS={ks_row['ks_stat']} drift={ks_row['drift']} | "
        f"topics={n_topics} topic-balanced mix={n_topic_mix}"
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")

"""End-to-end retrieval indexing + hybrid search on sparkgraft — the
RAG-stack shape, composed from the engine's oracle-checked operators:

    chunk documents (context windows) → embed (deterministic
    projection stand-in; a real encoder swaps in behind the same
    column contract) → build the IVF-PQ ANN index in-engine (centroid
    fit → PQ codebooks → encode) → lexical BM25 top-k + semantic
    IVF-PQ top-k → reciprocal-rank fusion → MaxSim late-interaction
    rerank over the fused candidates' chunk vectors.

Everything is DataFrame ops; the only driver-side artifacts are the
bounded index tables (centroids/codebooks — k x dim floats).

Run:  python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkgraft import api as sg  # noqa: E402


def main(sf_dir: str) -> None:
    spark = sg.get_spark("retrieval-pipeline", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = sg.read_table(spark, sf_dir, "documents")
    emb = sg.read_table(spark, sf_dir, "embeddings")

    # 1. Chunk into retrieval units (the passage granularity).
    chunks = sg.chunk_documents(docs, chunk_tokens=64, overlap=16)
    n_chunks = chunks.count()

    # 2. "Embed" the corpus: the embeddings table stands in as the
    # encoder output, keyed to docs by id (vec_id ≡ doc_id here); the
    # JL random projection compresses it to the serving dimensionality
    # — a real encoder replaces this select, nothing downstream moves.
    doc_vecs = sg.random_projection(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
        id_col="doc_id",
        out_dim=16,
    ).withColumnRenamed("projected", "vec")

    # 3. Offline ANN index build, fully in-engine: IVF centroids from
    # the label structure + PQ codebooks as centroid slices.
    cents = sorted(
        (r["cluster"], list(r["centroid"]))
        for r in sg.centroids_from_labels(
            emb, "label", "embedding", digits=6
        ).collect()
    )
    codebooks = [
        [(c, v[s * 8 : (s + 1) * 8]) for c, v in cents] for s in range(8)
    ]

    # 4a. Lexical leg: BM25 top-20 for the keyword query.
    lex = sg.bm25_rank(docs, ["hash", "join", "vector"], k=20).select(
        "doc_id", "rnk"
    )

    # 4b. Semantic leg: IVF-PQ top-20 for the query vectors (first 3),
    # probing 2 clusters, ADC over the probed subset, exact rerank.
    queries = emb.filter(F.col("vec_id") < 3)
    sem = sg.ivfpq_topk(
        queries, emb, cents, codebooks, nprobe=2, k=20
    ).select(
        F.col("query_id"), F.col("neighbor_id").alias("doc_id"), "rnk"
    )
    sem_q0 = sem.filter(F.col("query_id") == 0).select("doc_id", "rnk")

    # 5. Hybrid fusion: RRF over the two top-20 lists.
    fused = sg.rrf_fuse([lex, sem_q0], k=60, topk=10)
    fused_ids = [r["doc_id"] for r in fused.collect()]

    # 6. Late-interaction rerank: each candidate doc's CHUNK vectors
    # (stand-in: its 4 nearest embedding rows by id block) vs the query
    # doc's vectors, MaxSim top-5.
    toks = emb.select(
        F.expr("vec_id div 4").alias("doc"), "vec_id", "embedding"
    )
    q = toks.filter(F.col("doc") == 0).select(
        F.col("doc").alias("q_doc"),
        F.col("vec_id").alias("q_tok"),
        F.col("embedding").alias("qv"),
    )
    d = toks.join(
        spark.createDataFrame(
            [(int(i),) for i in fused_ids], "cand bigint"
        ).select(F.expr("cand div 4").alias("doc")).distinct(),
        "doc",
    ).select(F.col("doc").alias("d_doc"), F.col("embedding").alias("dv"))
    reranked = sg.maxsim_rerank(q, d, k=5)

    top = [
        (r["d_doc"], r["maxsim"], r["rnk"]) for r in reranked.collect()
    ]

    # 6. MMR diversification: the final list trades relevance against
    # redundancy so a cluster of near-identical chunks can't fill the
    # result — the all-integer greedy objective is oracle-replayable.
    diversified = sg.mmr_rerank(
        emb.filter(F.col("vec_id") < 2), emb,
        k_candidates=10, k_select=5, lam_num=5, lam_den=10,
    )
    n_mmr = diversified.count()

    # 7. Hard-negative mining for the NEXT reranker's training set:
    # per query vector, the most-similar other-label candidates below
    # the near-dup ceiling — similar-but-wrong pairs.
    hard = sg.hard_negative_topk(
        emb.filter(F.col("vec_id") < 4), emb, k=3, max_sim=0.999
    )
    n_hard = hard.count()

    print(
        f"chunks={n_chunks} | lexical_top20={lex.count()} | "
        f"semantic_top20={sem_q0.count()} | fused_top10={fused_ids} | "
        f"maxsim_top5={top} | mmr_diversified={n_mmr} | "
        f"hard_negatives={n_hard}"
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")

"""Recall-vs-cost sweep for the approximate ANN operators — the tuning
table a deployment uses to pick nprobe/planes/rerank. Writes nothing;
prints a markdown table for SCALE.md.

Run: python tools/ann_quality_probe.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = 10
N_QUERIES = 20


def main():
    from web_analytics_on_aws_spark.operators import similarity
    from web_analytics_on_aws_spark.session import get_spark
    from web_analytics_on_aws_spark.sources.tables import load_table

    spark = get_spark(app_name="ann-probe", master="local[8]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF, "embeddings").cache()
    n = emb.count()
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_force_topk(emb, q, k=K).collect()
    }

    def recall(df):
        got = {(r["query_id"], r["vec_id"]) for r in df.collect()}
        return len(got & exact) / len(exact)

    print(f"corpus n={n}, {N_QUERIES} queries, k={K}\n")
    print("| operator | setting | scan fraction | recall@10 |")
    print("|---|---|---|---|")
    for nprobe in (1, 2, 4, 8, 16):
        r = recall(similarity.ivf_topk(emb, q, k=K, num_centroids=16, nprobe=nprobe))
        print(f"| IVF (16 cells) | nprobe={nprobe} | ~{nprobe}/16 | {r:.2f} |")
    for nprobe in (1, 2, 4, 8):
        r = recall(similarity.ivfpq_adc_topk(
            emb, q, k=K, num_centroids=16, nprobe=nprobe, m=8,
            num_codewords=16, rerank=50))
        print(f"| IVF-PQ (m=8, rerank=50) | nprobe={nprobe} | ~{nprobe}/16 | {r:.2f} |")
    for planes in (2, 4, 6):
        r = recall(similarity.lsh_bucket_topk(emb, q, k=K, planes=planes))
        print(f"| sign-LSH | planes={planes} | ~1/2^{planes} | {r:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()

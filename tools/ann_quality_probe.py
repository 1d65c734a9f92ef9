"""Recall-vs-cost sweep for the approximate ANN operators — the tuning
table a deployment uses to pick nprobe/planes/rerank. Writes nothing;
prints a markdown table for SCALE.md.

Run: python tools/ann_quality_probe.py [sf_dir] [--ten-x]

``--ten-x`` (VERDICT r7 #6) re-runs the sweep on a 10× corpus built
in-plan: 9 extra replicas whose vectors are ELEMENT-ROTATED copies
(``slice(v, r+1) || slice(v, 1, r)``). Rotation keeps norms and the
per-replica point-cloud geometry but decorrelates each replica from the
queries (a high-dim rotation is as good as a random direction), so the
task becomes "find the same true neighbors among 10× distractors" — the
scale question the operating points must survive. The naive
scale_probe-style replica (exact copies, shifted ids) is useless here:
the exact top-10 of every query would be ten identical copies of one
vector, and recall would measure tie-breaking, not search quality.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = ARGS[0] if ARGS else "/root/testdata/sf0.01"
TEN_X = "--ten-x" in sys.argv
K = 10
N_QUERIES = 20
REPLICA_SHIFT = 10_000_000


def ten_x_corpus(emb):
    """9 rotation-jittered replicas unioned onto the base corpus —
    deterministic, in-plan, id spaces disjoint."""
    out = emb
    rest = [c for c in emb.columns if c not in ("vec_id", "embedding")]
    for r in range(1, 10):
        rot = emb.select(
            (F.col("vec_id") + r * REPLICA_SHIFT).alias("vec_id"),
            F.concat(
                F.slice(F.col("embedding"), r + 1, 10_000),
                F.slice(F.col("embedding"), 1, r),
            ).alias("embedding"),
            *rest,
        )
        out = out.unionByName(rot)
    return out


def main():
    from web_analytics_on_aws_spark.operators import similarity
    from web_analytics_on_aws_spark.session import get_spark
    from web_analytics_on_aws_spark.sources.tables import load_table

    spark = get_spark(app_name="ann-probe", master="local[8]",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF, "embeddings")
    if TEN_X:
        emb = ten_x_corpus(emb)
    emb = emb.cache()
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

    tag = " (10x rotated-replica corpus)" if TEN_X else ""
    print(f"corpus n={n}{tag}, {N_QUERIES} queries, k={K}\n")
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

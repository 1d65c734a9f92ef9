"""Pytest oracles for the approximate operators (MinHash-LSH, SimHash,
sign-LSH ANN) and the multimodal plumbing — planted-duplicate corpora with
brute-force Python ground truth."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from web_analytics_on_aws_spark.operators import dedup, multimodal, similarity
from web_analytics_on_aws_spark.sources.tables import load_table

VOCAB = [f"w{i}" for i in range(50)]


def _mk_corpus():
    """60 base docs + 10 near-dup pairs (small token mutations) + 2 exact dups."""
    rng = random.Random(7)
    docs = []
    for i in range(60):
        docs.append((i, " ".join(rng.choice(VOCAB) for _ in range(80))))
    pairs = []
    for j in range(10):
        base_id, text = docs[j]
        toks = text.split()
        for pos in rng.sample(range(len(toks)), 3):  # mutate 3 of 80 tokens
            toks[pos] = rng.choice(VOCAB)
        dup_id = 100 + j
        docs.append((dup_id, " ".join(toks)))
        pairs.append((base_id, dup_id))
    docs.append((200, docs[0][1]))  # exact dup of doc 0
    return docs, pairs


def _py_shingles(text: str, k: int = 3) -> set[str]:
    t = text.split()
    return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}


def _py_jaccard(a: str, b: str) -> float:
    sa, sb = _py_shingles(a), _py_shingles(b)
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def corpus(spark):
    docs, pairs = _mk_corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return df, docs, pairs


def test_exact_dedup_removes_planted_exact_dup(spark, corpus):
    df, docs, _ = corpus
    out = dedup.exact_dedup(df)
    ids = {r["doc_id"] for r in out.collect()}
    assert 200 not in ids  # duplicate content, higher id → dropped
    assert 0 in ids
    assert len(ids) == len(docs) - 1


def test_ngram_jaccard_matches_python_bruteforce(spark, corpus):
    df, docs, planted = corpus
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    text = dict(docs)
    expected = {}
    ids = sorted(text)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = _py_jaccard(text[a], text[b])
            if j >= 0.5:
                expected[(a, b)] = j
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-6
    # every planted near-dup pair was caught
    assert set(planted) <= set(got)


def test_minhash_lsh_recall_on_planted_pairs(spark, corpus):
    df, docs, planted = corpus
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(df, threshold=0.5).collect()
    }
    text = dict(docs)
    strong = [p for p in planted if _py_jaccard(text[p[0]], text[p[1]]) >= 0.7]
    assert strong, "fixture should plant strong near-dups"
    found = [p for p in strong if p in got]
    # banded LSH @ (32,4) catches J>=0.7 pairs with prob ~1 - (1-0.7^4)^32 ≈ 1
    assert len(found) == len(strong), f"missed {set(strong) - got}"
    # estimated jaccard within 0.25 of truth for found planted pairs
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(df, threshold=0.3).collect()
    }
    for p in strong:
        assert abs(est[p] - _py_jaccard(text[p[0]], text[p[1]])) < 0.25


def test_simhash_pairs_find_planted_dups(spark, corpus):
    df, docs, planted = corpus
    out = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_pairs(df, max_hamming=16).collect()
    }
    # exact dup at hamming 0
    assert out.get((0, 200)) == 0
    # near-dups (3/80 tokens changed) land at small hamming distances
    found = [p for p in planted if p in out]
    assert len(found) >= 7
    # unrelated docs don't appear at tiny distances en masse
    tight = dedup.simhash_pairs(df, max_hamming=3).collect()
    tight_pairs = {(r["doc_a"], r["doc_b"]) for r in tight}
    assert tight_pairs <= (set(planted) | {(0, 200)} | set(out))


def test_lsh_ann_subset_and_overlap_with_brute(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(emb.vec_id < 5).selectExpr("vec_id AS query_id", "embedding AS qv")
    brute = similarity.brute_force_topk(emb, queries, k=5)
    lsh = similarity.lsh_bucket_topk(emb, queries, k=5, planes=4)
    b = {(r["query_id"], r["vec_id"]) for r in brute.collect()}
    l = {(r["query_id"], r["vec_id"]) for r in lsh.collect()}
    assert len(l) <= len(b)
    # LSH scores are exact cosine on its candidates: any (q, v) in both sets
    # carries the same sim
    bs = {(r["query_id"], r["vec_id"]): r["sim"] for r in brute.collect()}
    ls = {(r["query_id"], r["vec_id"]): r["sim"] for r in lsh.collect()}
    for key in b & l:
        assert bs[key] == ls[key]


def test_decode_media_fake_deterministic_and_stub_raises(spark, corpus):
    df, _, _ = corpus
    with_blob = multimodal.attach_blob(df.limit(5))
    a = sorted(multimodal.decode_media(with_blob, fake=True).collect())
    b = sorted(multimodal.decode_media(with_blob, fake=True).collect())
    assert a == b
    assert all(16 <= r["width"] < 80 and len(r["features"]) == 8 for r in a)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        multimodal.decode_media(with_blob, fake=False).collect()


def test_frame_sample_offsets(spark, corpus):
    df, docs, _ = corpus
    frames = multimodal.frame_sample(multimodal.attach_blob(df.limit(3)), n_frames=4)
    rows = frames.collect()
    assert len(rows) == 12
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    text = dict(docs)
    for doc_id, rs in by_doc.items():
        n = len(text[doc_id].encode())
        assert sorted(r["offset"] for r in rs) == [i * n // 4 for i in range(4)]
        whole = b"".join(
            bytes(r["frame_bytes"]) for r in sorted(rs, key=lambda r: r["frame_idx"])
        )
        assert len(whole) == (n // 4) * 4


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3 (diameter 2, needs >1 propagation round), clique {10,11,12},
    # isolated pair {20,21}; vertices not in any pair don't appear.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (11, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_keep_canonical_survivors(spark, corpus):
    df, docs, planted = corpus
    pairs = dedup.ngram_jaccard_pairs(df, k=3, threshold=0.5)
    kept = dedup.keep_canonical(df, pairs)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # Ground truth: components from the exact >=0.5 Jaccard pair graph.
    edges = [(a, b) for (a, b) in [(r.doc_a, r.doc_b) for r in pairs.collect()]]
    parent = {i: i for (i, _) in docs}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for i, _ in docs:
        comps.setdefault(find(i), set()).add(i)
    expect = {min(members) for members in comps.values()} | {
        i for i, _ in docs if len(comps[find(i)]) == 1
    }
    assert kept_ids == expect
    # every planted near-dup pair collapsed to one survivor
    for a, b in planted:
        assert not ({a, b} <= kept_ids)


def test_connected_components_random_graphs_match_union_find(spark):
    # random sparse graphs include long paths (multi-round convergence),
    # isolated pairs, and merged components — checked against union-find
    rng = random.Random(11)
    for _ in range(3):
        n, m = 40, 25
        edges = set()
        while len(edges) < m:
            a, b = rng.sample(range(n), 2)
            edges.add((min(a, b), max(a, b)))
        pairs = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
        parent = list(range(n))
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for e in edges for v in e}
        expect = {(v, find(v)) for v in touched}
        got = {
            (r.doc_id, r.cluster_id)
            for r in dedup.connected_components(pairs).collect()
        }
        assert got == expect


def test_trigram_lang_id_accuracy_and_edges(spark):
    from web_analytics_on_aws_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and then runs", "en"),
            (2, "el rapido zorro marron salta sobre el perro perezoso hoy", "es"),
            (3, "le renard brun rapide saute par dessus le chien paresseux", "fr"),
            (4, "the cat and the dog are friends in the house and garden", "en"),
            (5, "la casa es grande y el jardin tiene muchas flores bonitas", "es"),
            (6, "le chat et le chien sont amis dans la maison et le jardin", "fr"),
            (7, "xy", "en"),  # < 3 chars -> no trigrams -> 'und'
        ],
        ["doc_id", "text", "lang"],
    )
    prof = T.trigram_profiles(docs.filter("doc_id <= 6"), top_p=50)
    preds = {r["doc_id"]: r["pred_lang"]
             for r in T.trigram_lang_id(docs, prof).collect()}
    assert preds[7] == "und"
    acc = sum(preds[i] == l for i, l in
              [(1, "en"), (2, "es"), (3, "fr"), (4, "en"), (5, "es"), (6, "fr")])
    assert acc == 6, preds


def test_multimodal_decode_audit_matches_hashlib(spark, corpus):
    """The integer audit columns recovered from the REAL mapInPandas decode
    equal a direct hashlib recomputation (what the DuckDB oracle does)."""
    import hashlib

    df, _, _ = corpus
    df = df.limit(8)
    with_blob = multimodal.attach_blob(df)
    dec = multimodal.decode_media(with_blob, fake=True)
    got = {
        r["doc_id"]: r
        for r in dec.select(
            "doc_id", "width", "height", "channels",
            F.aggregate(
                "features", F.lit(0).cast("long"),
                lambda acc, x: acc + F.round(x.cast("double") * 255.0).cast("long"),
            ).alias("feat_byte_sum"),
        ).collect()
    }
    for row in df.select("doc_id", "text").collect():
        d = hashlib.sha256(row["text"].encode()).digest()
        g = got[row["doc_id"]]
        assert g["width"] == 16 + d[0] % 64
        assert g["height"] == 16 + d[1] % 64
        assert g["channels"] == 1 + d[2] % 3
        assert g["feat_byte_sum"] == sum(d[:8])


def test_multimodal_knn_audit_tracks_float_pipeline(spark, corpus):
    """The integer-exact audit ranking reproduces the float32 Arrow
    pipeline's neighbor sets (cosine over z = 2*byte-255 is mathematically
    identical to the extractor's cosine; only float rounding can differ, so
    overlap must be near-total)."""
    from web_analytics_on_aws_spark.operators.similarity import brute_force_topk
    from web_analytics_on_aws_spark.plans.pipeline_ops import _zvec

    docs, _, _ = corpus
    feats = multimodal.extract_features(multimodal.attach_blob(docs), fake=True)
    queries = feats.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    float_topk = brute_force_topk(feats, queries, k=10, id_col="doc_id")
    float_sets = {}
    for r in float_topk.collect():
        float_sets.setdefault(r["query_id"], set()).add(r["doc_id"])

    z = docs.select("doc_id", _zvec("text").alias("z")).withColumn(
        "norm2", F.aggregate("z", F.lit(0).cast("long"), lambda a, x: a + x * x)
    )
    q = z.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.col("z").alias("zq"),
        F.col("norm2").alias("qn"),
    )
    pairs = (
        z.join(F.broadcast(q), F.col("doc_id") != F.col("query_id"))
        .withColumn(
            "dot",
            F.aggregate(
                F.zip_with("z", "zq", lambda a, b: a * b),
                F.lit(0).cast("long"), lambda a, x: a + x,
            ),
        )
        .withColumn(
            "key",
            F.col("dot").cast("double")
            / F.sqrt(F.col("norm2").cast("double") * F.col("qn").cast("double")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("key"), F.asc("doc_id"))
    audit = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .collect()
    )
    audit_sets = {}
    for r in audit:
        audit_sets.setdefault(r["query_id"], set()).add(r["doc_id"])
    for qid, fset in float_sets.items():
        # float32 rounding may flip a near-tie at the top-k boundary, no more
        assert len(fset & audit_sets[qid]) >= 9, (qid, fset, audit_sets[qid])


def test_ivfpq_full_probe_full_rerank_is_brute_force(spark):
    """nprobe = num_centroids and unbounded rerank must reproduce the exact
    brute-force top-k — the approximation comes ONLY from cell pruning and
    shortlist choice."""
    df = load_table(spark, SF_SMOKE, "embeddings")
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in similarity.brute_force_topk(df, q, k=5).collect()
    }
    full = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in similarity.ivfpq_adc_topk(
            df, q, k=5, num_centroids=8, nprobe=8, m=8, num_codewords=8,
            rerank=10**6,
        ).collect()
    }
    assert full == exact


def test_ivfpq_sims_are_exact_cosines(spark):
    """Every reported sim must equal the exact cosine of that pair (re-rank
    contract) even when candidate choice is approximate."""
    df = load_table(spark, SF_SMOKE, "embeddings")
    q = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = similarity.ivfpq_adc_topk(
        df, q, k=5, num_centroids=8, nprobe=2, m=8, num_codewords=8, rerank=20
    )
    vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
    import math

    for r in out.collect():
        a, b = vecs[r["query_id"]], vecs[r["vec_id"]]
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        assert abs(r["sim"] - round(dot / (na * nb), 6)) < 1e-9


def test_hard_negative_topk_excludes_same_label_and_reranks_brute(spark):
    """Hard-negative mining ≡ brute-force top-k restricted to other-label
    candidates; never emits the query itself or its own label."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    out = similarity.hard_negative_topk(emb, queries, k=5).collect()
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    by_q = {}
    for r in out:
        assert r["vec_id"] != r["query_id"]
        assert r["neg_label"] == labels[r["vec_id"]] != labels[r["query_id"]]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["sim"]))
    # against brute force over the pre-filtered candidate set
    for qid, rows in by_q.items():
        cand = emb.filter(F.col("label") != F.lit(labels[qid]))
        q1 = queries.filter(F.col("query_id") == qid).select("query_id", "qv")
        brute = similarity.brute_force_topk(cand, q1, k=5).collect()
        assert sorted(rows) == sorted(
            (r["rank"], r["vec_id"], r["sim"]) for r in brute
        )


def test_bm25_df_cap_prunes_stop_terms(spark):
    """max_df_frac is the BM25 scale knob: stop terms (df above the cap)
    must contribute nothing, and with the cap off the full metric is the
    oracle-checked one."""
    from web_analytics_on_aws_spark.operators.text import bm25_topk

    docs = load_table(spark, SF_SMOKE, "documents")
    full = bm25_topk(docs, query_ids=[0], k=5).collect()
    capped = bm25_topk(docs, query_ids=[0], k=5, max_df_frac=0.05).collect()
    assert len(full) == len(capped) == 5
    # pruning high-df terms can only LOWER scores
    full_s = {r["doc_id"]: r["score"] for r in full}
    for r in capped:
        if r["doc_id"] in full_s:
            assert r["score"] <= full_s[r["doc_id"]] + 1e-9
    # the cap genuinely removes mass on this corpus (stopwords exist)
    assert sum(r["score"] for r in capped) < sum(r["score"] for r in full)

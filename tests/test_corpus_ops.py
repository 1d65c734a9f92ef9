"""Planted-case oracles for the round-2 corpus operators: SemDeDup
semantic pruning, PQ-ADC top-k, exact-substring window dedup, Gopher
quality flags, BPE pair counts, and the SCD2 history build."""

from __future__ import annotations

import datetime

import pytest

from web_analytics_on_aws_spark.operators.cdc import scd2_history
from web_analytics_on_aws_spark.operators.similarity import (
    brute_force_topk,
    pq_adc_topk,
    semantic_prune,
)
from web_analytics_on_aws_spark.operators.text import (
    bpe_pair_counts,
    duplicated_window_stats,
    gopher_flags,
)
from web_analytics_on_aws_spark.operators import text


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------------------------------- SemDeDup


def test_semantic_prune_drops_higher_id_near_dups(spark):
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0]),     # centroid of cluster 0
            (1, [0.0, 1.0]),     # centroid of cluster 1
            (2, [1.0, 0.01]),    # cluster 0, ~dup of 0 → pruned
            (3, [0.01, 1.0]),    # cluster 1, ~dup of 1 → pruned
            (4, [-1.0, 0.2]),    # cluster 1 (less anti-aligned with 1 than 0)
        ],
    )
    out = {
        r["vec_id"]: r
        for r in semantic_prune(emb, threshold=0.99, num_centroids=2).collect()
    }
    assert len(out) == 5
    assert out[0]["pruned"] is False and out[0]["max_lower_sim"] is None
    assert out[1]["pruned"] is False  # different cluster from 0
    assert out[2]["pruned"] is True and out[2]["cluster_id"] == 0
    assert out[3]["pruned"] is True and out[3]["cluster_id"] == 1
    assert out[4]["pruned"] is False


def test_semantic_prune_lowest_id_survives_each_group(spark):
    # three mutual near-dups: only the lowest id survives
    emb = _emb(
        spark,
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        + [(i, [1.0, 0.001 * i]) for i in (10, 11, 12)],
    )
    out = semantic_prune(emb, threshold=0.999, num_centroids=2)
    pruned = {r["vec_id"] for r in out.collect() if r["pruned"]}
    assert pruned == {10, 11, 12}  # all near-dups of centroid 0 itself


# ----------------------------------------------------------------------- PQ-ANN


def test_pq_full_rerank_matches_brute_force(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((40, 16)).astype("float32")
    emb = _emb(spark, [(i, [float(x) for x in vecs[i]]) for i in range(40)])
    q = emb.filter("vec_id < 2").selectExpr("vec_id AS query_id", "embedding AS qv")
    # rerank ≥ corpus ⇒ the ADC shortlist covers everything ⇒ exact result
    approx = pq_adc_topk(emb, q, k=5, m=4, num_codewords=8, rerank=40)
    exact = brute_force_topk(emb, q, k=5)
    key = lambda r: (r["query_id"], r["rank"])
    got = sorted(approx.collect(), key=key)
    want = sorted(exact.collect(), key=key)
    assert [(r["query_id"], r["vec_id"], r["sim"]) for r in got] == [
        (r["query_id"], r["vec_id"], r["sim"]) for r in want
    ]


def test_pq_sims_are_exact_rerank_scores(spark):
    """Whatever candidates PQ picks, the emitted sims must equal the exact
    cosine for those (query, vec) pairs."""
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((30, 8)).astype("float32")
    emb = _emb(spark, [(i, [float(x) for x in vecs[i]]) for i in range(30)])
    q = emb.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding AS qv")
    approx = pq_adc_topk(emb, q, k=3, m=2, num_codewords=4, rerank=5)
    for r in approx.collect():
        a, b = vecs[0].astype("float64"), vecs[r["vec_id"]].astype("float64")
        want = float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b)))
        assert abs(r["sim"] - want) < 1e-6


# ------------------------------------------------------------ substring windows


def test_duplicated_windows_planted(spark):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = _docs(
        spark,
        [
            (1, shared + " tail1 tail2"),      # 3 windows, 1 shared
            (2, "head0 " + shared),            # 2 windows, 1 shared
            (3, "a b c d e f g h i j"),        # 1 window, unique
            (4, "too short"),                  # 0 windows
        ],
    )
    out = {r["doc_id"]: r for r in duplicated_window_stats(docs, k=10).collect()}
    assert out[1]["n_windows"] == 3 and out[1]["n_dup_windows"] == 1
    assert out[2]["n_windows"] == 2 and out[2]["n_dup_windows"] == 1
    assert out[3]["n_windows"] == 1 and out[3]["n_dup_windows"] == 0
    assert out[4]["n_windows"] == 0 and out[4]["dup_frac"] == 0.0
    assert out[1]["dup_frac"] == pytest.approx(1 / 3, abs=1e-6)


def test_duplicated_windows_raw_drops_only_zero_window_docs(spark):
    # include_all_docs=False skips the zero-pad join back to the corpus:
    # the rows that remain must be exactly the default output minus the
    # zero-window docs (the curation funnel left-joins these and treats
    # missing as zero duplication)
    docs = _docs(
        spark,
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 tail1 tail2"),
            (2, "head0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
            (3, "too short"),  # 0 windows: absent from the raw form
        ],
    )
    full = {
        r["doc_id"]: r for r in duplicated_window_stats(docs, k=10).collect()
    }
    raw = {
        r["doc_id"]: r
        for r in duplicated_window_stats(
            docs, k=10, include_all_docs=False
        ).collect()
    }
    assert set(raw) == {d for d, r in full.items() if r["n_windows"] > 0}
    for d, r in raw.items():
        for c in ("n_windows", "n_dup_windows", "dup_frac"):
            assert r[c] == full[d][c], (d, c)


def test_duplicated_windows_within_doc_repeat_not_counted(spark):
    # the same window twice in ONE doc is not cross-doc duplication
    docs = _docs(
        spark,
        [
            (1, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
            (2, "totally different words here padding out to ten tokens now yes"),
        ],
    )
    out = {r["doc_id"]: r for r in duplicated_window_stats(docs, k=10).collect()}
    assert out[1]["n_dup_windows"] == 0


# ----------------------------------------------------------------- gopher flags


def test_gopher_flags_each_rule(spark):
    ok = "the cat sat on the mat " + " ".join(f"word{i}" for i in range(20))
    docs = _docs(
        spark,
        [
            (1, ok),                                    # passes all
            (2, "the a of"),                            # too few words
            (3, ok + " " + "x" * 25),                   # max word len violated
            (4, " ".join("zq" for _ in range(30))),     # no stopwords, mean len 2
        ],
    )
    out = {r["doc_id"]: r for r in gopher_flags(docs).collect()}
    assert out[1]["pass_all"] is True
    assert out[2]["wc_ok"] is False and out[2]["pass_all"] is False
    assert out[3]["mx_ok"] is False and out[3]["pass_all"] is False
    assert out[4]["sw_ok"] is False and out[4]["ml_ok"] is False


# -------------------------------------------------------------------- BPE pairs


def test_bpe_pair_counts_planted(spark):
    docs = _docs(spark, [(1, "abab ab"), (2, "ba")])
    out = {r["pair"]: (r["rank"], r["cnt"]) for r in bpe_pair_counts(docs).collect()}
    # "abab" → ab, ba, ab ; "ab" → ab ; "ba" → ba
    assert out["ab"] == (1, 3)
    assert out["ba"] == (2, 2)


# ------------------------------------------------------------------------- SCD2


def test_scd2_history_intervals(spark):
    d = datetime.date
    rows = [
        (1, "A", d(2024, 1, 1), 10),
        (1, "A", d(2024, 2, 1), 11),  # no change → collapsed
        (1, "B", d(2024, 3, 1), 12),  # change
        (1, "A", d(2024, 4, 1), 13),  # change back (new interval, not merged)
        (2, "C", d(2024, 1, 5), 20),  # single-row key
    ]
    df = spark.createDataFrame(
        rows, "k long, status string, dt date, seq long"
    )
    out = sorted(
        scd2_history(df, "k", "status", "dt", "seq").collect(),
        key=lambda r: (r["k"], r["valid_from"]),
    )
    assert [
        (r["k"], r["status"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out
    ] == [
        (1, "A", d(2024, 1, 1), d(2024, 3, 1), False),
        (1, "B", d(2024, 3, 1), d(2024, 4, 1), False),
        (1, "A", d(2024, 4, 1), None, True),
        (2, "C", d(2024, 1, 5), None, True),
    ]


def test_scd2_same_day_changes_ordered_by_tiebreak(spark):
    d = datetime.date
    rows = [(1, "A", d(2024, 1, 1), 2), (1, "B", d(2024, 1, 1), 1)]
    df = spark.createDataFrame(rows, "k long, status string, dt date, seq long")
    out = sorted(
        scd2_history(df, "k", "status", "dt", "seq").collect(),
        key=lambda r: 0 if r["status"] == "B" else 1,
    )
    # seq=1 (B) comes first, then A; both share the same date
    assert out[0]["is_current"] is False and out[1]["is_current"] is True


# ------------------------------------------------------------- epoch shuffle


def test_epoch_shuffle_is_permutation_and_varies_by_epoch(spark):
    from web_analytics_on_aws_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(i, "s") for i in range(50)], "doc_id long, source string")
    e0 = {r["doc_id"]: r["train_pos"] for r in epoch_shuffle(df, epoch=0).collect()}
    e1 = {r["doc_id"]: r["train_pos"] for r in epoch_shuffle(df, epoch=1).collect()}
    assert sorted(e0.values()) == list(range(1, 51))  # total order, no gaps
    assert sorted(e1.values()) == list(range(1, 51))
    assert e0 != e1  # different permutation per epoch
    # deterministic under re-run
    again = {r["doc_id"]: r["train_pos"] for r in epoch_shuffle(df, epoch=0).collect()}
    assert again == e0


def test_roundrobin_interleave_balances_sources(spark):
    from web_analytics_on_aws_spark.operators.sampling import (
        roundrobin_interleave,
    )

    rows = [(i, f"s{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sorted(
        roundrobin_interleave(df).collect(), key=lambda r: r["train_pos"]
    )
    # every consecutive block of 4 positions covers all 4 sources
    for blk in range(10):
        srcs = {r["source"] for r in out[blk * 4 : blk * 4 + 4]}
        assert srcs == {"s0", "s1", "s2", "s3"}


def test_semantic_prune_reports_negative_max_sim(spark):
    """Regression: a vector whose lower-id cluster neighbors are all
    anti-correlated must report the true NEGATIVE max, not a 0.0 clamp
    (np.tril's zeroed upper triangle must not enter the row max)."""
    emb = _emb(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-0.5, -1.0])])
    out = {r["vec_id"]: r for r in
           semantic_prune(emb, threshold=0.99, num_centroids=2).collect()}
    r2 = out[2]
    assert r2["max_lower_sim"] is not None and r2["max_lower_sim"] < 0
    assert r2["pruned"] is False


def _ref_bpe(corpus_text: str, n: int, min_pair_count: int = 2):
    """Pure-Python reference BPE (Sennrich et al.): greedy left-to-right
    merge apply, ties by (count desc, left asc, right asc)."""
    import collections

    words = collections.Counter(corpus_text.split())
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for rnd in range(1, n + 1):
        pc = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        m = max(pc.values())
        if m < min_pair_count:
            break
        best = sorted(p for p, c in pc.items() if c == m)[0]
        merges.append((rnd, best[0], best[1], best[0] + best[1], m))
        newv = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == best[0] and s == best[1]:
                    out[-1] = best[0] + best[1]
                else:
                    out.append(s)
            newv[tuple(out)] = newv.get(tuple(out), 0) + c
        vocab = newv
    return merges


def test_bpe_train_matches_reference(spark):
    corpus = "low lower lowest low low newer new news widest wide wider"
    df = spark.createDataFrame([(corpus,)], "text string")
    got = [tuple(r) for r in text.bpe_train(df, n_merges=8).collect()]
    assert got == _ref_bpe(corpus, 8)


def test_bpe_train_overlapping_pairs_greedy(spark):
    # 'aaaa' with merge (a,a): greedy left-to-right → [aa, aa], so the
    # second round's top pair is (aa, aa)
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    got = [tuple(r) for r in text.bpe_train(df, n_merges=2).collect()]
    assert got == _ref_bpe("aaaa aaaa aaaa", 2)
    assert got[0][1:4] == ("a", "a", "aa")
    assert got[1][1:4] == ("aa", "aa", "aaaa")


def test_bpe_train_early_stop_and_determinism(spark):
    df = spark.createDataFrame([("ab cd ef",)], "text string")  # all pairs count 1
    assert text.bpe_train(df, n_merges=5).count() == 0
    corpus = "the cat the hat the bat a cat a hat"
    df2 = spark.createDataFrame([(corpus,)], "text string")
    a = [tuple(r) for r in text.bpe_train(df2, n_merges=6).collect()]
    b = [tuple(r) for r in text.bpe_train(df2.repartition(7), n_merges=6).collect()]
    assert a == b == _ref_bpe(corpus, 6)


def test_remove_duplicated_spans_planted(spark):
    shared = " ".join(f"s{i}" for i in range(10))  # one 10-token window
    docs = spark.createDataFrame(
        [
            (1, "a b c " + shared + " x y z"),
            (2, "p q " + shared + " r"),
            (3, "totally unrelated words only here nothing shared at all ok"),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text.remove_duplicated_spans(docs, k=10).collect()
    }
    # the shared window is cut from both carriers; flanks survive
    assert out[1]["cleaned_text"] == "a b c x y z"
    assert out[1]["n_removed"] == 10
    assert out[2]["cleaned_text"] == "p q r"
    assert out[2]["n_removed"] == 10
    # untouched docs pass through verbatim with zero removal
    assert out[3]["n_removed"] == 0 and out[3]["cleaned_text"].startswith("totally")
    assert out[4]["n_removed"] == 0 and out[4]["cleaned_text"] == "short doc"


def test_remove_duplicated_spans_overlap_merge(spark):
    # two docs share an 11-token run -> two overlapping 10-windows in each;
    # removal must merge the overlap (11 tokens cut, not 20)
    run = " ".join(f"w{i}" for i in range(11))
    docs = spark.createDataFrame(
        [(1, "pre " + run + " post"), (2, run + " tail")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text.remove_duplicated_spans(docs, k=10).collect()
    }
    assert out[1]["n_removed"] == 11
    assert out[1]["cleaned_text"] == "pre post"
    assert out[2]["n_removed"] == 11
    assert out[2]["cleaned_text"] == "tail"


def test_bpe_encode_matches_reference_apply(spark):
    """Encode with trained merges ≡ pure-Python greedy apply of the same
    rules, word by word (train and encode share fold semantics)."""
    corpus = "low lower lowest low low newer newest new " * 3
    df = spark.createDataFrame([(0, corpus)], "doc_id long, text string")
    trained = text.bpe_train(df, n_merges=6)
    rules = [(r["left"], r["right"], r["merged"]) for r in trained.collect()]

    docs = spark.createDataFrame(
        [(1, "low lowest unknown"), (2, "newer new xyz")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in text.bpe_encode(docs, trained).collect()
    }

    def py_apply(word):
        syms = list(word)
        for a, b, m in rules:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = m
                else:
                    out.append(s)
            syms = out
        return syms

    for doc_id, sent in [(1, "low lowest unknown"), (2, "newer new xyz")]:
        want = [t for w in sent.split() for t in py_apply(w)]
        assert got[doc_id] == (want, len(want)), (doc_id, got[doc_id], want)


def test_bpe_encode_checkpoint_chunking(spark):
    # deep rule lists run through the checkpoint-truncated path unchanged
    docs = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    rules = [("a", "a", "aa"), ("aa", "aa", "aaaa")]
    out = text.bpe_encode(docs, rules, checkpoint_every=1).collect()[0]
    assert list(out["tokens"]) == ["aaaa", "aaaa"] and out["n_tokens"] == 2


def test_mmr_diversifies_vs_plain_topk(spark):
    """The point of MMR: the diversified list's worst-case internal
    redundancy (max pairwise sim among picks) must not exceed the plain
    relevance top-10's — and picks are 10 distinct members of the top-20
    candidate pool led by the argmax-relevance doc."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_SMOKE
    from web_analytics_on_aws_spark.functions import (
        as_double_vec,
        cosine_similarity,
    )
    from web_analytics_on_aws_spark import plans
    from web_analytics_on_aws_spark.sources.tables import load_table

    plans.load_all()
    out = plans.QUERIES["retrieval_mmr_topk"](spark, SF_SMOKE).toPandas()
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", as_double_vec("embedding").alias("ev")
    )

    def max_pairwise(ids: list[int]) -> float:
        sub = emb.filter(F.col("vec_id").isin(ids))
        return (
            sub.alias("x")
            .join(sub.alias("y"), F.col("x.vec_id") < F.col("y.vec_id"))
            .select(cosine_similarity("x.ev", "y.ev").alias("s"))
            .agg(F.max("s"))
            .collect()[0][0]
        )

    for qid, grp in out.groupby("query_id"):
        picks = grp.sort_values("mmr_rank")["vec_id"].tolist()
        assert len(picks) == 10 == len(set(picks))
        qv = emb.filter(F.col("vec_id") == int(qid)).select(
            F.col("ev").alias("qv")
        )
        plain = (
            emb.filter(F.col("vec_id") != int(qid))
            .crossJoin(qv)
            .select(
                "vec_id",
                F.round(cosine_similarity("ev", "qv"), 6).alias("rel"),
            )
            .orderBy(F.desc("rel"), F.asc("vec_id"))
            .limit(10)
            .toPandas()
        )
        # rank 1 is pure relevance
        assert picks[0] == int(plain.iloc[0]["vec_id"])
        assert max_pairwise(picks) <= max_pairwise(
            plain["vec_id"].tolist()
        ) + 1e-12, f"query {qid}: MMR list more redundant than plain top-k"


def test_match_recognize_funnel_bounds(spark):
    """Structural pins for the row-pattern funnel: every funnel is >= 3
    symbols (v c+ p), non-overlapping matches fit in the sequence, and the
    per-user symbol string the plan aggregates reproduces an independent
    Python re.findall on the same capped ordering."""
    import re

    from tests.conftest import SF_SMOKE
    from web_analytics_on_aws_spark import plans
    from web_analytics_on_aws_spark.sources.tables import load_table

    plans.load_all()
    out = plans.QUERIES["events_match_recognize_funnel"](spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    got = {
        int(r.user_id): (int(r.seq_len), int(r.n_funnels),
                         None if r.max_funnel_len != r.max_funnel_len
                         else int(r.max_funnel_len))
        for r in out.itertuples()
    }
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, grp in ev.groupby("user_id"):
        seq = "".join(t[0] for t in grp["event_type"].head(2000))
        funnels = re.findall("vc+p", seq)
        want = (
            len(seq),
            len(funnels),
            max((len(f) for f in funnels), default=None),
        )
        assert got[int(uid)] == want, (uid, got[int(uid)], want)

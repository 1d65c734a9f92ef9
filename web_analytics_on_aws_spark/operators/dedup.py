"""Deduplication operators for large-scale training-data pipelines.

Extension surface (BASELINE.json north star): exact, MinHash+LSH, SimHash,
and n-gram-Jaccard dedup over a document corpus, each DataFrame-in/
DataFrame-out with no driver-side collects.

Scale design (100 TB):

- **exact**: hash-groupBy — the shuffle carries 16-byte digests only.
- **n-gram Jaccard**: prefix-filtered inverted-index self-join (AllPairs/
  PPJoin), NOT an all-pairs cross join: only each set's rarest
  |s|−⌈t·|s|⌉+1 shingles are indexed (exactness-preserving), candidates are
  verified with one hash-intersect per pair. Rare-first ordering removes
  stop-shingle join skew by construction; an optional frequency cutoff
  remains as a belt-and-braces guard.
- **MinHash+LSH**: per-doc signature (n hashes) → banded bucket keys →
  groupBy band bucket — candidate pairs only within buckets; cost is
  O(docs × bands), independent of pair count.
- **SimHash**: 64-bit fingerprint via sign-summed token hashes; banded
  16-bit keys prefilter, Hamming distance verifies.

Signatures/fingerprints use built-in HOFs (transform/aggregate/zip_with) +
joins JVM-side; shingling is Arrow-vectorized (one tokenization pass per
document — see with_shingles for why the pure-HOF form was quadratic).
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import ArrayType, StringType

from web_analytics_on_aws_spark.functions import token_split

# ---------------------------------------------------------------------------
# shingling


def with_shingles(
    df: DataFrame, text_col: str = "text", k: int = 3, out: str = "shingles"
) -> DataFrame:
    """Distinct k-word shingles per document, Arrow-vectorized.

    Semantics match the SQL form ``array_distinct(k-grams of split(trim(s),
    ' +'))`` exactly: space-only trim (``strip(' ')``, not full-whitespace
    strip), run-of-spaces tokenizer, first-occurrence distinct order, and
    null/short texts → empty array. A pure-HOF version was ~50× slower:
    Catalyst's projection collapse inlines the tokenizing regex split into
    every element_at of every shingle, re-running it O(tokens·k) times per
    document — the UDF tokenizes each document once per batch."""

    @F.pandas_udf(ArrayType(StringType()))
    def shingle(texts: pd.Series) -> pd.Series:
        out_rows = []
        for s in texts:
            if s is None:
                out_rows.append([])
                continue
            toks = re.split(" +", s.strip(" "))
            if len(toks) < k:
                out_rows.append([])
            else:
                out_rows.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + k])
                            for i in range(len(toks) - k + 1)
                        )
                    )
                )
        return pd.Series(out_rows)

    return df.withColumn(out, shingle(F.col(text_col)))


# ---------------------------------------------------------------------------
# exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact content hash.

    One shuffle: groupBy(md5) with a partial-aggregated ``min_by`` carries
    at most one candidate row per (partition, digest) into the exchange —
    strictly less data than the previous min-id + semi-join-back form,
    which re-shuffled the full rows for the join anyway once the keep set
    outgrows broadcast."""
    h = F.md5(F.col(text_col))
    cols = df.columns
    return (
        df.groupBy(h.alias("__h"))
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("__s"))
        .select(*[F.col(f"__s.{c}").alias(c) for c in cols])
    )


def exact_dedup_ids(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Survivor IDS only (min id per exact content hash) — for callers that
    never read the survivor's other columns. ``min(id)`` keeps the
    aggregate hash-based (a fixed-width mutable buffer; ``min_by`` over a
    struct with strings forces SortAggregate — r12 plan audit) and the
    shuffle carries 16-byte digests + 8-byte ids, never row payloads."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("__h"))
        .agg(F.min(F.col(id_col)).alias(id_col))
        .select(id_col)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index join)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard ≥ threshold.

    Plan: shingle → explode (inverted index) → self-join on shingle →
    count common shingles per pair → exact Jaccard via set sizes.
    ``max_shingle_freq`` drops shingles appearing in more than that many docs
    (stop-shingle skew guard); exactness is preserved only when unset.
    """
    sh = with_shingles(df, text_col, k).select(
        F.col(id_col).alias("id"), "shingles", F.size("shingles").alias("n_sh")
    )
    inv = sh.select("id", "n_sh", F.explode("shingles").alias("shingle"))
    if max_shingle_freq is not None:
        hot = (
            inv.groupBy("shingle")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > max_shingle_freq)
            .select("shingle")
        )
        inv = inv.join(F.broadcast(hot), "shingle", "left_anti")

    # Prefix filtering (AllPairs/PPJoin, Bayardo et al. 2007), exactness-
    # preserving: under a global total order on shingles, two sets with
    # Jaccard ≥ t (⇒ overlap ≥ ⌈t·|x|⌉) must collide within each set's first
    # |x| − ⌈t·|x|⌉ + 1 shingles. Ordering rarest-first (global doc-frequency
    # ascending) makes prefix shingles the most selective, so the self-join
    # input shrinks ~2× and candidate pairs orders of magnitude — the skew
    # that stop-shingles cause in a full inverted-index join disappears.
    sdf = inv.groupBy("shingle").agg(F.count("*").alias("df"))
    pos_w = Window.partitionBy("id").orderBy("df", "shingle")
    prefix_len = F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(float(threshold))) + 1
    prefix = (
        inv.join(sdf, "shingle")
        .withColumn("__pos", F.row_number().over(pos_w))
        .filter(F.col("__pos") <= prefix_len)
        .select("shingle", "id")
    )
    cand = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), "shingle")
        .filter(F.col("pa.id") < F.col("pb.id"))
        .select(F.col("pa.id").alias("doc_a"), F.col("pb.id").alias("doc_b"))
        .distinct()
    )
    # Exact verification on candidates only: carry both shingle sets and
    # intersect JVM-side (array_intersect is hash-based, O(|a|+|b|)).
    sh_a = sh.select(
        F.col("id").alias("doc_a"), F.col("shingles").alias("__sh_a"), F.col("n_sh").alias("n_a")
    )
    sh_b = sh.select(
        F.col("id").alias("doc_b"), F.col("shingles").alias("__sh_b"), F.col("n_sh").alias("n_b")
    )
    common = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            F.size(F.array_intersect("__sh_a", "__sh_b")).alias("n_common"),
        )
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.withColumn("jaccard", F.round(jac, 6))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over near-dup pairs)


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over an undirected pair list → ``(doc_id,
    cluster_id)`` where ``cluster_id`` is the minimum member id — the step
    that turns pairwise near-dup hits (n-gram/MinHash/SimHash/embedding)
    into dedup groups so one canonical doc per group survives.

    Algorithm: iterative min-label propagation. Each round every vertex
    takes ``min(own label, neighbors' labels)`` — one shuffle-join on the
    vertex id per round, partial-aggregated map-side, converging in
    O(graph diameter) rounds. Near-dup graphs are unions of near-cliques
    (diameter ≈ 1–2), so 2–3 rounds dominate in practice; for adversarial
    long-path graphs at 100 TB the same loop structure admits the
    large-star/small-star variant (Kiveris et al., "Connected Components in
    MapReduce and Beyond") with O(log²) rounds. Lineage is truncated with an
    eager ``localCheckpoint`` per round so the plan doesn't grow with the
    iteration count; convergence is detected by counting label changes
    (one scalar per round — no per-row collect).
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # round-0 fold: label = min(self, direct neighbors) in the same
    # aggregation that enumerates vertices — near-clique dup groups converge
    # here, leaving the loop a single no-change confirmation round
    labels = edges.groupBy("a").agg(
        F.least(F.col("a"), F.min("b")).alias("label")
    ).select(F.col("a").alias("id"), "label")
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(nbr_min, labels["id"] == nbr_min["a"], "left")
            .select(
                "id",
                F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
                (F.coalesce("nbr_label", "label") < F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = updated.filter("changed").count()
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def keep_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop every non-canonical duplicate: for each connected component of
    ``pairs`` keep only the min-id member; docs in no pair survive untouched.
    Anti-join on ids only — document payloads never enter the shuffle."""
    clusters = connected_components(pairs)
    losers = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# MinHash + LSH


def minhash_signature(shingles_col: str, num_hashes: int = 128) -> F.Column:
    """n-permutation MinHash signature: sig[j] = min over shingles of
    murmur3(xxhash64(shingle), seed=j). Each shingle string is hashed ONCE
    to 64 bits; the n permutations then re-hash the fixed-width int — an
    8-byte murmur per permutation instead of re-hashing the full string,
    ~length/8× less hash work with the same minwise-independence structure.
    Pure SQL HOFs, O(|shingles| × (len + n)) instead of O(|shingles| × len × n)."""
    return F.expr(
        f"transform(sequence(0, {num_hashes - 1}), "
        f"j -> array_min(transform(transform({shingles_col}, s -> xxhash64(s)), "
        f"h -> hash(h, j))))"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate duplicate pairs via banded MinHash-LSH, scored by estimated
    Jaccard (signature agreement rate) ≥ threshold.

    b=32 bands × r=4 rows → S-curve midpoint (1/b)^(1/r) ≈ 0.42: pairs with
    true Jaccard ≥ 0.5 are caught with prob ≥ 97%.
    """
    rows = num_hashes // bands
    sh = with_shingles(df, text_col, k).filter(F.size("shingles") > 0)
    # Signatures are computed ONCE and cached: three consumers (band explode
    # + two score-side attaches) would otherwise each re-derive the full
    # shingle→hash pipeline. ~|docs| × 128 ints — MBs at gate scale; at
    # corpus scale persist this table to storage instead (same plan shape).
    sig = sh.select(
        F.col(id_col).alias("id"),
        minhash_signature("shingles", num_hashes).alias("sig"),
    ).cache()
    # band join carries only (id, band, key) — never the 128-int signature
    # (shipping sig × bands through the exchange multiplies shuffle bytes
    # by |sig| for no reason; signatures re-attach after pair dedup)
    banded = sig.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> named_struct('band', b, 'key', hash(slice(sig, b*{rows}+1, {rows}))))"
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("doc_a"), F.col("r.id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .join(sig.select(F.col("id").alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a")
        .join(sig.select(F.col("id").alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b")
    )
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
    ) / F.lit(float(num_hashes))
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash


def simhash64(hashes_col: str) -> F.Column:
    """64-bit SimHash from a column of per-token 64-bit hashes: bit b of the
    fingerprint = sign of Σ over tokens of (±1 by bit b of the token hash).

    Formulated as 64 allocation-free integer passes over the hash array
    (outer ``transform(sequence(0,63))``, inner scalar ``aggregate``) —
    measured ~3× faster than the zip_with formulation, which allocated two
    64-int arrays per token. The token-string hash is computed once into
    ``hashes_col``, never inside the per-bit lambda."""
    return F.expr(
        f"""aggregate(
             transform(sequence(0, 63),
               b -> IF(aggregate({hashes_col}, 0,
                         (acc, h) -> acc + IF(((h >> b) & 1) = 1, 1, -1)) > 0,
                       shiftleft(1L, b), 0L)),
             0L, (acc, v) -> acc + v)"""
    )


# Token-hash dialects for SimHash. "xxhash64" is the production default
# (fastest JVM path). "md5_60" folds the top 60 bits of md5 — ~2× slower,
# but both Spark and DuckDB compute it identically (conv/hex-cast of the
# same hex digest), which makes the whole simhash pipeline exactly
# oracle-checkable pair-for-pair rather than audit-boolean-checkable.
SIMHASH_HASH_FNS = {
    "xxhash64": "t -> xxhash64(t)",
    "md5_60": "t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)",
}


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    out: str = "simhash",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    hashes = F.expr(
        f"transform(__sh_toks, {SIMHASH_HASH_FNS[hash_fn]})"
    )
    return (
        df.withColumn("__sh_toks", F.array_distinct(token_split(F.col(text_col))))
        .withColumn("__sh_hashes", hashes)
        .withColumn(out, simhash64("__sh_hashes"))
        .drop("__sh_toks", "__sh_hashes")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    LSH trick: split the 64-bit fingerprint into 4 × 16-bit bands; any pair
    within Hamming ≤ 3 shares ≥1 exact band (pigeonhole). For larger radii
    the band prefilter is a recall-bounded candidate generator — standard
    practice (Manku et al., WWW'07 model) — then exact popcount verifies.
    """
    # cache: both legs of the self-join reuse the computed fingerprints
    # (8 bytes/doc) instead of re-deriving the 64-pass hash fold
    fp = (
        with_simhash(df, text_col, hash_fn=hash_fn)
        .select(F.col(id_col).alias("id"), "simhash")
        .cache()
    )
    banded = fp.select(
        "id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), "
                "b -> named_struct('band', b, 'key', (simhash >> (b * 16)) & 65535))"
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("doc_a"),
            F.col("r.id").alias("doc_b"),
            F.col("l.simhash").alias("h_a"),
            F.col("r.simhash").alias("h_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.expr("bit_count(h_a ^ h_b)")
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )

"""Deterministic sampling / splitting / packing operators for training-data
pipelines (extension surface, BASELINE.json north star).

Everything here must be **reproducible across runs, engines, and cluster
layouts** — a training-data pipeline that samples differently on re-run
poisons experiment comparisons. So no ``rand()``: selection is a pure
function of the row key via a Knuth multiplicative hash —
``((key mod 2^31) * 2654435761) mod 2^32`` — exact BIGINT arithmetic
(the 2^31 pre-mask keeps the product inside int64 for web-scale keys,
so no engine wraps or raises) that any engine
reproduces bit-for-bit (and therefore DuckDB-oracle-checkable).

Scale notes: sampling/splitting are stateless row-local predicates (pure
map, no shuffle). Sequence packing needs a global order — expressed with a
running-sum window; at 100 TB run it per range-partitioned bucket (pack ids
prefixed by bucket) rather than one global window.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

KNUTH = 2654435761
MOD = 2**32


def hash_fraction(key: Column | str) -> Column:
    """Uniform-ish [0,1) value derived from an integer key — deterministic,
    engine-portable (exact integer arithmetic)."""
    c = F.col(key) if isinstance(key, str) else key
    return (c.cast("bigint") % F.lit(2**31) * F.lit(KNUTH) % F.lit(MOD)) / F.lit(
        float(MOD)
    )


def deterministic_sample(
    df: DataFrame, fraction: float, key: str = "doc_id"
) -> DataFrame:
    """Keep ~fraction of rows, chosen by key hash (stable under re-runs,
    repartitioning, and engine choice)."""
    return df.filter(hash_fraction(key) < fraction)


def train_val_test_split(
    df: DataFrame,
    key: str = "doc_id",
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
) -> DataFrame:
    """Stamp a ``split`` column: disjoint, exhaustive, deterministic."""
    h = hash_fraction(key)
    return df.withColumn(
        "split",
        F.when(h < test_fraction, "test")
        .when(h < test_fraction + val_fraction, "val")
        .otherwise("train"),
    )


def bpe_style_token_count(text_col: Column | str) -> Column:
    """BPE-ish subword proxy: count maximal runs of letters, digits, or
    single punctuation marks — the pre-tokenization regex shape GPT-style
    BPE uses before merges. JVM regex, identical semantics in RE2."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    context_len: int = 2048,
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to training context windows ("packs") by running
    token count in a deterministic order: pack_id = cumulative_tokens DIV
    context_len. Greedy sequential packing — the standard pretraining
    batch-construction shape — as a window expression.

    Note: the running sum is a global-order window; for 100 TB, range-
    partition on ``order_col`` first and pack per partition (pack ids get a
    partition prefix), which this operator supports by being applied
    per-bucket.
    """
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return (
        df.withColumn("__cum", F.sum(tokens_col).over(w))
        # a doc belongs to the pack its FIRST token lands in
        .withColumn("pack_id", F.expr(f"(__cum - {tokens_col}) DIV {context_len}"))
        .drop("__cum")
    )


def weighted_interleave(
    sources: list[tuple[DataFrame, float]],
    key: str = "doc_id",
) -> DataFrame:
    """Mix N datasets at per-source sampling rates — the training-data
    mixture step (e.g. 100% wiki, 30% web, 5% code). Each source is
    hash-thinned by its weight (deterministic, key-stable), tagged with its
    mixture index, and unioned. Pure map per source + union — no shuffle;
    at 100 TB the union is just concatenated scan tasks.

    ``sources``: [(df, keep_fraction), ...]; fractions > 1 raise (upsampling
    needs replication, not sampling — do it with explode(sequence) upstream).
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    parts = []
    for i, (df, frac) in enumerate(sources):
        if not (0.0 <= frac <= 1.0):
            raise ValueError(f"fraction {frac} out of [0, 1] for source {i}")
        parts.append(
            deterministic_sample(df, frac, key).withColumn(
                "mixture_source", F.lit(i)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def sample_k_per_group(
    df: DataFrame, group_cols: Sequence[str], k: int, key: str = "doc_id"
) -> DataFrame:
    """Deterministic uniform k-per-group sample: rank rows within each
    group by the Knuth hash of the key (ties broken by the key itself for a
    total order) and keep the first k — the distributed equivalent of a
    per-group reservoir, reproducible across runs, engines, and partition
    layouts. One shuffle on the group columns; ordering uses the exact
    BIGINT hash, never floats or rand()."""
    h = F.col(key).cast("bigint") % F.lit(2**31) * F.lit(KNUTH) % F.lit(MOD)
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def stratified_sample(
    df: DataFrame, strata: Sequence[str], fractions: dict, key: str = "doc_id"
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps its own hash
    fraction (e.g. downsample dominant languages, keep all of rare ones —
    the corpus-rebalancing move every pretraining mix does). Row-local
    predicate against a broadcast CASE on the strata columns: no shuffle,
    no rand(), stable under re-runs and repartitioning. Strata absent from
    ``fractions`` are kept whole (fraction 1.0)."""
    frac = None
    strata = list(strata)
    for value, f in fractions.items():
        key_vals = value if isinstance(value, tuple) else (value,)
        cond = None
        for c, v in zip(strata, key_vals):
            eq = F.col(c) == F.lit(v)
            cond = eq if cond is None else cond & eq
        frac = (
            F.when(cond, F.lit(float(f)))
            if frac is None
            else frac.when(cond, F.lit(float(f)))
        )
    frac = frac.otherwise(F.lit(1.0)) if frac is not None else F.lit(1.0)
    return df.filter(hash_fraction(key) < frac)


def epoch_shuffle_pos(key: Column | str, epoch: int = 0) -> Column:
    """Deterministic per-epoch shuffle position for training-order
    randomization: a different Knuth-hash permutation each epoch, exact
    integer arithmetic (engine-portable, stable under re-runs and
    repartitioning — the property torch-style dataloaders need from a
    distributed corpus)."""
    c = F.col(key) if isinstance(key, str) else key
    # reduce the key domain to 2^31 BEFORE the Knuth multiply: the product
    # then stays < 2^62, inside int64 on every engine (Spark would silently
    # wrap larger keys while ANSI engines raise — the portability contract
    # would break exactly when ids get web-scale). Keys colliding mod 2^31
    # still get a total order from the (pos, key) tiebreak.
    k31 = (c.cast("bigint") + F.lit(epoch) * F.lit(40503)) % F.lit(2**31)
    return k31 * F.lit(KNUTH) % F.lit(MOD)


def _bucketed_global_rank(
    df: DataFrame, bucket: Column, order_cols: list, out_col: str = "train_pos"
) -> DataFrame:
    """Deterministic global rank WITHOUT a single-partition window: rows
    rank inside their ``bucket`` (bucket must be a prefix of the total
    order), bucket offsets come from a per-bucket count rollup (tiny —
    one row per bucket) cumulated with a window over that rollup and
    broadcast back. All corpus-scale shuffles are bucket-partitioned;
    the only single-partition work is the |buckets|-row running sum."""
    d = df.withColumn("__bk", bucket)
    counts = d.groupBy("__bk").agg(F.count("*").alias("__c"))
    wo = Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__bk", F.coalesce(F.sum("__c").over(wo), F.lit(0)).alias("__off")
    )
    win = Window.partitionBy("__bk").orderBy(*order_cols)
    return (
        d.join(F.broadcast(offsets), "__bk")
        .withColumn(
            out_col, (F.col("__off") + F.row_number().over(win)).cast("bigint")
        )
        .drop("__bk", "__off")
    )


def epoch_shuffle(
    df: DataFrame, epoch: int = 0, key: str = "doc_id"
) -> DataFrame:
    """Assign each row its global training position for ``epoch``: rank of
    the per-epoch hash (ties broken by key — a total order). The rank is
    two-phase (bucket = high bits of the hash → per-bucket windows +
    broadcast offsets), so no single-partition global window ever exists —
    the property a 100 TB corpus needs; a toy-size global Window.orderBy
    would plan Exchange SinglePartition and serialize on one task."""
    pos = epoch_shuffle_pos(key, epoch)
    d = df.withColumn("__pos", pos)
    # high 16 bits of the 32-bit hash → ≤ 65536 buckets, prefix of the order
    return _bucketed_global_rank(
        d, F.floor(F.col("__pos") / F.lit(1 << 16)).cast("long"),
        [F.col("__pos"), F.col(key)],
    ).drop("__pos")


def roundrobin_interleave(
    df: DataFrame, source_col: str = "source", key: str = "doc_id", epoch: int = 0
) -> DataFrame:
    """Source-stratified training order: shuffle within each source (per-
    epoch hash), then interleave sources round-robin — position = rank of
    (within-source rank, source). Keeps every batch balanced across
    sources without a weighted sampler. Two window passes; the per-source
    pass shuffles on the source key; the global rank is the bucketed
    two-phase form (no single-partition window)."""
    ws = Window.partitionBy(source_col).orderBy(
        epoch_shuffle_pos(key, epoch), F.col(key)
    )
    ranked = df.withColumn("__r", F.row_number().over(ws))
    # global order (r, source) via the bucketed two-phase rank: bucket on
    # r DIV 2^16 (a prefix of the order) so bucket count stays ~rows/65k
    # and no single-partition window exists at any scale
    return _bucketed_global_rank(
        ranked,
        F.floor(F.col("__r") / F.lit(1 << 16)).cast("long"),
        [F.col("__r"), F.col(source_col)],
    ).drop("__r")

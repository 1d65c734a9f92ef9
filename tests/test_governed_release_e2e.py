"""End-to-end governed corpus release: the session's governance + curation
+ export surfaces COMPOSE — policy-masked view → exact dedup → quality gate
→ k-anonymity audit → epoch order → shard export, one flow."""

import pytest
from pyspark.sql import functions as F

from web_analytics_on_aws_spark.operators import dedup, export, privacy, sampling, text
from web_analytics_on_aws_spark.sources.policy import PolicyCatalog


@pytest.fixture()
def corpus(spark):
    rows = []
    for i in range(40):
        rows.append((i, f"author{i % 7}@example.com",
                     "the quick brown fox jumps over the lazy dog " * 4
                     + f"variant {i}", "web"))
    rows.append((100, "dup@example.com", rows[0][2], "web"))  # exact dup
    rows.append((101, "junk@example.com", "@@@@", "web"))     # fails quality
    return spark.createDataFrame(
        rows, "doc_id long, author_email string, text string, source string"
    )


def test_governed_release_pipeline(spark, corpus, tmp_path):
    # 1. policy: release principal sees masked authorship, never raw email
    cat = PolicyCatalog()
    cat.grant(
        "release-bot", "corpus",
        columns=("doc_id", "author_email", "text", "source"),
        masked={"author_email": "sha256"},
    )
    view = cat.apply(corpus, "release-bot", "corpus")
    assert not [
        r for r in view.select("author_email").collect()
        if r[0] and "@" in r[0]
    ]

    # 2. curation: exact dedup then Gopher quality gate
    deduped = dedup.exact_dedup(view)
    gated = deduped.join(
        text.gopher_flags(deduped).filter(F.col("pass_all")).select("doc_id"),
        "doc_id",
    )
    kept_ids = {r["doc_id"] for r in gated.select("doc_id").collect()}
    assert 100 not in kept_ids and 101 not in kept_ids
    assert len(kept_ids) == 40

    # 3. privacy audit on the release's quasi-identifiers
    report = privacy.k_anonymity_report(
        gated.withColumn("author", F.col("author_email")),
        ["author"], sensitive_col="doc_id",
    ).collect()[0]
    assert report["n_classes"] == 7  # 7 pseudonymous authors survive
    assert report["min_k"] >= 5     # each wrote >= 5 surviving docs

    # 4. deterministic order + shard export with manifest
    ordered = sampling.epoch_shuffle(gated, epoch=0)
    path = str(tmp_path / "release")
    manifest = export.write_training_shards(ordered, path, rows_per_shard=16)
    assert manifest["total_rows"] == 40
    back = export.read_training_shards(spark, path)
    assert back.count() == 40
    # masked authorship survives the round trip; raw emails never touched disk
    emails = [r[0] for r in back.select("author_email").collect()]
    assert all(e is None or "@" not in e for e in emails)

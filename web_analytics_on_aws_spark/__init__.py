"""web_analytics_on_aws_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``aws-samples/web-analytics-on-aws`` (reference at /root/reference/, see
SURVEY.md), rebuilt idiomatically on Spark:

- ``sources``    — table loaders, JSON-lines landing-zone readers, catalog DDL
- ``operators``  — validation, partitioned ingest, compaction, upsert, plus
                   large-scale data-pipeline operators (dedup, similarity,
                   text analysis, multimodal plumbing)
- ``functions``  — scalar column helpers (strict timestamp, hashing, vectors)
- ``plans``      — named analytics queries (web-log parity + SQL surface)
- ``streaming``  — Structured Streaming ingest path (micro-batch parity)

Everything is DataFrame-in/DataFrame-out and designed for multi-executor
scale: no driver-side collects in operators, broadcast joins only below
threshold, partition-pruned scans, AQE on.
"""

__version__ = "0.1.0"

from web_analytics_on_aws_spark.session import get_spark  # noqa: F401

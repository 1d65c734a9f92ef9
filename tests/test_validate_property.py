"""Property-based fuzz of the validation operator: the Spark predicate
column must agree with a Python reference implementation of the fastavro
semantics (SURVEY §2.2 P3/P5, validate.py module docstring) on arbitrarily
mutated records — the 6 golden cases generalized to hundreds.

One Spark job validates a whole generated batch (elementwise compare), so
hypothesis shrinks over record lists without per-example Spark latency.
"""

from __future__ import annotations

import json
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from web_analytics_on_aws_spark.operators.validate import RESULT_OK, validate
from web_analytics_on_aws_spark.schema import WEB_LOG_FIELDS

TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$")


def ref_valid(rec: object) -> bool:
    """Reference implementation of the Lambda's accept/reject decision:
    fastavro non-strict validate + strict timestamp parse (see
    schema_validator.py:70-94 semantics documented in validate.py)."""
    if not isinstance(rec, dict):
        return False
    for name, optional in WEB_LOG_FIELDS:
        present = name in rec
        val = rec.get(name)
        if optional:
            if present and val is not None and not isinstance(val, str):
                return False
        else:
            if not present or not isinstance(val, str):
                return False
    ts = rec.get("timestamp")
    if not isinstance(ts, str) or not TS_RE.match(ts):
        return False
    m, d, hh, mm, ss = int(ts[5:7]), int(ts[8:10]), int(ts[11:13]), int(ts[14:16]), int(ts[17:19])
    if not (1 <= m <= 12 and 1 <= d <= 28 and hh <= 23 and mm <= 59 and ss <= 59):
        return False  # keep day range conservative: generator never emits >28
    return True


_good_ts = st.builds(
    lambda y, mo, d, h, mi, s: f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}Z",
    st.integers(2020, 2030), st.integers(1, 12), st.integers(1, 28),
    st.integers(0, 23), st.integers(0, 59), st.integers(0, 59),
)
_bad_ts = st.sampled_from(
    [
        "2022-09-16 07:35:46",       # wrong separator (reference V3 case)
        "2022-09-16T07:35:46",       # missing Z
        "22-09-16T07:35:46Z",        # short year
        "2022-13-01T00:00:00Z",      # month out of range
        "not-a-timestamp",
        "",
    ]
)
_field_value = st.one_of(
    st.text(alphabet=st.characters(codec="ascii", exclude_characters='"\\\x00'), max_size=12),
    st.none(),
    st.integers(-5, 5),             # wrong JSON type (reference V5 case)
    st.booleans(),
)


@st.composite
def mutated_record(draw):
    rec = {}
    for name, _opt in WEB_LOG_FIELDS:
        if draw(st.booleans()) or draw(st.integers(0, 9)) < 8:  # usually keep
            if name == "timestamp":
                rec[name] = draw(st.one_of(_good_ts, _bad_ts, _field_value))
            else:
                rec[name] = draw(_field_value)
    if draw(st.integers(0, 9)) == 0:
        rec["extraKey"] = "ignored"  # extras are ignored (fastavro non-strict)
    return rec


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(mutated_record(), min_size=40, max_size=40))
def test_spark_validity_matches_reference(spark, records):
    df = spark.createDataFrame([(json.dumps(r),) for r in records], "value string")
    got = [r.result == RESULT_OK for r in validate(df, dialect="parquet").collect()]
    want = [ref_valid(r) for r in records]
    assert got == want, [
        (records[i], got[i], want[i]) for i in range(len(records)) if got[i] != want[i]
    ][:3]

"""Property differential for the as-of join: pandas ``merge_asof`` as
an independent model (round 9).

The catalog already oracle-checks ``asof_join`` against DuckDB's
native ASOF JOIN on the fixture corpus; this adds RANDOM inputs
against a THIRD implementation.  Tie handling is aligned explicitly:
``asof_join`` reduces duplicate right rows at the same (key, ts) to
the max of the value struct before the carry, so the model pre-dedups
the right side the same way (groupby max), after which
``merge_asof(direction='backward', allow_exact_matches=True)`` is the
identical contract (latest right.ts <= left.ts per key, nulls when no
prior row).

Deliberately small domains (4 keys x 12 timestamps) force heavy
collision: same-ts ties, left rows before any right row, keys present
on only one side — the edges a fixture corpus rarely covers all at
once.  Examples are capped because every case runs a Spark job.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ena_database_build_spark.operators import asof as A

key = st.integers(min_value=0, max_value=3)
ts = st.integers(min_value=0, max_value=11)
val = st.integers(min_value=-5, max_value=5)

left_rows = st.lists(st.tuples(key, ts), min_size=0, max_size=12)
right_rows = st.lists(st.tuples(key, ts, val), min_size=0, max_size=12)


def _model(lrows, rrows) -> list[tuple]:
    if not lrows:
        return []
    ldf = pd.DataFrame(lrows, columns=["user_id", "ts"]).astype("int64")
    rdf = pd.DataFrame(rrows, columns=["user_id", "ts", "value"]).astype(
        "int64"
    )
    if rdf.empty:
        merged = ldf.assign(value=float("nan"))
    else:
        rdf = (
            rdf.groupby(["user_id", "ts"], as_index=False)["value"].max()
        )
        merged = pd.merge_asof(
            ldf.sort_values("ts", kind="stable"),
            rdf.sort_values("ts", kind="stable"),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
    return sorted(
        (
            int(r.user_id),
            int(r.ts),
            None if isinstance(r.value, float) and math.isnan(r.value)
            else int(r.value),
        )
        for r in merged.itertuples()
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_matches_merge_asof(spark, lrows, rrows):
    left = spark.createDataFrame(
        lrows or [(None, None)], "user_id long, ts long"
    )
    right = spark.createDataFrame(
        rrows or [(None, None, None)], "user_id long, ts long, value long"
    )
    if not lrows:
        left = left.where("user_id is not null")
    if not rrows:
        right = right.where("user_id is not null")
    got = sorted(
        (r["user_id"], r["ts"], r["value_right"])
        for r in A.asof_join(
            left, right, on="ts", by="user_id", right_cols=["value"]
        ).collect()
    )
    assert got == _model(lrows, rrows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_bucketed_matches_merge_asof(spark, lrows, rrows):
    """Same model for the hot-key bucketed form, with a bucket width
    (4) far below the ts span so carries routinely cross buckets and
    the seed path is exercised on every example."""
    if not lrows:
        return
    left = spark.createDataFrame(lrows, "user_id long, ts long")
    right = spark.createDataFrame(
        rrows or [(None, None, None)], "user_id long, ts long, value long"
    )
    if not rrows:
        right = right.where("user_id is not null")
    got = sorted(
        (r["user_id"], r["ts"], r["value_right"])
        for r in A.asof_join_bucketed(
            left, right, on="ts", by="user_id", right_cols=["value"],
            bucket_width=4,
        ).collect()
    )
    assert got == _model(lrows, rrows)

"""Property-based check of quantile_gate: for arbitrary value
multisets (duplicates, negatives, NULLs, tiny/degenerate sizes) and
arbitrary q, the gated row set must equal filtering by an independent
Python model of percentile_cont (rank r = 1 + (n-1)q over the sorted
non-null values, linear interpolation between floor/ceil ranks)."""

import math

from hypothesis import given, settings, strategies as st

from ena_database_build_spark.operators.quantiles import quantile_gate


def percentile_cont_model(values, q):
    vs = sorted(v for v in values if v is not None)
    if not vs:
        return None
    r = 1.0 + (len(vs) - 1) * q
    lo, hi = vs[math.floor(r) - 1], vs[math.ceil(r) - 1]
    return lo + (r - math.floor(r)) * (hi - lo)


values_strategy = st.lists(
    st.one_of(
        st.none(),
        # quarters in [-8, 8]: exact in binary, so the Python model and
        # Spark's double arithmetic agree bit-for-bit and the >= filter
        # cannot disagree on boundary rows
        st.integers(min_value=-32, max_value=32).map(lambda i: i / 4.0),
    ),
    min_size=0,
    max_size=25,
)


@given(
    values=values_strategy,
    q=st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
    width=st.sampled_from([0.25, 1.0, 100.0]),
)
@settings(max_examples=12, deadline=None)
def test_quantile_gate_matches_percentile_cont_model(
    spark, values, q, width
):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)],
        "doc_id long, quality double",
    )
    got = sorted(
        r["doc_id"]
        for r in quantile_gate(
            df, "quality", q=q, id_col="doc_id", bucket_width=width
        ).collect()
    )
    thr = percentile_cont_model(values, q)
    want = (
        []
        if thr is None
        else sorted(
            i for i, v in enumerate(values) if v is not None and v >= thr
        )
    )
    assert got == want, (values, q, width, thr, got, want)

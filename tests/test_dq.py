"""Data-quality constraints (operators/dq.py): metric values, verdict
thresholds, single-pass report shape, RI coverage."""

import pytest
from pyspark.sql import functions as F

from ena_database_build_spark.operators import dq as DQ

ROWS = [
    # id, key, price, status
    (0, 10, 5.0, "O"),
    (1, 11, 15.0, "F"),
    (2, 11, 25.0, "P"),   # duplicate key
    (3, None, 150.0, "X"),  # null key, out-of-range price, bad status
    (4, 13, None, None),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS, "id long, key long, price double, status string"
    ).cache()


def test_metrics_report_values(spark, df):
    rep = {
        r.check_name: r
        for r in DQ.metrics_report(
            df,
            {
                "key_complete": (DQ.completeness("key"), 1.0),
                "key_unique": (DQ.uniqueness("key"), 1.0),
                "price_range": (DQ.in_range("price", 0.0, 100.0), 0.5),
                "status_domain": (
                    DQ.member_of("status", ["O", "F", "P"]),
                    0.9,
                ),
            },
        ).collect()
    }
    assert rep["key_complete"].metric == 0.8  # 4/5 non-null
    assert not rep["key_complete"].passed
    assert rep["key_unique"].metric == 0.75  # 3 distinct / 4 non-null
    assert rep["price_range"].metric == 0.75  # 3 of 4 in range
    assert rep["price_range"].passed  # threshold 0.5
    assert rep["status_domain"].metric == 0.75
    assert not rep["status_domain"].passed


def test_metrics_report_is_single_job(spark, df):
    """All row-local metrics fold into one aggregation — the plan
    must contain exactly one scan of the input."""
    plan = DQ.metrics_report(
        df,
        {
            "key_complete": (DQ.completeness("key"), 1.0),
            "price_range": (DQ.in_range("price", 0.0, 100.0), 1.0),
        },
    )._jdf.queryExecution().optimizedPlan().toString()
    scans = plan.count("LogicalRDD") + plan.count("InMemoryRelation")
    assert scans == 1 and "Join" not in plan and "Union" not in plan


def test_metrics_report_hostile_names_and_empty_input(spark, df):
    """Check names never touch a SQL string (round-3 ADVICE #2):
    quotes/backticks/dots are plain data.  On an empty table every
    count-ratio metric is NULL and the gate fails CLOSED."""
    hostile = "o'brien's `check`.v1"
    rep = {
        r.check_name: r
        for r in DQ.metrics_report(
            df.where(F.lit(False)),
            {hostile: (DQ.completeness("key"), 1.0)},
        ).collect()
    }
    assert rep[hostile].metric is None
    assert rep[hostile].passed is False  # False, not NULL


def test_uniqueness_report_matches_metrics_report(spark, df):
    """The standalone column-pruned uniqueness row (r13 split: the
    shared-agg count_distinct keyed the WHOLE metrics aggregation by
    the distinct column) is digit- and verdict-identical to the
    metrics_report form, including the fail-closed NULL posture."""
    via_shared = DQ.metrics_report(
        df, {"u": (DQ.uniqueness("key"), 1.0)}
    ).head()
    via_split = DQ.uniqueness_report(df, "key", "u", 1.0).head()
    assert via_split.metric == via_shared.metric == 0.75
    assert via_split.passed == via_shared.passed is False
    empty = DQ.uniqueness_report(
        df.where(F.lit(False)), "key", "u", 1.0
    ).head()
    assert empty.metric is None and empty.passed is False


def test_uniqueness_report_shuffles_only_the_key(spark, df):
    """The distinct's dedup exchange must carry the bare key column —
    no sibling-metric partial states (the r13 dq_report win)."""
    plan = (
        DQ.uniqueness_report(df, "key", "u", 1.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # everything above the source scan (aggregates + exchanges) must
    # reference the key column alone; the scan line itself lists the
    # source's full schema, so cut there
    above_scan = plan.split("Scan")[0]
    assert "key#" in above_scan
    for other in ("price#", "status#", "id#"):
        assert other not in above_scan


def test_ri_attach_fraction_matches_ri_coverage(spark, df):
    """ri_fraction over an ri_attach-ed relation reproduces
    ri_coverage's metric exactly — matched fraction, vacuous 1.0 on
    empty/all-NULL fk — while riding metrics_report's single agg."""
    dim = spark.createDataFrame([(10,), (11,)], "pk long")
    legacy = DQ.ri_coverage(df, "key", dim, "pk", "ri").head()
    folded = DQ.metrics_report(
        DQ.ri_attach(df, "key", dim, "pk"),
        {"ri": (DQ.ri_fraction("key"), 1.0)},
    ).head()
    assert folded.metric == legacy.metric == 0.75
    assert folded.passed == legacy.passed is False
    vacuous = DQ.metrics_report(
        DQ.ri_attach(df.where(F.lit(False)), "key", dim, "pk"),
        {"ri": (DQ.ri_fraction("key"), 1.0)},
    ).head()
    assert vacuous.metric == 1.0 and vacuous.passed


def test_ri_attach_chains_for_multiple_fks(spark, df):
    """Two chained attaches for DIFFERENT fks coexist (per-fk marker
    names — round-13 ADVICE #3: a shared `_hit` name made the second
    join clash with the first's output) and each ri_fraction reads
    its own fk's marker."""
    dim_key = spark.createDataFrame([(10,), (11,)], "pk long")
    dim_id = spark.createDataFrame([(0,), (1,), (2,)], "pk long")
    chained = DQ.ri_attach(
        DQ.ri_attach(df, "key", dim_key, "pk"), "id", dim_id, "pk"
    )
    rep = {
        r.check_name: r
        for r in DQ.metrics_report(
            chained,
            {
                "key_ri": (DQ.ri_fraction("key"), 1.0),
                "id_ri": (DQ.ri_fraction("id"), 1.0),
            },
        ).collect()
    }
    # keys 10, 11, 11, 13 -> 3/4 matched; ids 0..4 -> 3/5 matched
    assert rep["key_ri"].metric == 0.75
    assert rep["id_ri"].metric == 0.6


def test_ri_attach_preserves_rowcount_on_duplicate_dim_keys(spark, df):
    dim = spark.createDataFrame(
        [(10,), (10,), (11,)], "pk long"
    )  # duplicated pk must not fan out fact rows
    assert DQ.ri_attach(df, "key", dim, "pk").count() == df.count()


def test_ri_coverage(spark, df):
    dim = spark.createDataFrame([(10,), (11,)], "pk long")
    row = DQ.ri_coverage(df, "key", dim, "pk", "key_ri").head()
    # non-null keys: 10, 11, 11, 13 -> 3 matched
    assert row.check_name == "key_ri"
    assert row.metric == 0.75
    assert not row.passed


def test_ri_coverage_empty_fact_is_vacuously_intact(spark, df):
    dim = spark.createDataFrame([(10,)], "pk long")
    row = DQ.ri_coverage(
        df.where(F.lit(False)), "key", dim, "pk", "empty_ri"
    ).head()
    assert row.metric == 1.0 and row.passed

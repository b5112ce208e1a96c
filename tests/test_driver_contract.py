"""Regression gate for the driver contract (__spark_entry__): entry()
smoke, a representative queries()/oracle_sql() sample compared via
DuckDB at sf0.001, and interface invariants (every oracle key has a
query; column names align)."""

import hashlib

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
SAMPLE = [
    "a4_circular_resolution",
    "g1_sessionize",
    "j3_fallback_coalesce",
    "minhash_signatures",
    "rolling_fingerprints",
    "events_sessions",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _vhash(df):
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.schema == entry_mod.entry(spark).schema


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, duck, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    s = _canon(qs[name](spark, SF_DIR).toPandas())
    o = _canon(duck.sql(oracles[name]).df())
    assert list(s.columns) == list(o.columns), name
    assert len(s) == len(o), name
    assert _vhash(s) == _vhash(o), name


def test_check_window_ordering_pinned():
    """The driver grades the FIRST 50 registry entries; this pins the
    round-12 check window (the never-driver-checked streaming replay
    row session_aggregates_bucketed_stream in slot 1 + the 32
    remaining r8-window rows + the first 17 r9-window rows — see the
    registry header ledger) so a refactor cannot silently reorder the
    dict and destroy the graded window.  UPDATE THIS LIST ONLY when a
    rotation is deliberately applied
    (tools/rotate_catalog_r12.py --apply)."""
    from ena_database_build_spark.plans.catalog import CATALOG

    expected = [
        "session_aggregates_bucketed_stream", "boilerplate_kgrams",
        "top_ngrams", "events_tumbling", "events_sliding",
        "events_sessions", "approx_distinct", "exact_distinct",
        "multimodal_decode", "multimodal_frames", "events_pivot",
        "props_extract", "stream_totals", "stream_dedup",
        "heavy_hitters", "semantic_dedup", "scd2_user_state",
        "pagerank_suppliers", "zorder_values", "embedding_project",
        "embedding_meanpool", "table_profile", "source_cap",
        "snapshot_diff", "cdc_latest_state", "bloom_decontaminate",
        "bpe_pair_counts", "bpe_merges", "incremental_stats",
        "orc_roundtrip", "stream_enrichment", "dq_report",
        "asof_join_bucketed", "hash_sample_weighted",
        "near_dedup_incremental", "tpch_q7_nation_volume",
        "tpch_q13_order_distribution", "user_retention",
        "compaction_plan", "funnel_conversion", "replica_diff",
        "line_dedup", "activity_streaks", "batch_cosine_topk",
        "event_transitions", "top_purchases", "schema_evolution",
        "span_corruption", "mixture_upsample", "script_composition",
    ]
    assert list(CATALOG)[:50] == expected

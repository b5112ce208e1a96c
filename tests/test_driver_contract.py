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
    round-13 check window (the 33 remaining r9-window rows + the first
    17 r10-window rows, `bpe_compression` first — see the registry
    header ledger) so a refactor cannot silently reorder the dict and
    destroy the graded window.  UPDATE THIS LIST ONLY when a rotation
    is deliberately applied (tools/rotate_catalog_r13.py --apply)."""
    from ena_database_build_spark.plans.catalog import CATALOG

    expected = [
        "bpe_compression", "skew_salted_agg", "skew_salted_join",
        "weighted_sample_n", "rolling_user_value", "scd2_enrichment",
        "weighted_sample_by_source", "cube_revenue", "time_to_convert",
        "winsorize_counts", "contrastive_triples", "supervised_pairs",
        "cms_frequencies", "kmv_distinct", "daily_spine",
        "session_bounce", "trending_types", "length_histogram",
        "revenue_share", "session_duration_quartiles", "purchase_gaps",
        "lang_source_matrix", "grouping_sets_revenue",
        "window_distinct_users", "p456_detectors", "f68_guards",
        "s67_sinks", "span_dedup", "embedding_standardize",
        "sft_transcripts", "psi_drift", "temperature_sampling",
        "near_dedup_keep_longest", "phash_buckets", "merge_upserts",
        "rate_anomalies", "stream_rate_flags", "grouped_split",
        "tokenizer_fertility", "bigram_logprob", "quantile_normalize",
        "simhash_candidates", "edit1_pairs", "funnel_conversion_bounded",
        "quality_ensemble", "plan_batches", "supplier_triangles",
        "session_paths", "mixture_card", "customer_set_ops",
    ]
    assert list(CATALOG)[:50] == expected

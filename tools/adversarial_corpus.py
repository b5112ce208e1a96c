"""Adversarial-value corpus generator + the round-8 triage record.

Builds a mutated copy of the sf0.001 corpus for differential
robustness sweeps (``tools/check_catalog.py <out_dir>`` runs every catalog
queries on Spark AND DuckDB over the same mutated files — any
disagreement is a semantics finding, since both engines read identical
bytes):

* ~10% of values in every non-key column become NULL (deterministic
  index hash);
* string columns additionally plant empty strings, embedded tabs,
  embedded newlines, and mixed quotes;
* numeric columns plant exact zeros;
* array columns plant empty arrays.

Key/join/timestamp columns stay untouched so the relational shapes
remain meaningful.

Float-MAGNITUDE extremes (1e15) are NOT planted in the default mode:
they make every multi-term float SUM order-sensitive, which the exact
6-dp value hash reports as engine-noise, not semantics (measured: 16
spurious failures from that alone).  The ``extremes`` mode (r8 verdict
#5) plants them anyway — ±1e15 next to cent-sized values in the
float-only money columns (EXTREME_COLS), ±1e4 in the exact-integer
money columns (EXTREME_MONEY_EXACT_COLS — bounded below int64
products so those rows VALUE-compare instead of both-raising; see the
constants) — and is adjudicated with the tolerant compare
(``tools/check_catalog.py <dir> --rtol 1e-9``), under which
addition-order ulp drift passes while real semantic divergence fails.
Extremes go ONLY into columns no catalog query casts to a narrower
integral type (l_quantity is excluded: two rows cast it to INT, where
1e15 overflows and BOTH engines rightly raise — that is the ANSI
contract, not a robustness gap).  NULL/empty/zero mutations are NOT
combined into this mode, so extreme-mode failures isolate magnitude
effects.

Round-9 extremes result: **181/181 adjudicated** — 180 rows value-
agree under ``--rtol 1e-9`` (zero spurious sum-order failures; the 16
r8 false alarms are gone), and ``tpch_q7_nation_volume`` adjudicated
as BOTH-ENGINES-RAISE: its exact-cents bigint device (price-cents x
discount-basis-points, the cross-engine rounding fix) overflowed
int64 at the then-planted 1e15 prices, with Spark
(ARITHMETIC_OVERFLOW) and DuckDB (INT64 out of range) agreeing on the
error contract.  Since r12 the exact-money columns plant at ±1e4
(below every int64 product), so the whole catalog value-compares and
the both-raise path stays only as a backstop — check_catalog
reports both-raise as agreement, printing both messages so a
mismatched reason would stay visible.

Round-9 sweep results (this generator + check_catalog):

* zero-row corpus (this generator's "empty" mode, promoted from the
  r8 ad-hoc gate): **181/181 agree** — the 3 r8 residuals (Spark
  ROLLUP/CUBE emit no grand-total row on empty input; exact_quantiles'
  absent-group contract) are CLOSED by mirroring the engine posture in
  those oracles with ``HAVING count(*) > 0`` guards that are no-ops on
  any non-empty input (re-verified at sf0.01).
* NULL/empty corpus (this generator's default mode): **181/181
  agree** after the round-9 oracle NULL-guards (r8 verdict #2) — the
  29 r8 disagreements all traced to oracle-construction artifacts and
  each oracle now mirrors the engine's documented NULL posture with
  an inline comment at the guard (grep 'r9 adversarial sweep' in
  plans/catalog.py); every edit is a NO-OP on the driver corpora
  (verified: full 181-query check green at sf0.01 on the same
  commit).  One ENGINE fix came out of the triage: p1_regex_extract
  cast '' to BIGINT on a non-matching line, which raises under ANSI
  in BOTH engines — it now nullifs first (the P2/F5 malformed-line
  posture).
* unicode corpus (this generator's "unicode" mode): **181/181
  agree** after two genuine r9 fixes the sweep earned its keep with:
  (1) ENGINE — bpe.chars() was a Java regex split whose zero-width
  split points sit at CODE-UNIT boundaries, tearing astral-plane
  characters (emoji) into lone-surrogate symbol halves; now a
  codepoint-safe sequence/substr form (regression-pinned in
  tests/test_bpe.py).  (2) BOTH SIDES — corpus_curation's
  round(avg(quality), 4) float mean landed exactly on a .00005
  boundary on this corpus, where Spark's BigDecimal half-up and
  DuckDB's binary-multiply rounding disagree; the mean is now an
  exact integer micro-unit sum with integer half-up rounding in both
  engines (boundary-proof, value-identical off-boundary).  The three
  pinned engine-level divergences (VT \\s, U+0130 lower, final
  sigma) are excluded from the plant set by construction.
* Round-8 record, for the history: 152/181 agreed; the 29
  disagreements triaged into three families, none an engine defect:

  1. NULL-text shingle synthesis (the dedup/decontaminate family):
     the DuckDB oracles build k-grams with ``concat_ws`` over
     ``tk[i]..tk[i+k-1]``, and for a NULL text every index is NULL —
     concat_ws SKIPS nulls and synthesizes an EMPTY-STRING shingle,
     so NULL-text docs spuriously "share" '' and cross-contaminate.
     The engine propagates NULL (no tokens, no shingles) — standard
     SQL NULL semantics, verified row-by-row on `decontaminate`
     (oracle-only flagged doc_ids are exactly the NULL-text ones).
     The oracles are correct on every corpus whose text column is
     non-NULL (all driver fixtures; enforced upstream by real
     pipelines' ingest contracts).
  2. NULL/empty-array folds (the embedding family): the engine's
     ``aggregate(v, 0.0, +)`` returns the init (0.0) for an empty
     array where DuckDB's list aggregates return NULL; min/max are
     NULL on both sides.  Both postures are defensible; outputs agree
     wherever a vector has elements.
  3. NULL-value aggregation edges elsewhere (quantiles over columns
     with planted NULLs hit the same absent-vs-NULL-row contract as
     the empty corpus).

Usage: python tools/adversarial_corpus.py [src_sf_dir] [out_dir] [mode]
       mode: "nulls" (default) | "extremes" | "unicode" | "empty"
             | "scramble" (layout/row-order invariance, r9)
             | "skew" (hot-key collapse on FK columns, r9)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ena_database_build_spark.plans.catalog import TABLES  # noqa: E402

KEYS = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey",
    "c_nationkey", "s_suppkey", "s_nationkey", "p_partkey",
    "o_orderkey", "o_custkey", "l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "event_id", "user_id", "doc_id", "vec_id", "ts",
    "event_type", "o_orderdate", "l_shipdate", "l_receiptdate",
    "l_commitdate",
}


# Exotic-but-cross-engine-AGREEING Unicode payloads for the "unicode"
# mode (r9): each was probed primitive-by-primitive (lower, length,
# \\s+ normalize, tokenize, md5) against DuckDB before inclusion.  Two
# probed divergences are deliberately EXCLUDED from the plant set and
# pinned by tests/test_unicode_divergences.py instead:
#   * U+000B vertical tab — Java regex \\s matches it, DuckDB's RE2
#     \\s is ASCII [\\t\\n\\f\\r ] without VT, so Spark's whitespace
#     normalization collapses it and DuckDB's does not;
#   * U+0130 LATIN CAPITAL I WITH DOT ABOVE — Java lower() yields
#     i + U+0307 (two codepoints), DuckDB's utf8proc yields plain i;
#   * word-FINAL capital sigma — Java toLowerCase is context-
#     sensitive ('\u03a3\u039f\u03a6\u039f\u03a3' → ...\u03c2 final sigma) while
#     utf8proc maps per-codepoint (→ ...\u03c3); capital sigma is planted
#     word-INITIAL only, where both yield \u03c3.
UNICODE_PAYLOADS = [
    "na\u00efve caf\u00e9 \u200bzero\u200bwidth",   # ZWSP inside tokens
    "\u65e5\u672c\u8a9e\u3000\u30c6\u30ad\u30b9\u30c8",  # CJK + U+3000
    "emoji \U0001f600\U0001f525 mix",                 # astral plane
    "\u05e9\u05dc\u05d5\u05dd \u05e2\u05d5\u05dc\u05dd abc",  # RTL
    "STRA\u1e9eE gro\u00df",                          # capital sharp s
    "\u03a3\u03bf\u03c6\u03af\u03b1 \u03c3\u03bf\u03c6\u03cc\u03c2",  # word-INITIAL SIGMA only
    "a\u00a0nbsp\u00a0b",                             # NBSP (not \\s)
    "cafe\u0301 combining",                            # decomposed accent
    "\u0490\u0491\u0407\u0457 \u0404\u0454",      # Cyrillic ext
    "\ufb01ligature \ufb00 mixed",                    # fi / ff ligatures
]


# money/measure columns that only ever feed float arithmetic in the
# catalog (sum/avg/product/compare) — safe to push to 1e15 magnitudes.
# l_quantity is EXCLUDED: transit_sweepline/tpch_q18 cast it to INT,
# where 1e15 overflows and both engines raise per ANSI.
EXTREME_COLS = {"o_totalprice"}

# lineitem money columns feed the EXACT-INTEGER e4/e6 forms (q1/q5/q7/
# j1/rollup — see catalog's _rev_e4 note).  Planted at ±1e3, not ±1e15
# (r11 verdict #5; tightened 1e4 -> 1e3 per r12 ADVICE): 1e3 is still
# ~10x any realistic price/discount, but the worst per-row LONG
# product — q1's three-term e6 charge, which multiplies in int64
# before its decimal(38,0) cast, (100*m)^3 — now tops out at 1e15,
# ~9000x below the int64 ceiling (at ±1e4 it reached 1e18, only ~9x
# of headroom, and the sweep's pass relied on planted +/- rows
# ALTERNATING in row order to bound the long-accumulated e4 partial
# sums — an assumption the scramble axis or a partitioning change
# could break, producing a Spark-only transient ANSI overflow that
# DuckDB's HUGEINT accumulator never raises).  With ±1e3 even a
# same-sign run of every planted row stays inside int64 at any test
# SF, so the sweep VALUE-compares regardless of row order or
# partitioning, and q5/q7's oracles stay plain plan-shape-free SQL.  At ±1e15 the
# rows adjudicated as both-raise-ARITHMETIC_OVERFLOW instead — a
# weaker check that also forced q5/q7's oracles to mirror the
# engine's pre-join plan shape (AS MATERIALIZED) just so the raise
# was symmetric; bounded planting restores plan-shape-independent
# oracles AND upgrades the adjudication to value equality.
EXTREME_MONEY_EXACT_COLS = {"l_extendedprice", "l_discount", "l_tax"}
EXTREME_MONEY_EXACT_MAG = 1.0e3


def mutate_empty(src: str, out_dir: str) -> None:
    """Zero-row tables with the REAL schemas (the r8 empty-input gate,
    now a first-class mode): exercises aggregate-over-nothing, empty
    writes/read-backs, and empty-model guards."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), out / f"{t}.parquet")
        print(t, "0 rows (schema preserved)")


def mutate_unicode(src: str, out_dir: str) -> None:
    """Exotic Unicode planted at deterministic positions in every
    non-key STRING column (UNICODE_PAYLOADS rotation, ~10% of rows);
    everything else byte-identical to the source.  Exact-compare mode:
    no floats are touched, so the standard 6-dp hash applies."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        n = tbl.num_rows
        cols = {}
        planted = 0
        for i, f in enumerate(tbl.schema):
            col = tbl.column(i)
            is_str = pa.types.is_string(f.type) or pa.types.is_large_string(
                f.type
            )
            if f.name in KEYS or not is_str or n == 0:
                cols[f.name] = col
                continue
            vals = col.to_pylist()
            for j in range(n):
                r = (j * 31337) % 101
                # NULL cells stay NULL (r9 review): this mode's
                # contract is "everything else byte-identical", and
                # overwriting NULLs would mix NULL-removal effects
                # into a sweep meant to isolate unicode effects
                if r < 10 and vals[j] is not None:
                    vals[j] = UNICODE_PAYLOADS[
                        (j + i) % len(UNICODE_PAYLOADS)
                    ]
                    planted += 1
            cols[f.name] = pa.array(vals, type=f.type)
        pq.write_table(pa.table(cols), out / f"{t}.parquet")
        print(t, n, "rows;", planted, "unicode payloads planted")


def mutate_extremes(src: str, out_dir: str) -> None:
    """±1e15 planted at deterministic positions in EXTREME_COLS, ±1e4
    in EXTREME_MONEY_EXACT_COLS (bounded below every int64 product so
    the exact-integer money forms VALUE-compare — see the constant's
    note); every other column byte-identical to the source."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        n = tbl.num_rows
        cols = {}
        planted = 0
        for i, f in enumerate(tbl.schema):
            col = tbl.column(i)
            if f.name in EXTREME_COLS:
                mag = 1.0e15
            elif f.name in EXTREME_MONEY_EXACT_COLS:
                mag = EXTREME_MONEY_EXACT_MAG
            else:
                cols[f.name] = col
                continue
            if n == 0:
                cols[f.name] = col
                continue
            vals = col.to_pylist()
            for j in range(n):
                r = (j * 48271) % 103
                if r == 0:
                    vals[j] = mag
                    planted += 1
                elif r == 50:
                    vals[j] = -mag
                    planted += 1
            cols[f.name] = pa.array(vals, type=f.type)
        pq.write_table(pa.table(cols), out / f"{t}.parquet")
        print(t, n, "rows;", planted, "extremes planted")


# FK-like columns deliberately skewed by the "skew" mode: ~50% of each
# table's rows collapse onto ONE hot key (the column's minimum), the
# hottest realistic shape for a join/group key.  Identity keys
# (doc_id, event_id, *_orderkey as a PK) stay untouched.
SKEW_COLS = {
    "events": "user_id",
    "lineitem": "l_suppkey",
    "orders": "o_custkey",
}


def mutate_skew(src: str, out_dir: str) -> None:
    """Hot-key corpus (round 9): half of events' rows belong to one
    user, half of lineitem to one supplier, half of orders to one
    customer — the 100 TB failure shape where one reducer gets half
    the shuffle.  Both engines read the same bytes, so the sweep
    checks the SEMANTICS hold under extreme key skew (giant-group
    aggregates past the objectHashAggregate fallback threshold,
    single-user sessionization windows, skewed join sides that AQE
    splits); the salted operator forms are separately parity-pinned
    in tests/test_skew.py."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    import pyarrow.compute as pc

    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        n = tbl.num_rows
        col = SKEW_COLS.get(t)
        if col is None or n == 0:
            pq.write_table(tbl, out / f"{t}.parquet")
            print(t, n, "rows (copied)")
            continue
        i = tbl.schema.get_field_index(col)
        hot = pc.min(tbl.column(i)).as_py()
        if hot is None:
            # all-NULL column: the collapse below would be a silent
            # near-no-op (NULL rows are skipped), quietly weakening
            # the skew sweep — fail loudly instead (r9 review finding)
            raise SystemExit(
                f"mutate_skew: {t}.{col} is entirely NULL in {src!r} — "
                "no hot value exists; fix the source corpus or drop "
                "the column from SKEW_COLS"
            )
        idx = np.arange(n)
        mask = (idx * 2654435761 % 100) < 50  # deterministic ~50%
        vals = tbl.column(i).to_pylist()
        planted = 0
        for j in range(n):
            if mask[j] and vals[j] is not None:
                vals[j] = hot
                planted += 1
        tbl = tbl.set_column(
            i, col, pa.array(vals, type=tbl.schema.field(i).type)
        )
        pq.write_table(tbl, out / f"{t}.parquet")
        print(t, n, f"rows; {planted} collapsed onto {col}={hot!r}")


def mutate_scramble(src: str, out_dir: str) -> None:
    """Layout-invariance corpus (round 9): SAME values as the source,
    but every table's rows are deterministically permuted and the
    table is re-laid-out as a DIRECTORY of unevenly-sized part files
    (Fibonacci-proportioned, 7 parts), so both the row order Spark
    observes and the scan-partition boundaries change while the
    relation itself is identical.

    Differential contract: any catalog query whose VALUES change under
    this corpus depends on physical row order or file layout — the
    exact class of bug that hides on a single-file local corpus and
    bites on a 1000-executor cluster where input split boundaries are
    arbitrary.  Run it three ways to separate the axes:

      1. scrambled corpus, default confs      (layout sensitivity)
      2. pristine corpus,  perturbed confs    (partition-count / AQE
         sensitivity — ``check_catalog.py --spark-conf``)
      3. scrambled corpus, perturbed confs    (combined)

    DuckDB reads the same scrambled bytes, so Spark-vs-oracle
    agreement on axis 1/3 proves order-independence of the semantics,
    not just Spark-internal stability."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    weights = np.array([1, 2, 3, 5, 8, 13, 21], dtype=np.float64)
    weights /= weights.sum()
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        n = tbl.num_rows
        # deterministic permutation seeded from the table name
        seed = sum(ord(c) * 131 ** i for i, c in enumerate(t)) % (2**32)
        perm = np.random.Generator(np.random.PCG64(seed)).permutation(n)
        tbl = tbl.take(pa.array(perm, type=pa.int64())) if n else tbl
        part_dir = out / f"{t}.parquet"
        part_dir.mkdir(parents=True, exist_ok=True)
        cuts = np.floor(np.cumsum(weights) * n).astype(np.int64)
        lo = 0
        for k, hi in enumerate(cuts):
            hi = int(hi) if k < len(cuts) - 1 else n
            pq.write_table(
                tbl.slice(lo, hi - lo), part_dir / f"part-{k:02d}.parquet"
            )
            lo = hi
        print(t, n, f"rows permuted (seed {seed}) into {len(cuts)} parts")


def mutate(src: str, out_dir: str) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        n = tbl.num_rows
        idx = np.arange(n)
        mask = (idx * 2654435761 % 97) < 10  # deterministic ~10%
        cols = {}
        for i, f in enumerate(tbl.schema):
            col = tbl.column(i)
            if f.name in KEYS or n == 0:
                cols[f.name] = col
                continue
            vals = col.to_pylist()
            if pa.types.is_string(f.type) or pa.types.is_large_string(
                f.type
            ):
                for j in range(n):
                    r = (j * 40503) % 101
                    if mask[j]:
                        vals[j] = None
                    elif r == 0:
                        vals[j] = ""
                    elif r == 1:
                        vals[j] = "tab\there"
                    elif r == 2:
                        vals[j] = "nl\nhere"
                    elif r == 3:
                        vals[j] = "quote\"and'mix"
            elif pa.types.is_floating(f.type):
                for j in range(n):
                    r = (j * 48271) % 103
                    if mask[j]:
                        vals[j] = None
                    elif r == 0:
                        vals[j] = 0.0
            elif pa.types.is_integer(f.type):
                for j in range(n):
                    r = (j * 69621) % 107
                    if mask[j]:
                        vals[j] = None
                    elif r == 0:
                        vals[j] = 0
            elif pa.types.is_list(f.type) or pa.types.is_large_list(
                f.type
            ):
                for j in range(n):
                    r = (j * 16807) % 109
                    if mask[j]:
                        vals[j] = None
                    elif r == 0:
                        vals[j] = []
            else:
                for j in range(n):
                    if mask[j]:
                        vals[j] = None
            cols[f.name] = pa.array(vals, type=f.type)
        pq.write_table(pa.table(cols), out / f"{t}.parquet")
        print(t, n, "rows mutated")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_adv"
    mode = sys.argv[3] if len(sys.argv) > 3 else "nulls"
    if mode == "extremes":
        mutate_extremes(src, dest)
    elif mode == "unicode":
        mutate_unicode(src, dest)
    elif mode == "empty":
        mutate_empty(src, dest)
    elif mode == "scramble":
        mutate_scramble(src, dest)
    elif mode == "skew":
        mutate_skew(src, dest)
    elif mode == "nulls":
        mutate(src, dest)
    else:
        raise SystemExit(
            f"unknown mode {mode!r}: use 'nulls', 'extremes', 'unicode', "
            f"'empty', 'scramble' or 'skew'"
        )

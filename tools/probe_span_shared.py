"""A/B probe: span_dedup broadcast-gram-join (current) vs
shared-exchange gram relation (r13 verdict item 1) — MEASURED AND
REJECTED in r14; kept as the committed evidence.

The alternative keys the non-NULL gram relation ONCE by _g
(repartition), computes the dup verdict as an aggregate over that
exchange (no separate partial-agg exchange), and equi-joins the probe
side against the SAME exchange (ReusedExchange) — the gram
construction kernel (interpreted HOF transform) is evaluated once
instead of twice.  The NULL-gram tail rows (last k-1 positions per
doc) rejoin via a cheap kernel-free second pass (scan+split+slice
only — no per-position concat_ws).

Two variants: ``span_dedup_shared`` is the naive form (column pruning
inserts a Project below the repartition on the aggregate branch, the
subtrees de-canonicalize, NO reuse — kernel still ×2 plus an SMJ);
``span_dedup_shared2`` defeats the pruning with never-false guards on
otherwise-unused aggregates, achieving the intended plan (2 scans,
1 ReusedExchange, kernel planned ONCE).

r14 measurements (local[32], N-replica sf0.1 documents, exact-copy
replicas = worst-case ~100% dup density; median of 3, interleaved):

    x1 : broadcast 2.61 s   shared2 1.65 s   (launch-floor regime:
         the dup-map broadcast build is an extra serial job)
    x10: broadcast 4.63 s   shared2 4.32 s
    x30: broadcast 11.96/12.24 s   shared2 14.14/13.41 s  (two ABAB
         rounds — shared2 LOSES ~12-15% where data dominates)

Verdict: rejected.  Where the launch floor has amortized, the
corpus-sized exchange of (id, pos, tok, gram-string) rows costs more
than the saved kernel evaluation — and structurally the shared form
(a) ships ~5x the corpus bytes through the network where the
broadcast form ships a vocab-sized aggregate (guide §2.3), and
(b) loses map-side combine on the gram aggregate: a boilerplate gram
in millions of documents lands its EVERY occurrence in one reduce
task (complete-mode agg over the exchange — AQE skew splitting
applies to joins, not aggregates), the exact straggler the operator's
docstring exists to avoid.  Replica corpora cap gram frequency at N,
so no local measurement can price that hazard — first-principles
decides, and it decides for the broadcast form.

Usage: python tools/probe_span_shared.py [replica counts...]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bench_bars import generate
from ena_database_build_spark.operators.curation import span_dedup
from ena_database_build_spark.session import get_spark


def span_dedup_shared(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    base = df.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_arr"),
    )
    gram_arr = F.transform(
        "_arr",
        lambda x, i: F.when(
            i + F.lit(k) <= F.size("_arr"),
            F.concat_ws(" ", F.slice("_arr", i + F.lit(1), k)),
        ),
    )
    grams = base.select(
        F.col(id_col),
        F.posexplode(
            F.arrays_zip(F.col("_arr").alias("_tok"), gram_arr.alias("_g"))
        ).alias("_pos", "_z"),
    ).select(
        id_col,
        "_pos",
        F.col("_z._tok").alias("_tok"),
        F.col("_z._g").alias("_g"),
    )
    # ---- the shared-exchange part ----
    g_part = grams.where(F.col("_g").isNotNull()).repartition("_g")
    dup_test = (
        (F.min(id_col) != F.max(id_col)).alias("_d")
        if min_docs == 2
        else (F.count_distinct(F.col(id_col)) >= min_docs).alias("_d")
    )
    dup_grams = (
        g_part.groupBy("_g")
        .agg(dup_test)
        .where(F.col("_d"))
        .select("_g", F.lit(1).alias("_dup"))
    )
    marked_nn = (
        g_part.join(dup_grams, "_g", "left")
        .select(id_col, "_pos", "_tok", "_dup")
    )
    # NULL-gram tail (last min(k-1, n) positions): kernel-free rebuild
    n = F.size("_arr")
    start1 = F.greatest(n - F.lit(k) + F.lit(2), F.lit(1))
    tail = (
        base.select(
            F.col(id_col),
            (start1 - F.lit(1)).alias("_off"),
            F.posexplode(
                F.slice("_arr", start1, F.least(F.lit(k - 1), n))
            ).alias("_rel", "_tok"),
        )
        .select(
            id_col,
            (F.col("_off") + F.col("_rel")).alias("_pos"),
            "_tok",
            F.lit(None).cast("int").alias("_dup"),
        )
    )
    marked = marked_nn.unionByName(tail)
    cover = (
        Window.partitionBy(id_col).orderBy("_pos").rangeBetween(-(k - 1), 0)
    )
    verdict = marked.withColumn(
        "_covered", F.max("_dup").over(cover).isNotNull()
    )
    return verdict.groupBy(id_col).agg(
        F.sum((~F.col("_covered")).cast("long")).alias("n_kept"),
        F.sum(F.col("_covered").cast("long")).alias("n_dropped"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            ~F.col("_covered"),
                            F.struct(F.col("_pos"), F.col("_tok")),
                        )
                    )
                ),
                lambda s: s["_tok"],
            ),
        ).alias(text_col),
    )


def span_dedup_shared2(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Variant 3: like span_dedup_shared but the dup aggregate keeps
    ALL FOUR columns live (via never-false guards on otherwise-unused
    aggregates) so column pruning cannot insert a Project below the
    repartition on the aggregate branch — both join inputs must
    canonicalize to the IDENTICAL exchange subtree (ReusedExchange)."""
    base = df.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_arr"),
    )
    gram_arr = F.transform(
        "_arr",
        lambda x, i: F.when(
            i + F.lit(k) <= F.size("_arr"),
            F.concat_ws(" ", F.slice("_arr", i + F.lit(1), k)),
        ),
    )
    grams = base.select(
        F.col(id_col),
        F.posexplode(
            F.arrays_zip(F.col("_arr").alias("_tok"), gram_arr.alias("_g"))
        ).alias("_pos", "_z"),
    ).select(
        id_col,
        "_pos",
        F.col("_z._tok").alias("_tok"),
        F.col("_z._g").alias("_g"),
    )
    g_part = grams.where(F.col("_g").isNotNull()).repartition("_g")
    dup_test = (
        (F.min(id_col) != F.max(id_col)).alias("_d")
        if min_docs == 2
        else (F.count_distinct(F.col(id_col)) >= min_docs).alias("_d")
    )
    dup_grams = (
        g_part.groupBy("_g")
        .agg(dup_test, F.min("_pos").alias("_p0"), F.first("_tok").alias("_t0"))
        # the _p0/_t0 guards are always true (positions are >= 0,
        # tokens are non-NULL post-split) but the optimizer cannot
        # prove it, so _pos/_tok stay live below the repartition
        .where(F.col("_d") & (F.col("_p0") >= 0) & F.col("_t0").isNotNull())
        .select("_g", F.lit(1).alias("_dup"))
    )
    marked_nn = (
        g_part.join(dup_grams, "_g", "left")
        .select(id_col, "_pos", "_tok", "_dup")
    )
    n = F.size("_arr")
    start1 = F.greatest(n - F.lit(k) + F.lit(2), F.lit(1))
    tail = (
        base.select(
            F.col(id_col),
            (start1 - F.lit(1)).alias("_off"),
            F.posexplode(
                F.slice("_arr", start1, F.least(F.lit(k - 1), n))
            ).alias("_rel", "_tok"),
        )
        .select(
            id_col,
            (F.col("_off") + F.col("_rel")).alias("_pos"),
            "_tok",
            F.lit(None).cast("int").alias("_dup"),
        )
    )
    marked = marked_nn.unionByName(tail)
    cover = (
        Window.partitionBy(id_col).orderBy("_pos").rangeBetween(-(k - 1), 0)
    )
    verdict = marked.withColumn(
        "_covered", F.max("_dup").over(cover).isNotNull()
    )
    return verdict.groupBy(id_col).agg(
        F.sum((~F.col("_covered")).cast("long")).alias("n_kept"),
        F.sum(F.col("_covered").cast("long")).alias("n_dropped"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            ~F.col("_covered"),
                            F.struct(F.col("_pos"), F.col("_tok")),
                        )
                    )
                ),
                lambda s: s["_tok"],
            ),
        ).alias(text_col),
    )


def timed(df, reps=3):
    df.write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(reps):
        st = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - st)
    runs.sort()
    return runs[len(runs) // 2], runs


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(min(cpus, 8))))
    spark = get_spark(
        "probe-span", master=f"local[{cpus}]", shuffle_partitions=shuffle
    )
    spark.sparkContext.setLogLevel("ERROR")

    # parity check at x1 first
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    a = {
        tuple(r)
        for r in span_dedup(docs, k=8, min_docs=2).collect()
    }
    b = {
        tuple(r)
        for r in span_dedup_shared2(docs, k=8, min_docs=2).collect()
    }
    print(f"parity x1: rows {len(a)} vs {len(b)}, equal={a == b}", flush=True)
    if a != b:
        onlya = list(a - b)[:3]
        onlyb = list(b - a)[:3]
        print("only-a:", onlya)
        print("only-b:", onlyb)
        return

    # plan shape of the shared2 form
    out = span_dedup_shared2(docs, k=8, min_docs=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    print(
        f"shared2 final plan: Scans={final.count('Scan parquet')} "
        f"ReusedExchange={final.count('ReusedExchange')} "
        f"SMJ={final.count('SortMergeJoin')} "
        f"BHJ={final.count('BroadcastHashJoin')}",
        flush=True,
    )
    if final.count("ReusedExchange") == 0:
        print("---- full final plan (no reuse!) ----")
        print(final[:6000])

    for n in ns:
        out_dir = f"/tmp/spark_graft_bars_{n}"
        generate(out_dir, n, {"documents"})
        d = spark.read.parquet(f"{out_dir}/documents.parquet")
        spark.sparkContext.setJobDescription(f"span broadcast x{n}")
        t_a, runs_a = timed(span_dedup(d, k=8, min_docs=2))
        spark.sparkContext.setJobDescription(f"span shared2 x{n}")
        t_b, runs_b = timed(span_dedup_shared2(d, k=8, min_docs=2))
        print(
            f"x{n}: broadcast {t_a:.3f}s {[round(r,3) for r in runs_a]}  "
            f"shared2 {t_b:.3f}s {[round(r,3) for r in runs_b]}  "
            f"loadavg={os.getloadavg()[0]:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

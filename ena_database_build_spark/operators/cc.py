"""Connected components + near-duplicate cluster resolution.

The missing END stage of near-dedup: LSH gives candidate pairs
(``operators/dedup.py``), Jaccard verifies them — but a training-data
pipeline must then pick ONE canonical document per duplicate *cluster*,
and clusters are the connected components of the verified-pair graph
(A~B, B~C => {A,B,C} even when A,C never met in a band).

Scale design (the reference has no analog; this is §2.11+ surface):

* Min-label propagation over the edge list: every iteration is one
  equi-join (labels onto edge destinations) + one map-side-combinable
  ``min`` aggregation — the same two-shuffle shape GraphX/Pregel jobs
  run.  No adjacency lists are materialized per node, so a hot node
  (boilerplate duplicated millions of times) is just many edge ROWS,
  spread across partitions, never one giant row.
* Labels only ever decrease, so convergence is monotone; iterations
  needed = graph diameter.  Duplicate-cluster graphs are
  near-cliques (diameter 2-3) — the loop exits after 3-4 rounds.
* Each iteration ``localCheckpoint``s the label frame: iterative
  self-referential lineage otherwise grows Catalyst's analysis time
  super-linearly and re-executes the whole chain per action.  On a
  production cluster with retries, configure
  ``spark.sparkContext.setCheckpointDir`` and pass
  ``reliable_checkpoint=True`` (executor loss discards localCheckpoint
  blocks; a reliable checkpoint survives).
* The per-iteration convergence test is a ``count`` on the changed-row
  side — the one unavoidable driver action of any fixpoint algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D


def connected_components(
    edges: DataFrame,
    src: str = "left_id",
    dst: str = "right_id",
    max_iter: int = 25,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Label every node of the undirected edge graph with the minimum
    node id reachable from it (= its component id).

    Returns ``(node, component)`` for every node that appears in at
    least one edge.  Deterministic: component ids are min ids, not
    partition-dependent.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # Materialize the edge list ONCE before iterating: sym is referenced
    # 2x per round, and without truncation each reference re-executes
    # the whole upstream lineage (e.g. an LSH+Jaccard pipeline) every
    # iteration — measured minutes instead of seconds at sf0.1.
    sym = _truncate(sym, reliable_checkpoint)
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("min_nbr"))
        .select(
            F.col("a").alias("node"),
            F.least("a", "min_nbr").alias("component"),
        )
    )
    labels = _truncate(labels, reliable_checkpoint)
    for _ in range(max_iter):
        # neighbor minimum: one join keyed on the edge destination, one
        # min-agg keyed on the source — both shuffles carry (int, int)
        nbr = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = (
            labels.join(nbr, labels.node == nbr.a, "left")
            .select(
                "node",
                F.col("component").alias("old_component"),
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
        )
        stepped = _truncate(stepped, reliable_checkpoint)
        changed = stepped.where(
            F.col("component") < F.col("old_component")
        ).count()
        labels = stepped.select("node", "component")
        if changed == 0:
            break
    else:
        # exhausting max_iter with labels still moving means the graph
        # diameter exceeds the iteration budget — returning here would
        # silently split components (e.g. a long chain of
        # incrementally-edited near-duplicates) into several clusters
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing); raise "
            "max_iter — the iteration bound must exceed the graph "
            "diameter"
        )
    return labels


def _truncate(df: DataFrame, reliable: bool) -> DataFrame:
    return df.checkpoint(eager=True) if reliable else df.localCheckpoint(
        eager=True
    )


def _collapse_exact(
    df: DataFrame, text_col: str, id_col: str, order_cols=None
) -> DataFrame:
    """One min-id representative row per exact content fingerprint.

    Run BEFORE any LSH stage: every match decision downstream is a
    pure function of the text, so an exact-duplicate group behaves as
    one document — but left uncollapsed, a group of g identical texts
    lands in one LSH bucket and costs g^2/2 candidate pairs, each
    re-verified over the full shingle set.  (Measured: the sf1
    replicated corpus, where groups grow ~10x, ran the incremental
    near-dedup past 9 minutes; collapsed it completes in seconds.)
    The collapse provably preserves the survivor set: group members
    share corpus-hit status and cluster membership, and the cluster
    minimum over representatives (each its group's min id) IS the
    minimum over all members.  That proof needs every group member to
    participate in LSH matching identically, which holds for any doc
    with at least one token — ``shingle_rows`` emits a partial shingle
    for sub-k-token docs — but NOT for no-content docs: NULL text
    yields zero shingle rows (never an LSH candidate, always
    survives), while ``fingerprint`` coalesces NULL and
    whitespace-only text to the same '' identity.  Collapsing that
    group would drop rows LSH never would have.  No-content docs are
    therefore excluded from the collapse and passed through untouched
    (round-3 ADVICE item #1)."""
    from pyspark.sql import Window

    norm = D.normalized_text(F.col(text_col))
    has_content = norm.isNotNull() & (norm != F.lit(""))
    # default representative: min id; callers may rank by quality
    # first (near_dedup_best) — the survivor-set proof only needs the
    # ordering to be deterministic and shared with the cluster stage
    order_cols = order_cols or [F.col(id_col).asc_nulls_last()]
    w = Window.partitionBy("_fp").orderBy(*order_cols)
    with_fp = df.withColumn("_fp", D.fingerprint(F.col(text_col)))
    collapsible = (
        with_fp.where(has_content)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return collapsible.unionByName(with_fp.where(~has_content)).drop("_fp")


def near_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 4,
    band_size: int = 1,
    k: int = 2,
) -> DataFrame:
    """Drop near-duplicates, keeping the min-id document per duplicate
    cluster: exact-fingerprint collapse -> LSH candidates ->
    exact-Jaccard verify -> connected components -> anti-join the
    losers.  Every stage is banded/keyed — no all-pairs work anywhere,
    and the collapse keeps identical-text groups from going quadratic
    inside their LSH bucket (see :func:`_collapse_exact`)."""
    reps = _collapse_exact(df, text_col, id_col)
    pairs = D.lsh_candidate_pairs(
        reps, text_col, id_col, num_hashes, band_size, k
    )
    verified = D.jaccard_pairs(reps, pairs, text_col, id_col, k).where(
        F.col("jaccard") >= threshold
    )
    comp = connected_components(verified)
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return reps.join(losers, id_col, "left_anti")


def near_dedup_best(
    df: DataFrame,
    quality_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 4,
    band_size: int = 1,
    k: int = 2,
) -> DataFrame:
    """:func:`near_dedup` with a QUALITY-aware survivor policy: per
    duplicate cluster, keep the row with the highest ``quality_col``
    (ties -> min id) instead of the min id — the RefinedWeb /
    production-curation policy of keeping the longest / best-scored
    member, since near-duplicates are rarely byte-identical and the
    discarded variants may be the truncated ones.

    The exact-fingerprint collapse ranks by the same (quality DESC,
    id ASC) order, so the cluster winner over representatives IS the
    winner over all members: identical-text group members share every
    LSH match decision, and the per-group maximum composes with the
    per-cluster maximum under one consistent ordering.  NULL quality
    sorts last (an unscored row never beats a scored one).  Same
    banded/keyed pipeline as :func:`near_dedup` — one extra window
    over the cluster labels replaces the anti-join."""
    from pyspark.sql import Window

    order = [
        F.col(quality_col).desc_nulls_last(),
        F.col(id_col).asc_nulls_last(),
    ]
    reps = _collapse_exact(df, text_col, id_col, order_cols=order)
    pairs = D.lsh_candidate_pairs(
        reps, text_col, id_col, num_hashes, band_size, k
    )
    verified = D.jaccard_pairs(reps, pairs, text_col, id_col, k).where(
        F.col("jaccard") >= threshold
    )
    comp = connected_components(verified)
    labeled = reps.join(
        comp, reps[id_col] == comp["node"], "left"
    ).withColumn("_cluster", F.coalesce(F.col("component"), F.col(id_col)))
    w = Window.partitionBy("_cluster").orderBy(*order)
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_cluster", "node", "component")
    )


def near_dedup_incremental(
    incoming: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 4,
    band_size: int = 1,
    k: int = 2,
) -> DataFrame:
    """Continuous-build NEAR dedup: keep the incoming rows that are
    near-duplicates neither of the already-ingested corpus nor of a
    surviving earlier (lower-id) row in the batch itself — the fuzzy
    counterpart of :func:`~ena_database_build_spark.operators.dedup.
    dedup_incremental` (which is exact-fingerprint only).

    Two rules, applied in order:

    1. an incoming doc with a verified (Jaccard >= ``threshold``)
       match in ``existing`` is dropped;
    2. the remaining incoming docs near-dedup among themselves with
       :func:`near_dedup`'s cluster semantics (connected components,
       min-id winner).

    Shape: ONE banded LSH candidate join over the union (cross pairs
    and in-batch pairs fall out of the same equi-join — no second
    corpus pass), Jaccard verification on the same union, then two
    anti-joins.  Ids must be globally unique across both frames (they
    are the pair/graph identity; the ``left < right`` candidate rule
    silently drops colliding-id pairs).  At production scale,
    materialize the existing side's band index once per epoch instead
    of recomputing signatures per batch — the operator's join shape is
    unchanged; only the ``existing`` scan is replaced by the index
    read."""
    cols = [F.col(id_col), F.col(text_col)]
    # per-side exact collapse first (see _collapse_exact): identical
    # texts share every downstream match decision, and uncollapsed
    # they cost group^2/2 LSH pairs.  Collapsing each side separately
    # keeps the cross-side pair (one representative each) that rule 1
    # needs; the surviving set is provably unchanged.
    incoming = _collapse_exact(
        incoming.select(*cols), text_col, id_col
    )
    existing = _collapse_exact(
        existing.select(*cols), text_col, id_col
    )
    tagged = incoming.select(*cols).unionByName(existing.select(*cols))
    pairs = D.lsh_candidate_pairs(
        tagged, text_col, id_col, num_hashes, band_size, k
    )
    verified = D.jaccard_pairs(tagged, pairs, text_col, id_col, k).where(
        F.col("jaccard") >= threshold
    )
    return _resolve_incremental(verified, incoming, id_col)


def _resolve_incremental(
    verified: DataFrame, incoming: DataFrame, id_col: str
) -> DataFrame:
    """Applies the two incremental rules to a verified pair frame:
    drop incoming docs in a cross pair (rule 1), then min-id-winner
    cluster resolution over the in-batch pairs among the remaining
    (rule 2).  ``verified`` may contain existing-existing pairs; they
    are ignored."""
    inc_ids = incoming.select(F.col(id_col))
    il = inc_ids.select(F.col(id_col).alias("left_id")).withColumn(
        "_li", F.lit(True)
    )
    ir = inc_ids.select(F.col(id_col).alias("right_id")).withColumn(
        "_ri", F.lit(True)
    )
    # no broadcast hints (r9): the incoming-batch id list scales with
    # the batch, and a hint is always honored — AQE broadcasts these
    # id-only projections whenever the batch is small (every test SF)
    # and shuffle-joins a genuinely huge batch instead of OOMing
    v = (
        verified.join(il, "left_id", "left")
        .join(ir, "right_id", "left")
        .select(
            "left_id",
            "right_id",
            F.coalesce("_li", F.lit(False)).alias("li"),
            F.coalesce("_ri", F.lit(False)).alias("ri"),
        )
    )
    corpus_hits = (
        v.where(F.col("li") != F.col("ri"))
        .select(
            F.when(F.col("li"), F.col("left_id"))
            .otherwise(F.col("right_id"))
            .alias(id_col)
        )
        .distinct()
    )
    survivors = incoming.join(corpus_hits, id_col, "left_anti")
    batch_pairs = (
        v.where(F.col("li") & F.col("ri"))
        .select("left_id", "right_id")
        .join(
            survivors.select(F.col(id_col).alias("left_id")),
            "left_id",
            "left_semi",
        )
        .join(
            survivors.select(F.col(id_col).alias("right_id")),
            "right_id",
            "left_semi",
        )
    )
    comp = connected_components(batch_pairs)
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return survivors.join(losers, id_col, "left_anti")


def band_index(
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 4,
    band_size: int = 1,
    k: int = 2,
) -> DataFrame:
    """The per-epoch materialization for continuous near-dedup: LSH
    band rows ``(id, band_idx, band_sig)`` of the exact-collapsed
    corpus.  Persist this once per epoch (parquet, bucketed by
    band_sig if you like); each incoming batch then joins THESE rows
    for cross-corpus candidates instead of re-shingling the corpus —
    see :func:`near_dedup_incremental_indexed`."""
    reps = _collapse_exact(
        existing.select(F.col(id_col), F.col(text_col)), text_col, id_col
    )
    return D.band_rows(reps, text_col, id_col, num_hashes, band_size, k)


def near_dedup_incremental_indexed(
    incoming: DataFrame,
    existing: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 4,
    band_size: int = 1,
    k: int = 2,
) -> DataFrame:
    """:func:`near_dedup_incremental` against a MATERIALIZED corpus
    band index (:func:`band_index`) — result-identical (pinned by a
    parity test), with the corpus-scale work removed from the batch
    path:

    * cross-corpus candidates come from joining the batch's band rows
      to the index — the corpus is never re-shingled;
    * exact-Jaccard verification re-reads ``existing`` ONLY for the
      candidate ids (a semi-join), so the verify explode is sized by
      the candidate set, not the corpus.

    ``index`` must have been built with the same
    ``num_hashes/band_size/k`` (band signatures are parameter-
    specific)."""
    incoming = _collapse_exact(
        incoming.select(F.col(id_col), F.col(text_col)), text_col, id_col
    )
    inc_bands = D.band_rows(
        incoming, text_col, id_col, num_hashes, band_size, k
    )
    ex_bands = index.select(
        F.col(id_col).alias("_ex_id"), "band_idx", "band_sig"
    )
    cross = (
        inc_bands.join(ex_bands, ["band_idx", "band_sig"])
        .select(
            F.least(F.col(id_col), F.col("_ex_id")).alias("left_id"),
            F.greatest(F.col(id_col), F.col("_ex_id")).alias("right_id"),
        )
        .distinct()
    )
    in_batch = D.lsh_candidate_pairs(
        incoming, text_col, id_col, num_hashes, band_size, k
    )
    pairs = cross.unionByName(in_batch).distinct()
    ex_cand_ids = (
        cross.select(F.col("left_id").alias(id_col))
        .unionByName(cross.select(F.col("right_id").alias(id_col)))
        .join(incoming.select(id_col), id_col, "left_anti")
        .distinct()
    )
    ex_cand = _collapse_exact(
        existing.select(F.col(id_col), F.col(text_col)), text_col, id_col
    ).join(ex_cand_ids, id_col, "left_semi")
    tagged = incoming.unionByName(ex_cand)
    verified = D.jaccard_pairs(tagged, pairs, text_col, id_col, k).where(
        F.col("jaccard") >= threshold
    )
    return _resolve_incremental(verified, incoming, id_col)

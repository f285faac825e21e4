"""Connected components over near-duplicate pair edges (brief
§extensions: dedup clustering).

Pairwise dedup output (exact, Jaccard, MinHash, SimHash, embedding —
operators/dedup.py, similarity.py) is edges; what a pipeline keeps is
one document per TRANSITIVE cluster (A≈B, B≈C ⇒ {A,B,C} even when
A,C were never compared). This is the canonical iterative algorithm
the declarative surface can't express in one query.

Algorithm: hash-min label propagation. Every node starts labeled with
its own id; each round every node takes the min label in its closed
neighborhood; converged when no label changes. Rounds needed = graph
diameter (dup clusters are near-cliques, so 2-3 rounds in practice —
the per-round cost is one groupBy shuffle of (node, label) pairs, no
document bodies). localCheckpoint per round cuts the growing lineage,
and the convergence probe is a single count() aggregate — the one
driver action an iterative fixpoint genuinely needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unionfind_components(edge_rows) -> dict[int, int]:
    """Driver-side union-find over a SMALL edge list: id → min id of
    its component. Path-halving + union by arbitrary root, then one
    pass to relabel every member with the component minimum."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]
            r = parent[r]
        while x != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in edge_rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict[int, int] = {}
    for x in list(parent):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    return {x: comp_min[find(x)] for x in parent}


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iters: int = 20,
    max_collect_edges: int = 100_000,
) -> DataFrame:
    """(id, component) — component = min node id reachable from id.
    Nodes absent from every edge form singleton components. Edge
    endpoints absent from ``nodes`` are ignored entirely — they carry
    no label, relay nothing, and never appear in the output (ADVICE
    r6: the single-shuffle rewrite briefly let such phantom endpoints
    leak into the result with a first-round NULL label; the
    membership filter below restores the original drop contract).

    Small-graph fast path (r7, the x2_semantic_dedup_keep budget):
    dedup edge sets are usually a vanishing fraction of the corpus —
    500-node fixtures produce a few hundred edges, and even a corpus
    with millions of duplicate pairs yields an edge list of 8-byte id
    pairs. When the (membership-filtered) edge count is ≤
    ``max_collect_edges`` the closure runs as driver-side union-find
    on ONE bounded collect (≤ ~1.6 MB at the default cap) and the
    result joins back as a broadcast map — replacing diameter-many
    shuffle rounds with one tiny join. The edge count probe is a
    driver action of the same kind as the loop's convergence count.
    Set ``max_collect_edges=0`` to force the iterative path (the
    100 TB form: everything stays distributed, one shuffle per round).
    Both paths share the membership contract: edges touching ids
    outside ``nodes`` are dropped before the closure, so they never
    relay (pytest-gated on both paths).

    Raises after ``max_iters`` non-converged rounds rather than
    returning silently-wrong partial labels.

    Id contract: the component label is the minimum reachable id AS A
    BIGINT, so ids must cast to long. Nodes whose id does not
    (try_cast → NULL) are DROPPED from the output, and edges touching
    a NULL/uncastable endpoint are dropped before the closure — on
    BOTH paths, independent of spark.sql.ansi.enabled (try_cast
    everywhere; a review found the fast path silently dropping what
    the iterative path would ANSI-abort on).
    """
    if max_collect_edges:
        e_raw = edges.select(
            F.col(src_col).try_cast("long").alias("_u"),
            F.col(dst_col).try_cast("long").alias("_v"),
        ).persist()
        try:
            if e_raw.count() <= max_collect_edges:
                # Drop edges with a NULL endpoint (source NULL, or an id
                # the long cast nulled out). The iterative path below
                # drops them implicitly — a NULL _v never matches the
                # label join — so the fast path must match; before this
                # filter one NULL endpoint raised TypeError in the
                # sorted() below and in _unionfind_components' min()
                # (ADVICE r7 medium: default-path crash on a public
                # operator).
                pairs = [
                    (r._u, r._v)
                    for r in e_raw.collect()
                    if r._u is not None and r._v is not None
                ]
                spark = nodes.sparkSession
                # membership WITHOUT shuffling nodes: broadcast the
                # (small) endpoint set into one semi-join scan of the
                # node frame; only matching ids come back.
                endpoints = sorted({x for uv in pairs for x in uv})
                out_ids = nodes.select(
                    F.col(id_col).try_cast("long").alias("_id")
                )
                if endpoints:
                    epdf = spark.createDataFrame(
                        [(x,) for x in endpoints], "_id LONG"
                    )
                    present = {
                        r._id
                        for r in out_ids.join(
                            F.broadcast(epdf), "_id", "left_semi"
                        ).collect()
                    }
                    pairs = [
                        (u, v)
                        for u, v in pairs
                        if u in present and v in present
                    ]
                mapping = _unionfind_components(pairs)
                if mapping:
                    mdf = spark.createDataFrame(
                        list(mapping.items()), "_mid LONG, _mcomp LONG"
                    )
                    return (
                        nodes.select(F.col(id_col))
                        .join(
                            F.broadcast(mdf),
                            F.col(id_col).try_cast("long") == F.col("_mid"),
                            "left",
                        )
                        .select(
                            F.col(id_col),
                            F.coalesce(
                                F.col("_mcomp"),
                                F.col(id_col).try_cast("long"),
                            ).alias("component"),
                        )
                        .where(F.col("component").isNotNull())
                    )
                return nodes.select(
                    F.col(id_col),
                    F.col(id_col).try_cast("long").alias("component"),
                ).where(F.col("component").isNotNull())
        finally:
            e_raw.unpersist()

    # Iterative rounds mean many small shuffles; AQE coalescing
    # right-sizes them. AQE is on by default since Spark 3.2 and set
    # explicitly in get_spark(); we do NOT flip it on a session we
    # don't own — a caller who disabled it keeps it disabled (the loop
    # is correct either way, just more small tasks without AQE).
    sym = (
        edges.select(F.col(src_col).alias("_u"), F.col(dst_col).alias("_v"))
        .unionByName(
            edges.select(F.col(dst_col).alias("_u"), F.col(src_col).alias("_v"))
        )
        .distinct()
        .persist()
    )
    labels = nodes.select(
        F.col(id_col).alias("_u"),
        F.col(id_col).try_cast("long").alias("_lbl"),
    ).localCheckpoint(eager=True)

    try:
        for _ in range(max_iters):
            # neighbor labels: edge (u,v) proposes v's current label to
            # u. The node's OWN label rides through the SAME aggregation
            # under a self flag (min over the self rows = the old label,
            # exactly one per node), so old-vs-new needs no join-back —
            # one shuffle per round instead of two (r6: the extra
            # labels ⋈ proposed join was ~half of each round's cost).
            proposed = (
                sym.join(labels.withColumnRenamed("_u", "_v"), "_v")
                .select("_u", "_lbl", F.lit(False).alias("_self"))
                .unionByName(labels.withColumn("_self", F.lit(True)))
                .groupBy("_u")
                .agg(
                    F.min("_lbl").alias("_new"),
                    F.min(F.when(F.col("_self"), F.col("_lbl"))).alias("_lbl"),
                )
            )
            # Membership filter: a node is in the label set iff it has
            # a self row (its old label under the _self flag). Edge
            # endpoints outside `nodes` have only neighbor-proposal
            # rows → NULL _lbl → dropped, so they neither gain a label
            # nor relay one (pre-r6 semantics).
            #
            # eager=False: the convergence count below is the action
            # that materializes the checkpoint — one Spark job per
            # round instead of two (checkpoint job + count job). At
            # driver SF each round is overhead-bound, so this halves
            # the closure's wall (r7: x2_semantic_dedup_keep budget).
            merged = proposed.filter(F.col("_lbl").isNotNull()).localCheckpoint(
                eager=False
            )
            changed = merged.filter(F.col("_new") < F.col("_lbl")).count()
            labels = merged.select("_u", F.col("_new").alias("_lbl"))
            if changed == 0:
                return labels.select(
                    F.col("_u").alias(id_col), F.col("_lbl").alias("component")
                )
    finally:
        sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(diameter larger than max_iters?)"
    )


def dedup_keep_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Transitive dedup: keep exactly one row (the min-id member) per
    connected component of the near-dup pair graph. The full-row frame
    only participates in the final semi-join — components are computed
    on (id, id) pairs alone."""
    comp = connected_components(df.select(id_col), pairs, id_col, src_col, dst_col)
    keep = comp.filter(F.col(id_col) == F.col("component")).select(id_col)
    return df.join(keep, id_col, "left_semi")


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    damping: float = 0.85,
    n_iters: int = 10,
) -> DataFrame:
    """(id, rank) after ``n_iters`` power iterations — importance
    weighting over a link/similarity graph (e.g. rank documents inside
    near-dup clusters by connectivity before choosing representatives).

    Classic formulation with dangling-mass redistribution: each round
    every node sends rank/out_degree along its out-edges; nodes with no
    out-edges spread their rank uniformly; then
    ``rank' = (1-d)/N + d·(received + dangling/N)``. Total rank stays
    1.0 every round (asserted in tests).

    Scale shape per round: ONE shuffle — the (dst, contribution)
    groupBy; the rank-weighted edge join shuffles only (node, rank)
    pairs against the pre-partitioned edge list; the dangling mass is a
    1-row aggregate broadcast back via cross join. Fixed iteration
    count keeps the loop free of per-round driver probes (unlike
    connected_components, where convergence IS the contract);
    localCheckpoint truncates lineage each round.
    """
    # AQE left to the session owner (see connected_components note).
    ids = nodes.select(F.col(id_col).alias("_u")).distinct()
    n = ids.count()
    if n == 0:
        raise ValueError("pagerank needs a non-empty node set")
    ed = (
        edges.select(F.col(src_col).alias("_u"), F.col(dst_col).alias("_v"))
        .distinct()
        .persist()
    )
    deg = ed.groupBy("_u").agg(F.count(F.lit(1)).alias("_deg"))
    # out-degree stapled to the node list once; 0 marks dangling
    base = ids.join(deg, "_u", "left").select(
        "_u", F.coalesce("_deg", F.lit(0)).alias("_deg")
    ).localCheckpoint(eager=True)

    ranks = base.select("_u", "_deg", F.lit(1.0 / n).alias("_r"))
    try:
        for _ in range(n_iters):
            dangling = (
                ranks.filter(F.col("_deg") == 0)
                .agg(F.coalesce(F.sum("_r"), F.lit(0.0)).alias("_dm"))
            )
            recv = (
                ed.join(ranks.filter(F.col("_deg") > 0), "_u")
                .select(F.col("_v").alias("_u"), (F.col("_r") / F.col("_deg")).alias("_c"))
                .groupBy("_u")
                .agg(F.sum("_c").alias("_recv"))
            )
            ranks = (
                base.join(recv, "_u", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "_u",
                    "_deg",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (F.coalesce("_recv", F.lit(0.0)) + F.col("_dm") / n)
                    ).alias("_r"),
                )
                .localCheckpoint(eager=True)
            )
        return ranks.select(F.col("_u").alias(id_col), F.col("_r").alias("rank"))
    finally:
        ed.unpersist()

"""Iterative graph operators over edge DataFrames (driver-looped Spark jobs).

Two crawl/corpus-relevant algorithms, both expressed as converging sequences
of joins/aggregations (no GraphX — DataFrame-only, checkpoint-friendly):

- :func:`connected_components` — min-label propagation to a fixpoint. Used to
  turn near-duplicate PAIRS (minhash/simhash/embedding tiers) into duplicate
  CLUSTERS so dedup keeps exactly one representative per transitive group
  (the pair-rule alone under-deletes chains a-b-c).
- :func:`pagerank` — power iteration over the outlink graph; feeds the
  frontier's ``priority`` column so the politeness queue crawls important
  pages first (reference priority is a static seed-list order; this is the
  scale upgrade).

Scale notes: each iteration is one shuffle on the edge key; intermediates are
persisted and the lineage is cut every ``checkpoint_every`` iterations via
localCheckpoint (iterative plans otherwise grow unboundedly and re-execute).
Convergence is data-dependent: components needs O(diameter) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    Input: undirected edge list. Isolated nodes absent from `pairs` are
    trivially their own component (callers union them in if needed).

    Convergence needs O(graph diameter) iterations (one hop per pass); hitting
    ``max_iter`` without converging raises rather than silently returning
    split components.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    cached_prev = None  # handle to the EXACT persisted object (unpersist on a
    # derived projection is a no-op — Spark matches cache entries by plan)
    converged = False
    for i in range(max_iter):
        # candidate label per node = min(own, min over neighbors' labels)
        neighbor = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
            .withColumnRenamed("src", "node")
        )
        updated = (
            labels.join(neighbor, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("n_comp", F.col("component"))).alias("component"),
                (F.coalesce("n_comp", F.col("component")) < F.col("component")).alias("_chg"),
            )
        ).persist()
        changed = updated.where("_chg").count()
        if cached_prev is not None:
            cached_prev.unpersist()
        cached_prev = updated
        labels = updated.drop("_chg")
        if (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=True)
            cached_prev.unpersist()
            cached_prev = None
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if cached_prev is not None:
        # pin the result before dropping its cached ancestor, or the returned
        # plan would re-run the whole since-checkpoint iteration chain
        labels = labels.localCheckpoint(eager=True)
        cached_prev.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(graph diameter exceeds max_iter) — raise max_iter"
        )
    return labels


def incremental_components(
    labels: DataFrame | None,
    new_pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Fold a NEW batch of duplicate pairs into existing (node, component)
    labels — the daily-increment shape of transitive dedup at corpus scale.

    The old cluster structure is already COMPRESSED in the labels (every node
    points at its min representative), so instead of re-running over all
    historical pairs, the merged components are exactly
    ``connected_components(label_edges ∪ new_pairs)``: label edges are star
    graphs (node → component) with the same connectivity as the full history.
    Work per increment is O(labels + new_pairs), independent of how many
    historical pair batches built the labels — proven equivalent to the full
    recompute in tests/test_asof_graph.py."""
    if labels is None:
        return connected_components(new_pairs, a_col, b_col, max_iter=max_iter)
    label_edges = labels.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(a_col), F.col("component").alias(b_col)
    )
    edges = label_edges.unionByName(
        new_pairs.select(F.col(a_col), F.col(b_col))
    )
    merged = connected_components(edges, a_col, b_col, max_iter=max_iter)
    # isolated previously-labeled nodes (their cluster had size 1) carry over
    singletons = labels.join(merged.select("node"), "node", "left_anti")
    return merged.unionByName(singletons)


def dedup_by_components(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Transitive near-dup dedup: keep the min-id representative per cluster."""
    comp = connected_components(pairs)
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 8,
    checkpoint_every: int = 4,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM 1999) — the third importance
    measure next to :func:`pagerank` (converged, damped) and :func:`opic`
    (online): a good HUB links to good authorities, a good AUTHORITY is
    linked from good hubs. L1 normalization each half-step (sum = 1) keeps
    the arithmetic SQL-reproducible (no sqrt). Per iteration: two
    edges-joins + two groupBys — same shuffle shape class as pagerank.

    Returns (node, hub, authority); nodes with no in-links have authority 0,
    no out-links → hub 0."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct().persist()
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return nodes.select("node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority"))
    hubs = nodes.withColumn("hub", F.lit(1.0 / n))
    auths = None
    cached = []
    for i in range(iterations):
        hubs = hubs.persist()
        cached.append(hubs)
        raw_auth = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a"))
        )
        total_a = raw_auth.agg(F.sum("a")).first()[0] or 1.0
        auths = nodes.join(raw_auth, "node", "left").select(
            "node", (F.coalesce("a", F.lit(0.0)) / total_a).alias("authority")
        ).persist()
        cached.append(auths)
        raw_hub = (
            e.join(auths.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("h"))
        )
        total_h = raw_hub.agg(F.sum("h")).first()[0] or 1.0
        hubs = nodes.join(raw_hub, "node", "left").select(
            "node", (F.coalesce("h", F.lit(0.0)) / total_h).alias("hub")
        )
        if (i + 1) % checkpoint_every == 0:
            hubs = hubs.localCheckpoint(eager=True)
            auths = auths.localCheckpoint(eager=True)
            for c in cached:
                c.unpersist()
            cached = []
    out = nodes.join(hubs, "node", "left").join(auths, "node", "left").select(
        "node",
        F.coalesce("hub", F.lit(0.0)).alias("hub"),
        F.coalesce("authority", F.lit(0.0)).alias("authority"),
    ).localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    e.unpersist()
    nodes.unpersist()
    return out


def reciprocity(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node link reciprocity — the classic link-farm signal (TrustRank /
    anti-spam literature: organic links are mostly one-way; quid-pro-quo
    link exchanges produce abnormally high reciprocal ratios).

    One self-join of the distinct edge set on the flipped key (both sides
    hash-partition on the same composite, no broadcast needed), then one
    groupBy: out_deg, reciprocal count, ratio. Self-loops excluded."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    back = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    marked = e.join(back, ["src", "dst"], "left_semi").select("src")
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    recip = marked.groupBy("src").agg(F.count("*").alias("reciprocal"))
    return (
        out_deg.join(recip, "src", "left")
        .select(
            F.col("src").alias("node"),
            F.col("out_deg").cast("long").alias("out_deg"),
            F.coalesce("reciprocal", F.lit(0)).cast("long").alias("reciprocal"),
            F.round(F.coalesce("reciprocal", F.lit(0)) / F.col("out_deg"), 6).alias(
                "reciprocity"
            ),
        )
    )


def opic(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 8,
    checkpoint_every: int = 4,
) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda & Cobena,
    WWW 2003): each node holds CASH; a visited node distributes its cash
    equally over its outlinks and banks the amount in its HISTORY; importance
    at any instant is (history + cash) / total — no convergence wait, no
    damping parameter, which is why crawlers use it for frontier priority.

    This is the batch "distribute-all" schedule (every node distributes every
    round — the paper's fairness condition is trivially met); dangling cash
    is re-injected uniformly, so total cash stays exactly 1 and history grows
    by 1 per round: importance normalizes by (rounds + 1).

    vs :func:`pagerank`: one edges-join + one groupBy per round (same shuffle
    shape), but the ESTIMATE is meaningful after every round — a crawl can
    blend it into priorities mid-flight, and an incremental deployment only
    re-distributes cash of nodes whose out-edges changed (O(churn)).

    Returns (node, cash, history, importance)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct().persist()
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return nodes.select(
            "node", F.lit(0.0).alias("cash"), F.lit(0.0).alias("history"), F.lit(0.0).alias("importance")
        )
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).persist()
    state = nodes.select("node", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("history"))
    cached_prev = None
    for r in range(rounds):
        state = state.persist()
        in_cash = (
            e.join(state.withColumnRenamed("node", "src"), "src")
            .join(out_deg, "src")
            .select("dst", (F.col("cash") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_cash"))
        )
        dangling = (
            state.join(out_deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("m"))
            .first()["m"]
        )
        if cached_prev is not None:
            cached_prev.unpersist()
        cached_prev = state
        state = (
            state.join(in_cash.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (F.coalesce("in_cash", F.lit(0.0)) + F.lit(dangling / n)).alias("cash"),
                (F.col("history") + F.col("cash")).alias("history"),
            )
        )
        if (r + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)
            cached_prev.unpersist()
            cached_prev = None
    state = state.localCheckpoint(eager=True)
    if cached_prev is not None:
        cached_prev.unpersist()
    e.unpersist()
    nodes.unpersist()
    out_deg.unpersist()
    return state.select(
        "node",
        "cash",
        "history",
        ((F.col("history") + F.col("cash")) / (rounds + 1)).alias("importance"),
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, rank) power iteration; dangling mass redistributed uniformly."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct().persist()
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct().persist()
    n = nodes.count()
    if n == 0:  # empty graph (e.g. round 1: seeds have no lineage yet)
        e.unpersist()
        nodes.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    cached_prev = None
    for i in range(iterations):
        # persist the CURRENT ranks: they feed three consumers per iteration
        # (contribs join, dangling action, next-iteration lineage) — without
        # this every dangling .first() re-runs the whole since-checkpoint chain
        ranks = ranks.persist()
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(out_deg, "src")
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        # dangling nodes (no outlinks) leak mass; conserve it uniformly
        dangling = (
            ranks.join(out_deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .first()["m"]
        )
        if cached_prev is not None:
            cached_prev.unpersist()
        cached_prev = ranks
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
            cached_prev.unpersist()
            cached_prev = None
    ranks = ranks.localCheckpoint(eager=True)
    if cached_prev is not None:
        cached_prev.unpersist()
    e.unpersist()
    nodes.unpersist()
    out_deg.unpersist()
    return ranks


def normalized_pagerank(link_log: DataFrame) -> DataFrame:
    """(url_hash, _prn) max-normalized pagerank of the discovered link graph
    (edges: src_url_hash → url_hash from discovery lineage). Cheap to
    consume more than once: :func:`pagerank` returns a localCheckpointed
    plan, so a second action (e.g. committing the scores as a table) never
    re-runs the iteration."""
    edges = link_log.where(F.col("src_url_hash").isNotNull()).select(
        F.col("src_url_hash").alias("src"), F.col("url_hash").alias("dst")
    )
    pr = pagerank(edges)
    mx = pr.agg(F.max("rank")).first()[0] or 1.0
    return pr.select(F.col("node").alias("url_hash"), (F.col("rank") / mx).alias("_prn"))


def blend_priority(frontier: DataFrame, pr_n: DataFrame, weight: float = 0.5) -> DataFrame:
    """Blend crawl priority with pre-normalized (url_hash, _prn) scores."""
    return (
        frontier.join(pr_n, "url_hash", "left")
        .withColumn(
            "priority",
            (1 - weight) * F.col("priority") + weight * F.coalesce("_prn", F.lit(0.0)),
        )
        .drop("_prn")
    )


def priority_from_pagerank(frontier: DataFrame, link_log: DataFrame, weight: float = 0.5) -> DataFrame:
    """Blend crawl priority with normalized pagerank of the discovered graph
    — :func:`normalized_pagerank` ∘ :func:`blend_priority`."""
    return blend_priority(frontier, normalized_pagerank(link_log), weight)

"""Connected components over the near-duplicate candidate graph (the
clustering step of E35: duplicate groups = components; keep the
smallest doc_id per component).

Algorithm: smallest-label propagation — every vertex starts with its
own id; each iteration every vertex takes the min of its own and its
neighbours' labels; converges in O(diameter) rounds. Implemented as a
driver loop of join+aggregate (each round: one shuffle on vertex id),
with convergence detected by a changed-labels count. This is the
standard Spark shape for iterative graph algorithms without GraphX
(public HashToMin / label-propagation literature).

Scale: near-dup components are tiny (dup clusters of 2-10 docs), so
diameter ≈ 2-3 and rounds stay few; each round's shuffle carries one
(id, label) pair per edge endpoint. ``persist`` + ``localCheckpoint``
truncate the lineage so plan depth stays constant across rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """edges (src, dst) → (doc_id, cluster) with cluster = min vertex id
    reachable in the component. Vertices = edge endpoints."""
    both = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct()
    # Pre-partition the edge frame by v ONCE (round 18, guide §2.4
    # "remove shuffles outright"): every loop round joins `both` on v,
    # and the cached InMemoryRelation preserves this partitioning, so
    # the edge side — the LARGE side, |edges| ≥ |vertices| — enters
    # each round's join without an exchange. One upfront shuffle buys
    # one saved edge-frame shuffle per round.
    both = both.repartition(F.col("v")).persist()

    # init folds the FIRST propagation round: label₀ = min(self, all
    # 1-hop neighbours) comes straight off a groupBy over `both` — no
    # join needed — so pair/star components (the common near-dup case)
    # confirm convergence after ONE loop round instead of two
    labels = (
        both.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select(
            F.col("u").alias("doc_id"),
            F.least(F.col("u"), F.col("_mn")).alias("label"),
        )
        .persist()
    )

    label_t = labels.schema["label"].dataType
    prev_cached = [labels]
    for it in range(max_iter):
        # ONE aggregate per round (round 18, VERDICT r17 #3 "aggregate
        # the join output once"): neighbour labels from the edge join
        # UNION the self rows, then a single groupBy(doc_id) computes
        # the new label (min over self ∪ neighbours — identical to the
        # old least(label, coalesce(nbr_label, label)) since every
        # vertex has a self row) AND carries the old label for the
        # convergence count (only the self row's `old` is non-null and
        # min ignores nulls). This replaces the old
        # [join → groupBy(u) → left-join-back-to-labels] shape: one
        # join + one exchange instead of two joins + two exchanges —
        # fewer shuffled bytes and fewer AQE stage jobs per round,
        # same labels.
        nbr = both.join(labels, both.v == labels.doc_id).select(
            F.col("u").alias("doc_id"),
            F.col("label"),
            F.lit(None).cast(label_t).alias("old"),
        )
        stepped = (
            labels.select(
                "doc_id", "label", F.col("label").alias("old")
            )
            .unionByName(nbr)
            .groupBy("doc_id")
            .agg(
                F.min("label").alias("label"),
                F.min("old").alias("old_label"),
            )
            .select("doc_id", "old_label", "label")
        )
        # Lineage truncation EVERY round, lazily (round 17): with
        # plain persist the round-N plan text embeds every prior
        # round's full lineage — label propagation references `labels`
        # twice per round (the join and the select), so the tree GROWS
        # EXPONENTIALLY in rounds (pipeline_e2e's captured sf0.1 plan:
        # 26 387 lines / 3007 Exchange nodes after two rounds; the
        # optimizer walks all of it on every action — guide §7.3
        # "planning time itself becomes the bottleneck"). A LAZY
        # localCheckpoint truncates lineage at the same cost point:
        # the changed-labels count below materializes the checkpoint
        # blocks as a side effect (no extra eager job — the reason
        # persist was preferred before), and every later reference
        # reads blocks with a leaf-sized plan.
        stepped = stepped.localCheckpoint(eager=False)
        changed = stepped.where(F.col("label") != F.col("old_label")).count()
        # the count above materialized `stepped`; the previous round's
        # caches are now dead weight (consumers of the select below hit
        # stepped's checkpoint blocks, not its lineage). Checkpoint
        # blocks themselves are freed by the ContextCleaner when the
        # RDD goes out of scope; unpersist here handles the persisted
        # init-round `labels` and is a no-op on checkpointed frames.
        for f in prev_cached:
            f.unpersist()
        prev_cached = [stepped]
        labels = stepped.select("doc_id", "label")
        if changed == 0:
            break
    both.unpersist()
    return labels.select("doc_id", F.col("label").alias("cluster"))

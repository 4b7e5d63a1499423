"""Connected components over near-duplicate pair graphs, and canonical
document selection per duplicate group.

Pairwise dedup output (ngram_jaccard_pairs / minhash_lsh_pairs /
embedding near-dups) is a *graph*: if A~B and B~C, then {A, B, C} is one
duplicate group even though (A, C) may never have been emitted as a
pair. Keeping "one doc per group" therefore needs connected components,
not pair filtering — dropping one side of every pair over-deletes
(A~B, B~C would drop B and C, leaving A; but dropping B twice is fine)
or under-deletes depending on orientation, and is order-dependent.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round, every node takes the minimum label among
itself and its neighbors; converged when no label changes. Rounds =
graph diameter — near-dup groups are dense clusters (diameter 1-2 via
their shared shingles/buckets), so this converges in 2-3 rounds in
practice; ``max_iter`` bounds pathological chains. Each round is one
equi-join (labels × edges) + one min-aggregation — both shuffle on node
id, both map-side-combinable; ``localCheckpoint`` truncates the lineage
so plan depth stays O(1) per round instead of O(rounds). Convergence is
checked with a LIMIT-1 count probe (no data collected to the driver).
For graphs whose diameter is itself large at 100 TB scale, the
two-phase large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) converges in O(log n)
rounds with the same per-round join+min shape; the driver loop below
accepts either round body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable (a deterministic,
    stable group id). Isolated nodes (absent from ``edges``) are not
    emitted — a node with no duplicate pair is its own trivial group.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.persist()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )

    changed = 1
    for _ in range(max_iter):
        nbr = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("comp")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    sym.unpersist()
    if changed != 0:
        # returning intermediate labels would split one duplicate group
        # into several — silent under-deletion downstream. Fail loudly.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (graph diameter exceeds it); raise max_iter or switch the "
            "round body to large-star/small-star"
        )
    return labels.select("node", F.col("comp").alias("component"))


def canonical_members(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    score_col: str = "score",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Resolve near-dup pairs into duplicate groups and elect one
    canonical document per group: highest ``score_col`` wins, ties break
    to the smallest id (deterministic). Returns one row per grouped
    document: (doc_id, component, canonical_id, is_canonical) — the
    keep/drop decision set for the dedup pass (`is_canonical = false`
    rows are the deletions). Scores join in by id (broadcast-sized:
    only grouped docs), election is a map-side `max_by` aggregation.
    """
    comp = connected_components(pairs, a_col, b_col)
    scored = comp.join(
        docs.select(F.col(id_col).alias("node"), F.col(score_col).alias("__s")),
        "node",
    )
    # min_by on (-score, node): max score, ties to the SMALLEST id —
    # negating the score (numeric by contract) instead of the id keeps
    # the election type-safe for string ids, where (-node) threw a
    # CAST_INVALID_INPUT under ANSI mode (r11 review, confirmed live)
    canon = scored.groupBy("component").agg(
        F.min_by(
            "node",
            F.struct((-F.col("__s")).alias("__negs"), F.col("node")),
        ).alias("canonical_id")
    )
    return (
        scored.join(canon, "component")
        .select(
            F.col("node").alias("doc_id"),
            "component",
            "canonical_id",
            (F.col("node") == F.col("canonical_id")).alias("is_canonical"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    damping: float = 0.85,
    iterations: int = 5,
    seeds: list | None = None,
) -> DataFrame:
    """PageRank over a directed edge list: ``(node, pr)`` for every node
    appearing as source or target, after a FIXED number of power
    iterations (Brin & Page 1998; fixed count rather than an epsilon
    test so any engine can replay the exact arithmetic — the kmeans
    convention in this repo).

    For a training-data pipeline this is the corpus-quality lever the
    published crawls use (e.g. harmonic/PageRank centrality to weight
    domains): rank a domain/source graph, then feed the scores into
    mixture weighting or corpus_select thresholds.

    Semantics per iteration (uniform teleport, dangling mass
    redistributed uniformly — the standard formulation):

        pr'(v) = (1-d)/N + d * (sum_{u->v} pr(u)/outdeg(u) + D/N)

    where D = total pr mass on dangling nodes (outdeg 0).

    Scale shape: each iteration is one equi-join (ranks x edges on the
    source) + one map-side-combinable sum keyed by target — the same
    join+agg skeleton as connected_components, shuffling edge-count
    rows; the dangling term is a 1-row aggregate collected per
    iteration (O(iterations) driver scalars, like kmeans' K centroid
    rows). ``localCheckpoint`` per iteration keeps plan depth O(1).
    Rank state is O(|V|) rows, never collected.

    ``seeds``: PERSONALIZED PageRank (Haveliwala 2002) — teleport and
    dangling mass restart uniformly over the seed set instead of all
    nodes, ranking the graph by proximity to the seeds. The
    training-data use: expand a trusted domain/source list by
    centrality relative to it. Seeds fold into the plan as an ``isin``
    literal predicate (seed lists are small by construction).
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    outdeg = (
        edges.groupBy(F.col(src).alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .persist()
    )
    # (src, dst, outdeg) resolved once; reused every iteration
    ed = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .join(outdeg.select(F.col("node").alias("u"), "outdeg"), "u")
        .persist()
    )
    if seeds is not None:
        if not seeds:
            raise ValueError("seeds must be non-empty when given")
        uniq = sorted(set(seeds))  # duplicates would mis-scale 1/len
        present = nodes.where(F.col("node").isin(uniq)).count()
        if present < len(uniq):
            # an absent seed silently zeroes part of the teleport
            # distribution; if NONE match, total rank mass decays by
            # ~damping^iterations with meaningless relative order
            # (r11 review) — validate up front, one tiny job
            raise ValueError(
                f"{len(uniq) - present} of {len(uniq)} seeds do not "
                f"appear in the graph — personalized PageRank needs "
                f"every seed to be a node (teleport mass would leak)"
            )
        s_mass = F.when(
            F.col("node").isin(uniq), F.lit(1.0 / len(uniq))
        ).otherwise(F.lit(0.0))
    else:
        s_mass = F.lit(1.0 / n)
    ranks = nodes.select("node", s_mass.alias("pr")).localCheckpoint(eager=True)
    for _ in range(iterations):
        dangling = (
            ranks.join(outdeg, "node", "left_anti").agg(F.sum("pr")).collect()[0][0]
        ) or 0.0
        contrib = (
            ed.join(ranks.select(F.col("node").alias("u"), "pr"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * s_mass
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.lit(dangling) * s_mass
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    nodes.unpersist()
    outdeg.unpersist()
    ed.unpersist()
    return ranks

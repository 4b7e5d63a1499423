"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set against the full corpus; per-query ranking via window. One scan of
  the corpus, no corpus shuffle except the top-k aggregation. This is
  the correctness baseline and the right plan whenever |queries| is
  small (the broadcast side) regardless of corpus size.
* ``lsh_bucketed_topk`` — the scale path: sign-bit LSH blocking prunes
  the corpus per query before exact scoring. Approximate (a true
  neighbor in another bucket is missed) — used when brute force's
  |Q|x|C| score matrix is too large.

Scores are computed with built-in array ops in double precision (no
Python UDFs); rounding to 6 decimals makes cross-engine comparison
stable without materially affecting ranking.

Norms are precomputed once per vector before any pairwise stage:
higher-order array expressions (``aggregate``/``zip_with``) do not
participate in whole-stage codegen, so a norm evaluated inside the
pairwise cosine costs O(dim) interpreted work per PAIR; hoisting it to
the per-row projections leaves only the dot product in the pair loop —
identical floating-point results (same operations, same order), ~3x
less array math on the |Q|x|C| stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.functions.vectors import dot, norm, sign_bits_bucket


def _paired_cosine(a_vec, a_norm, b_vec, b_norm):
    return F.round(dot(a_vec, b_vec) / (a_norm * b_norm), 6)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    backend: str = "arrow",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``backend="arrow"`` (default, r14) scores each Arrow batch of the
    corpus against the collected query matrix with one NumPy GEMM and
    keeps only the batch-local top-k per query before the final ranking
    window — the guide-§4.2 shape. Rounded-6 scores are bitwise-equal
    to the built-in fold (kernel-module contract) and the batch-local
    prune uses the window's own total order (sim desc, id asc), so
    results are identical; the exchange into the window shrinks from
    |C| x |Q| rows to O(batches x |Q| x k). ``backend="builtin"`` keeps
    the pure-JVM crossJoin formulation (no Python workers; the fallback
    for clusters without them, measured ~4x slower at sf0.1 — the
    higher-order dot is interpreted per pair)."""
    if backend == "arrow":
        from implementing_scds_in_hive_spark.operators.vector_kernels import (
            score_against_queries,
        )

        scored = score_against_queries(
            corpus,
            queries,
            id_col=id_col,
            vec_col=vec_col,
            query_id_col=query_id_col,
            prune_k=k,
        )
    else:
        q = F.broadcast(
            queries.select(
                F.col(query_id_col),
                F.col(vec_col).alias("__qvec"),
                norm(F.col(vec_col)).alias("__qn"),
            )
        )
        c = corpus.select(F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__cn"))
        scored = c.crossJoin(q).select(
            query_id_col,
            id_col,
            _paired_cosine(F.col("__qvec"), F.col("__qn"), F.col(vec_col), F.col("__cn")).alias(
                "cos_sim"
            ),
        )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    backend: str = "arrow",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-bit
    bucket, then scored exactly. Equi-join on the bucket key replaces the
    cross join — the corpus shuffles once on bucket, queries broadcast.

    ``backend="arrow"`` (default, r14): the collected query set is
    grouped by bucket and each corpus Arrow batch GEMM-scores only the
    queries sharing its rows' buckets (the probed-list kernel with the
    bucket as the list key) — the bucket join and per-pair interpreted
    folds collapse into the scan-side pass; with batch-local top-k the
    ranking window reads O(batches x |Q| x k) rows. The corpus never
    shuffles at all."""
    if backend == "arrow":
        from implementing_scds_in_hive_spark.operators.vector_kernels import (
            score_probed_lists,
        )

        q_fields = {f.name: f for f in queries.schema.fields}
        q_rows = queries.select(
            query_id_col,
            F.col(vec_col),
            sign_bits_bucket(F.col(vec_col), n_bits).alias("__bucket"),
        ).collect()
        q_rows.sort(key=lambda r: r[0])
        c = corpus.select(
            F.col(id_col),
            F.col(vec_col),
            sign_bits_bucket(F.col(vec_col), n_bits).alias("__bucket"),
        )
        scored = score_probed_lists(
            c,
            [(r[0], r[2], r[1]) for r in q_rows],
            id_col=id_col,
            vec_col=vec_col,
            centroid_id_col="__bucket",
            query_id_col=query_id_col,
            query_id_type=q_fields[query_id_col].dataType,
            prune_k=k,
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("cos_sim").desc(), F.col(id_col)
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "cos_sim", "rank")
        )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("__cn"),
        sign_bits_bucket(F.col(vec_col), n_bits).alias("__bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            norm(F.col(vec_col)).alias("__qn"),
            sign_bits_bucket(F.col(vec_col), n_bits).alias("__bucket"),
        )
    )
    scored = c.join(q, "__bucket").select(
        query_id_col,
        id_col,
        _paired_cosine(F.col("__qvec"), F.col("__qn"), F.col(vec_col), F.col("__cn")).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    backend: str = "arrow",
) -> DataFrame:
    """IVF index build: assign every corpus vector to its nearest
    centroid (cosine; deterministic tie-break on lowest centroid id).

    ``backend="arrow"`` (default, r14): a map-only pass — each Arrow
    batch is scored against the collected centroid matrix with one
    NumPy GEMM and argmax'd row-wise (ties -> lowest centroid id, same
    as the built-in max_by tie struct). ZERO exchanges: even the
    built-in path's single aggregation exchange disappears, and the
    interpreted per-pair dot fold (K x dim lambda invocations per
    vector) becomes BLAS. Rounded-6 scores are bitwise-equal to the
    fold (kernel-module contract), so assignments are identical.

    ``backend="builtin"`` keeps the JVM formulation: centroids
    broadcast (they are small by construction); the corpus streams
    through the scoring join once, and the per-vector argmax is a
    ``max_by`` AGGREGATION, not a window: partial aggregation collapses
    each vector's K scored rows to one map-side (they are all in the
    vector's own partition — the broadcast cross join never moves the
    corpus), so the exchange carries each vector ONCE. The earlier
    row_number-window formulation shuffled K copies of every embedding —
    a K× blowup that a 100 TB corpus with thousands of centroids cannot
    afford. At scale a production system would iterate k-means here,
    which is just this assignment + a centroid-mean aggregation per
    round.
    """
    if backend == "arrow":
        from implementing_scds_in_hive_spark.operators.vector_kernels import (
            assign_nearest,
        )

        return assign_nearest(
            corpus,
            centroids,
            id_col=id_col,
            vec_col=vec_col,
            centroid_id_col=centroid_id_col,
        )
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col),
            F.col(vec_col).alias("__cvec"),
            norm(F.col(vec_col)).alias("__cvn"),
        )
    )
    e = corpus.select(F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__en"))
    scored = e.crossJoin(c).select(
        id_col,
        vec_col,
        centroid_id_col,
        _paired_cosine(F.col("__cvec"), F.col("__cvn"), F.col(vec_col), F.col("__en")).alias(
            "__sim"
        ),
    )
    # argmax by (sim desc, centroid_id asc): max_by over a struct whose
    # lexicographic max is highest sim, then lowest id (negated). Group
    # on the scalar id ONLY — an array grouping key forces a
    # SortAggregate that compares full embeddings; the vector rides
    # along as first() (identical across a vector's K scored rows).
    return (
        scored.groupBy(id_col)
        .agg(
            F.first(vec_col).alias(vec_col),
            F.max_by(
                F.col(centroid_id_col),
                F.struct(
                    F.col("__sim").alias("s"),
                    (-F.col(centroid_id_col)).alias("negc"),
                ),
            ).alias(centroid_id_col),
        )
        .select(id_col, vec_col, centroid_id_col)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
    probe_prune: bool = False,
    backend: str = "arrow",
) -> DataFrame:
    """IVF-probed approximate top-k: each query scores only the corpus
    vectors assigned to its ``nprobe`` nearest centroids.

    ``backend="arrow"`` (default, r14): queries and centroids — both
    small by contract (they broadcast/collect in every formulation) —
    are collected once and the query-to-centroid probe ranking runs on
    the driver in NumPy (identical rounded-6 scores and (sim desc, cid
    asc) tie order, so the identical probe set); the corpus-side
    scoring batches through one GEMM per (Arrow batch, probed list)
    with batch-local top-k pruning. Two whole stages disappear: the
    query-ranking window job and the broadcast probe join; with
    ``probe_prune`` the extra probe-collect job is free because the
    probe set is already on the driver. ``backend="builtin"`` keeps the
    pure-JVM path described below.

    The |Q| x |C| cross join of brute force becomes (a) a tiny
    query-centroid ranking, then (b) an equi-join on centroid id against
    the assignment table — the corpus shuffles once on centroid id (or
    not at all if the index is pre-bucketed by centroid on disk, the
    physical layout an IVF index file encodes). Recall loss is confined
    to neighbors whose centroid the probe misses — the standard IVF
    trade; raise ``nprobe`` to trade compute back for recall.

    If ``corpus`` already carries ``centroid_id_col`` (built once with
    :func:`ivf_assign` and persisted/written bucketed-by-centroid), the
    assignment step is skipped — the amortized index-probe path every
    repeated-query workload should use. Passing a raw corpus assigns on
    the fly (convenient for one-shot use; the build then dominates for
    small |Q|, measured in PLANS.md r4).

    ``probe_prune=True`` additionally collects the probed centroid-id
    set (tiny: ≤ |Q| x nprobe values) and applies it as a LITERAL filter
    on the assignment before the join. Against an index saved bucketed
    by centroid id (``operators/index_store.py``) Spark turns that into
    bucket pruning — the scan reads ONLY the probed inverted lists
    (``SelectedBucketsCount`` in the plan), which is what makes an IVF
    probe sub-linear in corpus size on disk, not just in compute. Costs
    one extra tiny job to rank the probes; only worthwhile on a
    pre-assigned (ideally stored) corpus AND when ``|Q| * nprobe`` is
    well under ``|centroids|`` — a query batch that probes most lists
    anyway pays the extra job for a scan that skips almost nothing
    (measured at sf0.1: 20 queries x 2 probes over 50 lists = 80%
    probed; the no-prune single-job plan wins there, bench.py reports
    both)."""
    if backend == "arrow":
        import numpy as np

        from implementing_scds_in_hive_spark.operators.vector_kernels import (
            collect_vectors,
            round_half_up,
            score_probed_lists,
        )

        cids, cm, cnorms, _, _ = collect_vectors(
            centroids, centroid_id_col, vec_col
        )
        q_fields = {f.name: f for f in queries.schema.fields}
        q_rows = queries.select(query_id_col, vec_col).collect()
        q_rows.sort(key=lambda r: r[0])
        probes = []
        for r in q_rows:
            qv = np.asarray(r[1], dtype=np.float64)
            qn = np.sqrt((qv * qv).sum())
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = round_half_up(np.matmul(cm, qv) / (cnorms * qn))
            for j in np.lexsort((cids, -sims))[:nprobe]:
                probes.append((r[0], int(cids[j]), r[1]))
        if centroid_id_col in corpus.columns:
            # stored/pre-assigned index: one scoring pass; probe_prune
            # applies the literal list filter (bucket pruning on a
            # bucketed-by-centroid store) — now FREE of its extra
            # ranking job, the probe set is already on the driver
            assigned = corpus
            if probe_prune:
                probed_ids = sorted({p[1] for p in probes})
                assigned = assigned.where(
                    F.col(centroid_id_col).isin(probed_ids)
                )
            fused = None
        else:
            # raw corpus: fuse assignment + scoring into ONE pass so the
            # embeddings cross the Python boundary once, not out of an
            # assignment stage and back into a scoring stage
            assigned = corpus
            fused = (cids, cm)
        scored = score_probed_lists(
            assigned,
            probes,
            id_col=id_col,
            vec_col=vec_col,
            centroid_id_col=centroid_id_col,
            query_id_col=query_id_col,
            query_id_type=q_fields[query_id_col].dataType,
            prune_k=k,
            assign_centroids=fused,
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("cos_sim").desc(), F.col(id_col)
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "cos_sim", "rank")
        )
    if centroid_id_col in corpus.columns:
        assigned = corpus
    else:
        assigned = ivf_assign(
            corpus,
            centroids,
            id_col=id_col,
            vec_col=vec_col,
            centroid_id_col=centroid_id_col,
            backend=backend,
        )
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col),
            F.col(vec_col).alias("__cvec"),
            norm(F.col(vec_col)).alias("__cvn"),
        )
    )
    q_scored = (
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            norm(F.col(vec_col)).alias("__qn"),
        )
        .crossJoin(c)
        .select(
            query_id_col,
            "__qvec",
            "__qn",
            centroid_id_col,
            _paired_cosine(F.col("__cvec"), F.col("__cvn"), F.col("__qvec"), F.col("__qn")).alias(
                "__sim"
            ),
        )
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("__sim").desc(), F.col(centroid_id_col))
    probes = (
        q_scored.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= nprobe)
        .select(query_id_col, "__qvec", "__qn", centroid_id_col)
    )
    if probe_prune:
        # One collect serves BOTH needs: the literal bucket-prune filter
        # AND the probe side of the join. Re-injecting the collected rows
        # as a local relation means the query-centroid ranking executes
        # exactly once (lazily, `probes` would be recomputed by the join
        # after the prune collect — a whole duplicate job). The set is
        # tiny by contract: ≤ |Q| x nprobe rows of (qvec, centroid_id).
        probe_rows = probes.collect()
        probed_ids = sorted({r[centroid_id_col] for r in probe_rows})
        assigned = assigned.where(F.col(centroid_id_col).isin(probed_ids))
        probes = queries.sparkSession.createDataFrame(probe_rows, probes.schema)
    assigned_n = assigned.withColumn("__en", norm(F.col(vec_col)))
    scored = assigned_n.join(F.broadcast(probes), centroid_id_col).select(
        query_id_col,
        id_col,
        _paired_cosine(F.col("__qvec"), F.col("__qn"), F.col(vec_col), F.col("__en")).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def kmeans_refine(
    corpus: DataFrame,
    init_centroids: DataFrame,
    *,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    exact_mean: bool = False,
    mean_backend: str | None = None,
) -> DataFrame:
    """Lloyd's k-means refinement of IVF centroids — the iterative
    algorithm face of the engine.

    Per iteration: one assignment pass (ivf_assign — the r14 arrow
    default makes it a map-only batch-GEMM pass; corpus streams once
    either way) + one element-wise mean. Centroids are collected to
    the driver between iterations: they are small by construction
    (K rows), and re-creating the DataFrame truncates the lineage so the
    plan does not nest across iterations — the standard Spark pattern
    for iterative refinement of a small model against big data.

    ``exact_mean=True`` computes each per-dimension mean as an exact
    DECIMAL sum followed by ONE IEEE division instead of a float
    ``avg`` — bit-identical regardless of partitioning or summation
    order, which makes the whole refinement (assignment is already
    deterministic) replayable row-for-row by the chained-CTE DuckDB
    oracle (KMEANS_SQL). The default float path is marginally cheaper
    and fine when centroids only feed an approximate index.

    ``mean_backend`` (r15): with ``exact_mean``, the default
    ``"arrow"`` fuses assignment AND the exact mean into ONE map-only
    Arrow pass per iteration (vector_kernels.assign_mean_partials):
    each task emits per-centroid integer decimal(·,10) partial sums —
    associative, so the driver-side merge is bit-identical to the
    posexplode → decimal-sum aggregation — and the iteration's
    posexplode exchange plus its second Python crossing disappear.
    ``"builtin"`` keeps the posexplode → (centroid, dim) partial-agg
    JVM plan. The FLOAT mean path always stays builtin: float partial
    sums are partition-order-defined, so an Arrow re-summation could
    legitimately differ in the last ulp — not worth destabilizing
    fixtures for a stage the r14 audit measured as tiny.
    """
    spark = corpus.sparkSession
    cent = init_centroids.select(F.col(centroid_id_col), F.col(vec_col))
    dim_type = dict(corpus.dtypes)[vec_col]
    if mean_backend is None:
        mean_backend = "arrow" if exact_mean else "builtin"
    if exact_mean and mean_backend == "arrow":
        from fractions import Fraction

        import numpy as np

        from implementing_scds_in_hive_spark.operators.vector_kernels import (
            assign_mean_partials,
        )

        cid_type = dict(init_centroids.dtypes)[centroid_id_col]
        schema = f"`{centroid_id_col}` {cid_type}, `{vec_col}` {dim_type}"
        narrow = dim_type == "array<float>"
        for _ in range(n_iter):
            acc: dict = {}
            for r in assign_mean_partials(
                corpus,
                cent,
                id_col=id_col,
                vec_col=vec_col,
                centroid_id_col=centroid_id_col,
            ).collect():
                got = acc.setdefault(r[0], [[0] * len(r[1]), 0])
                got[0] = [a + int(s) for a, s in zip(got[0], r[1])]
                got[1] += r[2]
            data = []
            for cid in sorted(acc):
                sums, cnt = acc[cid]
                # cast(sum_decimal as double): correctly rounded (both
                # BigDecimal.doubleValue and Fraction.__float__), then
                # ONE IEEE divide — the builtin expression's exact ops
                vec = [float(Fraction(s, 10**10)) / cnt for s in sums]
                if narrow:
                    vec = [float(np.float32(v)) for v in vec]
                data.append((cid, vec))
            # empty-cluster repair: carry the previous centroid forward
            # (same rationale as the builtin branch below)
            data += [
                (r[centroid_id_col], r[vec_col])
                for r in cent.collect()
                if r[centroid_id_col] not in acc
            ]
            cent = spark.createDataFrame(data, schema)
        return cent
    if exact_mean:
        mean_expr = (
            F.sum(F.col("__x").cast("decimal(27,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__m")
    else:
        mean_expr = F.avg("__x").alias("__m")
    for _ in range(n_iter):
        assigned = ivf_assign(
            corpus, cent, id_col=id_col, vec_col=vec_col, centroid_id_col=centroid_id_col
        )
        means = (
            assigned.select(centroid_id_col, F.posexplode(vec_col).alias("__pos", "__x"))
            .groupBy(centroid_id_col, "__pos")
            .agg(mean_expr)
            .groupBy(centroid_id_col)
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__m"))
                ).alias("__pm")
            )
            .select(
                centroid_id_col,
                F.transform("__pm", lambda s: s["__m"]).cast(dim_type).alias(vec_col),
            )
        )
        rows = means.collect()
        # an empty cluster (a centroid winning argmax for zero vectors)
        # produces NO row in the means aggregation — silently shrinking
        # K across iterations, so downstream IVF probes would face a
        # different geometry than requested (r11 review). Standard
        # Lloyd repair: carry the previous centroid forward unchanged.
        have = {r[centroid_id_col] for r in rows}
        data = [(r[centroid_id_col], r[vec_col]) for r in rows] + [
            (r[centroid_id_col], r[vec_col])
            for r in cent.collect()
            if r[centroid_id_col] not in have
        ]
        cent = spark.createDataFrame(data, means.schema)
    return cent


def embedding_near_duplicates(
    corpus: DataFrame,
    *,
    threshold: float = 0.95,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "arrow",
) -> DataFrame:
    """Near-duplicate embedding pairs (cosine >= threshold) with sign-bit
    LSH blocking: only pairs in the same bucket are scored.

    ``backend="arrow"`` (default, r14): one grouped GEMM per bucket
    (the SemDeDup pair kernel with the bucket as the group key) — one
    shuffle instead of a self-join's two."""
    if backend == "arrow":
        from implementing_scds_in_hive_spark.operators.vector_kernels import (
            pairs_within_groups,
        )

        b = corpus.select(
            F.col(id_col),
            F.col(vec_col),
            sign_bits_bucket(F.col(vec_col), n_bits).alias("__bucket"),
        )
        return pairs_within_groups(
            b,
            group_col="__bucket",
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
        )
    b = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("__n"),
        sign_bits_bucket(F.col(vec_col), n_bits).alias("__bucket"),
    )
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            _paired_cosine(
                F.col(f"a.{vec_col}"), F.col("a.__n"), F.col(f"b.{vec_col}"), F.col("b.__n")
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def knn_join(
    corpus: DataFrame,
    *,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "arrow",
) -> DataFrame:
    """Approximate K-nearest-neighbor SELF-join: for EVERY corpus vector,
    its top-k cosine neighbors among vectors sharing its sign-bit bucket
    — ``(vec_id, neighbor_id, cos_sim, rank)``.

    This is the all-rows face of similarity search (deduplication
    clustering, recommendation candidate generation, hard-negative
    mining), distinct from :func:`cosine_topk`'s few-queries face: the
    |C|^2 score matrix is never formed. Blocking makes it one
    bucket-keyed self-join — each side shuffles once on the bucket key —
    and the per-vector top-k is a window over that vector's own bucket
    only. Rows in singleton buckets yield no output (no neighbors
    sampled) — callers wanting guaranteed output per row should lower
    ``n_bits`` (fewer, larger buckets) or use :func:`knn_join_ivf`,
    whose k-means cells track the data distribution instead of fixed
    hyperplanes. Deterministic end to end (sign-bit blocking + tie-break
    on neighbor id) — the DuckDB oracle replays it exactly.

    Skew note: a bucket holding B vectors costs B^2 scored pairs; sign
    bits split real embedding distributions unevenly, so at scale prefer
    ``knn_join_ivf`` (balanced cells by construction of k-means) — same
    output shape, same join geometry.

    ``backend="arrow"`` (default, r14): one grouped Arrow pass per
    bucket — a single GEMM scores the whole BxB block and the top-k
    extraction runs in the same task under the identical (sim desc,
    neighbor id asc) total order, so the vectors shuffle ONCE (the
    group-by) instead of twice (both join sides) and the ranking window
    disappears. ``backend="builtin"`` keeps the pure-JVM bucket
    self-join + window."""
    if backend == "arrow":
        from implementing_scds_in_hive_spark.operators.vector_kernels import (
            knn_within_buckets,
        )

        c = corpus.select(
            F.col(id_col),
            F.col(vec_col),
            sign_bits_bucket(F.col(vec_col), n_bits).alias("__bucket"),
        )
        out = knn_within_buckets(c, k=k, id_col=id_col, vec_col=vec_col)
        # builtin path names the owner column "vec_id" whatever id_col is
        return out.select(
            F.col(id_col).alias("vec_id"), "neighbor_id", "cos_sim", "rank"
        )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("__n"),
        sign_bits_bucket(F.col(vec_col), n_bits).alias("__bucket"),
    )
    left = c.select(
        F.col(id_col).alias("vec_id_out"),
        F.col(vec_col).alias("__lv"),
        F.col("__n").alias("__ln"),
        "__bucket",
    )
    right = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__rv"),
        F.col("__n").alias("__rn"),
        "__bucket",
    )
    scored = (
        left.join(right, "__bucket")
        .where(F.col("vec_id_out") != F.col("neighbor_id"))
        .select(
            F.col("vec_id_out"),
            "neighbor_id",
            _paired_cosine(F.col("__lv"), F.col("__ln"), F.col("__rv"), F.col("__rn")).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("vec_id_out").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("vec_id_out").alias("vec_id"), "neighbor_id", "cos_sim", "rank")
    )


def knn_join_ivf(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    backend: str = "arrow",
) -> DataFrame:
    """KNN self-join with IVF cell blocking: each vector's candidate set
    is the union of its ``nprobe`` nearest centroids' inverted lists;
    exact scoring + top-k within that set.

    Geometry: the probe side carries each vector ``nprobe`` times (its
    probed cells, ranked by query-to-centroid similarity — the standard
    multi-probe recall dial); the list side is the one-cell assignment
    built by :func:`ivf_assign` — pass a pre-assigned (ideally
    bucketed-on-disk, see operators/index_store.py) corpus to skip the
    build, the amortized path. One equi-join on centroid id; candidate
    volume is sum over cells of |cell| * |probes into cell| — balanced
    cells (k-means) bound the quadratic term that sign-bit buckets
    cannot.

    ``backend="arrow"`` (default, r15): the probe ranking becomes a
    map-only Arrow pass (one GEMM per batch + per-row top-nprobe under
    the window's own (sim desc, cid asc) order — the last
    interpreted-fold hot path in the vector family), and the
    probe-list scoring becomes a cogrouped per-cell GEMM
    (:func:`~.vector_kernels.knn_between_cells`) with cell-local top-k
    pruning, so the final window reads O(|corpus| * nprobe * k) rows
    instead of the full candidate volume. Two exchanges total (both
    cogroup sides keyed by cell) versus the built-in path's probe
    window exchange (nprobe embedding copies), join exchanges, and
    per-pair interpreted folds. Identical rows: rounded-6 scores are
    bitwise-equal (kernel-module contract) and every ranking uses the
    same total order. ``backend="builtin"`` keeps the pure-JVM plan."""
    if backend == "arrow":
        from implementing_scds_in_hive_spark.operators.vector_kernels import (
            assign_top_probes,
            knn_between_cells,
        )

        probes = assign_top_probes(
            corpus,
            centroids,
            nprobe=nprobe,
            id_col=id_col,
            vec_col=vec_col,
            centroid_id_col=centroid_id_col,
        )
        if centroid_id_col in corpus.columns:
            lists = corpus
        else:
            lists = ivf_assign(
                corpus,
                centroids,
                id_col=id_col,
                vec_col=vec_col,
                centroid_id_col=centroid_id_col,
                backend="arrow",
            )
        scored = knn_between_cells(
            probes,
            lists,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            cell_col=centroid_id_col,
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("vec_id", "neighbor_id", "cos_sim", "rank")
        )
    if centroid_id_col in corpus.columns:
        assigned = corpus
    else:
        assigned = ivf_assign(
            corpus, centroids, id_col=id_col, vec_col=vec_col, centroid_id_col=centroid_id_col,
            backend=backend,
        )
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col),
            F.col(vec_col).alias("__cvec"),
            norm(F.col(vec_col)).alias("__cvn"),
        )
    )
    probes_scored = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__qn", norm(F.col(vec_col)))
        .crossJoin(c)
        .select(
            F.col(id_col).alias("vec_id_out"),
            F.col(vec_col).alias("__lv"),
            F.col("__qn").alias("__ln"),
            centroid_id_col,
            _paired_cosine(F.col("__cvec"), F.col("__cvn"), F.col(vec_col), F.col("__qn")).alias(
                "__sim"
            ),
        )
    )
    wq = Window.partitionBy("vec_id_out").orderBy(F.col("__sim").desc(), F.col(centroid_id_col))
    probes = (
        probes_scored.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= nprobe)
        .select("vec_id_out", "__lv", "__ln", centroid_id_col)
    )
    lists = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__rv"),
        norm(F.col(vec_col)).alias("__rn"),
        centroid_id_col,
    )
    scored = (
        probes.join(lists, centroid_id_col)
        .where(F.col("vec_id_out") != F.col("neighbor_id"))
        .select(
            "vec_id_out",
            "neighbor_id",
            _paired_cosine(F.col("__lv"), F.col("__ln"), F.col("__rv"), F.col("__rn")).alias(
                "cos_sim"
            ),
        )
    )
    # a neighbor can appear via several probed cells only if it sits in
    # exactly one list — it cannot duplicate (lists partition the corpus,
    # each neighbor in one cell), so no dedupe stage is needed
    w = Window.partitionBy("vec_id_out").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("vec_id_out").alias("vec_id"), "neighbor_id", "cos_sim", "rank")
    )


def _int_dot(a, b):
    """Exact integer dot product of two int arrays (long accumulator)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantize_corpus(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric int8 (by default) quantization of an embedding corpus:
    ``(id, qvec array<tinyint>, qscale double, qnorm double)`` — the
    storage tier for 100 TB of vectors. tinyint elements make the
    parquet physical type int8: measured ~3x smaller files than float32
    arrays on the same vectors (tests/test_knn.py pins the ratio).
    ``qnorm`` is the integer vector's L2 norm, precomputed because the
    coarse stage ranks by approximate COSINE ``dot_int/(qnorm_a *
    qnorm_q)`` — the per-vector scales cancel exactly in that ratio. A
    raw-dot coarse ranking is norm-biased and collapses recall on any
    corpus with varying norms (measured 0.11 recall@5 at 50k clustered
    vectors vs 0.97+ normalized). Round-half-up quantization via
    explicit floor arithmetic (functions/vectors.py:quantize) —
    deterministic and engine-portable."""
    from implementing_scds_in_hive_spark.functions.vectors import quantize, quantize_scale

    # scale projected as a COLUMN first, then referenced by quantize —
    # inlining would duplicate the O(d) max-abs fold per element access
    # (the materialize-before-lambda discipline, operators/dedup.py)
    return (
        corpus.select(
            F.col(id_col),
            F.col(vec_col),
            quantize_scale(F.col(vec_col), bits=bits).alias("qscale"),
        )
        .select(
            id_col,
            quantize(F.col(vec_col), F.col("qscale")).cast("array<tinyint>").alias("qvec"),
            "qscale",
        )
        .select(
            id_col,
            "qvec",
            "qscale",
            F.sqrt(_int_dot(F.col("qvec"), F.col("qvec")).cast("double")).alias("qnorm"),
        )
    )


def quantized_rescore_topk(
    corpus_q: DataFrame,
    full_corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    backend: str = "arrow",
) -> DataFrame:
    """Two-stage ANN over a quantized corpus: COARSE top-``shortlist``
    per query scored entirely on int8 vectors (the only pass that
    touches the full corpus — reading the 4x-smaller storage tier),
    then EXACT cosine rescoring of the shortlist against the full
    vectors (a k-row-per-query join back into the float tier).

    ``backend="arrow"`` (default, r14) runs the coarse stage as one
    exact int64 GEMM per Arrow batch with batch-local top-``shortlist``
    pruning (integer dot products are reassociation-free, so the two
    backends agree bit-for-bit before rounding even applies);
    ``backend="builtin"`` keeps the JVM crossJoin + interpreted long
    fold. The rescore stage is a tiny |Q| x shortlist join either way
    and stays built-in.

    ``shortlist`` defaults to ``4 * k`` — the standard rescore margin:
    quantization perturbs scores by O(scale), so the true top-k lives
    inside a slightly larger coarse top-m with overwhelming
    probability; ``shortlist >= |corpus|`` degrades to exact brute
    force (tested identical to :func:`cosine_topk`). The coarse score
    is approximate cosine ``dot_int(qa, qq) / (qnorm_a * qnorm_q)`` —
    integer dot in the hot loop, one divide per pair; the quantization
    scales cancel exactly in the ratio, and normalizing matters: a
    raw-dot coarse ranking is norm-biased (see quantize_corpus)."""
    m = shortlist or 4 * k
    qq = quantize_corpus(
        queries, id_col=query_id_col, vec_col=vec_col
    ).select(
        F.col(query_id_col),
        F.col("qvec").alias("__qq"),
        F.col("qnorm").alias("__qn2"),
    )
    if backend == "arrow":
        from implementing_scds_in_hive_spark.operators.vector_kernels import (
            score_quantized_coarse,
        )

        q_rows = sorted(qq.collect(), key=lambda r: r[0])
        coarse_scored = score_quantized_coarse(
            corpus_q,
            [(r[0], r[1], r[2]) for r in q_rows],
            id_col=id_col,
            query_id_col=query_id_col,
            prune_k=m,
            query_id_type={f.name: f for f in qq.schema.fields}[
                query_id_col
            ].dataType,
        )
    else:
        coarse_scored = corpus_q.select(
            F.col(id_col), F.col("qvec").alias("__cq"), F.col("qnorm").alias("__cn2")
        ).crossJoin(F.broadcast(qq)).select(
            query_id_col,
            id_col,
            # 6-dp rounding like every other coarse tier: unrounded, the
            # shortlist cut is not cross-engine tie-stable (r11 review;
            # module-header convention)
            F.round(
                _int_dot(F.col("__cq"), F.col("__qq")).cast("double")
                / (F.col("__cn2") * F.col("__qn2")),
                6,
            ).alias("__coarse"),
        )
    w = Window.partitionBy(query_id_col).orderBy(F.col("__coarse").desc(), F.col(id_col))
    short = (
        coarse_scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= m)
        .select(query_id_col, id_col)
    )
    return _exact_rescore_topk(
        short,
        full_corpus,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    )


def rp_project_corpus(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim_in: int = 64,
    dim_out: int = 16,
    seed: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss storage tier: ``(id, rvec array<double>,
    rnorm)`` with ``rvec`` the Rademacher projection of the embedding
    (functions/vectors.py:random_project) — ``dim_in/dim_out``x smaller
    than the float tier, build-once like the int8 tier. JL preserves
    pairwise geometry to within ~1/sqrt(dim_out), so ranking by cosine
    in the projected space is a faithful coarse stage; unlike sign-bit
    LSH it keeps magnitudes, and unlike IVF it needs no training pass.
    The projection matrix is hash-derived (the seed string IS the
    index identity), so probe jobs in later sessions reconstruct it
    exactly without storing anything."""
    from implementing_scds_in_hive_spark.functions.vectors import random_project

    return corpus.select(
        F.col(id_col),
        random_project(F.col(vec_col), dim_in, dim_out, seed).alias("rvec"),
    ).select(id_col, "rvec", norm(F.col("rvec")).alias("rnorm"))


def rp_rescore_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    shortlist: int | None = None,
    dim_in: int = 64,
    dim_out: int = 16,
    seed: str = "rp",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    corpus_rp: DataFrame | None = None,
) -> DataFrame:
    """Two-stage ANN via random projection: COARSE top-``shortlist`` per
    query ranked by cosine in the ``dim_out``-dim projected space (the
    only full-corpus pass — dim_in/dim_out x less arithmetic and I/O
    than brute force), then EXACT cosine rescoring of the shortlist
    against the full vectors. Same rescore-margin contract as the int8
    tier (``shortlist`` defaults to 4k; >= |corpus| degrades to exact
    brute force). Pass ``corpus_rp`` (a saved :func:`rp_project_corpus`
    output) to skip the projection pass — build once, probe many.

    The coarse rank orders by the 6-dp-rounded projected cosine with id
    tiebreak — the same determinism convention every similarity oracle
    here uses, making the shortlist (not just the final answer)
    cross-engine replayable."""
    rp = corpus_rp if corpus_rp is not None else rp_project_corpus(
        corpus, id_col=id_col, vec_col=vec_col, dim_in=dim_in, dim_out=dim_out, seed=seed
    )
    qrp = rp_project_corpus(
        queries.select(F.col(query_id_col).alias(id_col), F.col(vec_col)),
        id_col=id_col, vec_col=vec_col, dim_in=dim_in, dim_out=dim_out, seed=seed,
    ).select(F.col(id_col).alias(query_id_col), "rvec", "rnorm")
    return projected_rescore_topk(
        corpus, queries, rp, qrp,
        k=k, shortlist=shortlist, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    )


def _exact_rescore_topk(
    short: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Exact-cosine rescore of a (query_id, id) shortlist against the
    full float tier plus the final top-k window — the shared second
    stage of every coarse-then-exact ANN tier (r11 review: previously
    copy-pasted between the int8 and projection tiers)."""
    full = corpus.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__cn")
    )
    qfull = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            norm(F.col(vec_col)).alias("__qn"),
        )
    )
    rescored = (
        short.join(full, id_col)
        .join(qfull, query_id_col)
        .select(
            query_id_col,
            id_col,
            _paired_cosine(
                F.col("__qvec"), F.col("__qn"), F.col(vec_col), F.col("__cn")
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def projected_rescore_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_proj: DataFrame,
    queries_proj: DataFrame,
    *,
    k: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    proj_col: str = "rvec",
    proj_norm_col: str = "rnorm",
    backend: str = "arrow",
) -> DataFrame:
    """Generic coarse-then-exact two-stage ANN over ANY low-dim
    projection: rank by 6-dp-rounded cosine in the projected space,
    exact-rescore the top-``shortlist``. ``corpus_proj`` /
    ``queries_proj`` carry ``(id/query_id, proj_col, proj_norm_col)`` —
    produced by :func:`rp_project_corpus` (data-oblivious JL) or
    ``operators/pca.py:pca_transform`` + a norm projection (trained;
    measured recall@5 0.76 vs 0.59 for JL at 16 dims / shortlist 40 —
    variance concentration is exactly what a coarse ranking wants).
    Same contracts as the other tiers: shortlist >= |corpus| degrades
    to exact brute force; deterministic id tie-breaks."""
    m = shortlist or 4 * k
    if backend == "arrow":
        from implementing_scds_in_hive_spark.operators.vector_kernels import (
            score_against_queries,
        )

        coarse = score_against_queries(
            corpus_proj,
            queries_proj,
            id_col=id_col,
            vec_col=proj_col,
            query_id_col=query_id_col,
            out_col="__coarse",
            prune_k=m,
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("__coarse").desc(), F.col(id_col)
        )
        short = (
            coarse.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= m)
            .select(query_id_col, id_col)
        )
        return _exact_rescore_topk(
            short, corpus, queries,
            k=k, id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
        )
    qrp = queries_proj.select(
        F.col(query_id_col),
        F.col(proj_col).alias("__qr"),
        F.col(proj_norm_col).alias("__qrn"),
    )
    coarse = (
        corpus_proj.select(
            F.col(id_col), F.col(proj_col).alias("__cr"), F.col(proj_norm_col).alias("__crn")
        )
        .crossJoin(F.broadcast(qrp))
        .select(
            query_id_col,
            id_col,
            F.round(
                dot(F.col("__cr"), F.col("__qr")) / (F.col("__crn") * F.col("__qrn")), 6
            ).alias("__coarse"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("__coarse").desc(), F.col(id_col))
    short = (
        coarse.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= m)
        .select(query_id_col, id_col)
    )
    return _exact_rescore_topk(
        short,
        corpus,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    )


def pca_rescore_topk(
    corpus: DataFrame,
    queries: DataFrame,
    model,
    *,
    k: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    corpus_proj: DataFrame | None = None,
) -> DataFrame:
    """Two-stage ANN over a TRAINED projection
    (operators/pca.py:PCAModel): like the JL tier but the coarse space
    concentrates corpus variance, buying recall per dimension (0.76 vs
    0.59 recall@5 at 16 dims on the driver corpus). Pass
    ``corpus_proj`` (a saved :func:`pca_project_corpus` output) to
    skip re-projection — build once, probe many."""
    cp = corpus_proj if corpus_proj is not None else pca_project_corpus(
        corpus, model, id_col=id_col, vec_col=vec_col
    )
    qp = pca_project_corpus(
        queries.select(F.col(query_id_col).alias(id_col), F.col(vec_col)),
        model,
        id_col=id_col,
        vec_col=vec_col,
    ).select(F.col(id_col).alias(query_id_col), "rvec", "rnorm")
    return projected_rescore_topk(
        corpus, queries, cp, qp,
        k=k, shortlist=shortlist, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    )


def pca_project_corpus(
    corpus: DataFrame,
    model,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PCA storage tier ``(id, rvec, rnorm)`` — the trained counterpart
    of :func:`rp_project_corpus`, same output contract so the two are
    interchangeable in :func:`projected_rescore_topk`."""
    from implementing_scds_in_hive_spark.operators.pca import pca_transform

    return pca_transform(
        corpus.select(F.col(id_col), F.col(vec_col)), model,
        vec_col=vec_col, out_col="rvec",
    ).select(id_col, "rvec", norm(F.col("rvec")).alias("rnorm"))


def semantic_dedup_pairs(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "arrow",
) -> DataFrame:
    """SemDeDup candidate pairs (Abbas et al. 2023, public): assign
    every vector to its nearest centroid (:func:`ivf_assign` — cosine,
    deterministic tie-break), then emit within-cluster pairs whose
    cosine reaches ``threshold``. Cluster blocking is the point: the
    pair join is |cluster|²-bounded per cluster, never corpus², and
    near-dups land in the same cluster by construction (a pair more
    similar to each other than either is to any centroid boundary).
    Cross-cluster near-dups at the decision boundary are missed — the
    documented SemDeDup recall trade, tunable with the centroid count.

    Returns ``(id_a, id_b, cos_sim)`` with ``id_a < id_b``; cosine is
    rounded to 6 places (the engine-portability convention every
    similarity tier here uses) BEFORE the threshold compare, so an
    ANSI-SQL oracle replays the pair set bit-for-bit.

    ``backend="arrow"`` (default, r14): the assignment is the map-only
    Arrow pass and the within-cluster pairs come from one grouped GEMM
    per cluster (upper triangle, ids ascending) — one shuffle total
    (the cluster group-by) instead of a sort-merge self-join shuffling
    the vectors twice and folding each pair's dot interpretively."""
    if backend == "arrow":
        from implementing_scds_in_hive_spark.operators.vector_kernels import (
            pairs_within_groups,
        )

        assigned = ivf_assign(
            corpus, centroids, id_col=id_col, vec_col=vec_col,
            backend="arrow",
        )
        return pairs_within_groups(
            assigned,
            group_col="centroid_id",
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
        )
    assigned = ivf_assign(
        corpus, centroids, id_col=id_col, vec_col=vec_col,
        backend=backend,
    ).select(
        "centroid_id",
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        norm(F.col(vec_col)).alias("__n"),
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            _paired_cosine(
                F.col("a.__v"), F.col("a.__n"), F.col("b.__v"), F.col("b.__n")
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend: str = "arrow",
) -> DataFrame:
    """SemDeDup keep-set: resolve :func:`semantic_dedup_pairs` into
    near-dup components (A~B, B~C groups {A,B,C} even when A~C was
    never emitted) and keep ONE representative per component — the
    smallest id, deterministic — plus every unpaired vector. Returns
    the surviving corpus rows unchanged.

    Election reuses :func:`operators.graph.canonical_members` (the same
    keep/drop machinery the text near-dup tiers use); the component
    resolution is the standard alternating-union small-step iteration,
    bounded by the component diameter."""
    from implementing_scds_in_hive_spark.operators.graph import (
        canonical_members,
    )

    pairs = semantic_dedup_pairs(
        corpus, centroids, threshold=threshold, id_col=id_col,
        vec_col=vec_col, backend=backend,
    )
    members = canonical_members(
        corpus.select(F.col(id_col), F.lit(0.0).alias("__score")),
        pairs,
        id_col=id_col,
        score_col="__score",
    )
    drop = members.where(~F.col("is_canonical")).select(
        F.col("doc_id").alias("__drop_id")
    )
    return corpus.join(
        drop, corpus[id_col] == F.col("__drop_id"), "left_anti"
    )

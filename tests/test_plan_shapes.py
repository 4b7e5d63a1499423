"""Physical-plan regression guards: the scale properties PLANS.md claims
are asserted here so a future refactor cannot silently reintroduce a
shuffle or lose pushdown."""

from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.plans.registry import queries


def all_queries():
    """Driver registry + pytest-only set: plan guards must survive slot
    rotation (a query folded to the pytest compare keeps its plan
    contract)."""
    import importlib

    qs = dict(queries())
    for m in ("scd_queries", "relational", "pipeline_ops"):
        mod = importlib.import_module(f"implementing_scds_in_hive_spark.plans.{m}")
        for k, v in mod.PYTEST_ONLY_QUERIES.items():
            qs.setdefault(k, v)
    return qs


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan: str) -> int:
    # shuffle exchanges only — BroadcastExchange is the cheap, wanted
    # kind. Deduplicate by signature (ids stripped): a persisted
    # intermediate prints its upstream exchange twice (once inside the
    # InMemoryRelation's cached plan, once in the pre-cache tree) but
    # executes it once.
    import re

    sigs = {
        re.sub(r"#\d+L?|plan_id=\d+", "", ln.strip())
        for ln in plan.splitlines()
        if re.search(r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)", ln)
    }
    return len(sigs)


def test_merge_broadcast_plan_single_shuffle(spark, sf_dir):
    """The flagship claim: production never shuffles — the only
    full-data shuffle in the whole merge is the two_pass re-key's range
    exchange, and there is NO single-partition sort anywhere."""
    plan = _plan(queries()["scd2_merge_customer"](spark, sf_dir))
    assert _shuffles(plan) == 1  # Exchange rangepartitioning (re-key)
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_merge_anti_join_scan_is_key_pruned(spark, sf_dir):
    """The brand-new-keys anti-join must read ONLY the key column of
    production (Catalyst ColumnPruning reaching the parquet scan)."""
    plan = _plan(queries()["scd2_merge_customer"](spark, sf_dir))
    assert "ReadSchema: struct<c_custkey:bigint>" in plan


def test_cdc_apply_bounded_shuffles(spark, sf_dir):
    """The driver CDC query: the dimension never shuffles — the only
    shuffle exchanges are the (persisted) feed collapse / feed-pruned
    stats aggregation and the two_pass re-key's range exchange. No
    sort-merge join, no single-partition sort."""
    plan = _plan(queries()["scd_cdc_apply"](spark, sf_dir))
    assert _shuffles(plan) <= 3
    assert "SortMergeJoin" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan


def test_agg_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(queries()["agg_lineitem_pricing"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # partial aggregation before the exchange (map-side combine)
    assert plan.index("HashAggregate") < plan.index("Exchange hashpartitioning") or \
        plan.count("HashAggregate") >= 2


def test_windows_never_global(spark, sf_dir):
    """Every analytic window is PARTITION BY — no single-partition sort
    anywhere outside the SCD parity re-key."""
    qs = all_queries()  # sessionize folded to pytest in the r11 rotation
    for name in ("window_topn_per_group", "window_analytics", "sessionize"):
        plan = _plan(qs[name](spark, sf_dir))
        assert "Exchange SinglePartition" not in plan, name


def test_window_analytics_single_exchange(spark, sf_dir):
    """Five window functions over three frame specs, one shuffle: all
    partition by o_custkey, so Catalyst plans a single hash exchange
    with per-ordering in-partition sorts."""
    plan = _plan(queries()["window_analytics"](spark, sf_dir))
    assert _shuffles(plan) == 1


def test_ivf_assign_is_aggregation_not_window(spark, sf_dir):
    """The IVF plan must never shuffle K copies of any embedding.

    r14 arrow backend (the default): assignment + probe scoring are one
    fused map-only pass — the plan's only shuffle partitions the tiny
    (query_id, id, cos_sim) candidate rows for the final top-k window,
    and the embeddings cross no exchange at all. The builtin fallback
    keeps the older guarantee: the per-vector argmax is a
    partial-aggregating max_by, never a window (a window shuffles K
    copies of every embedding; the aggregation collapses K->1
    map-side). Windows in either plan may only partition by query_id
    (tiny probe/top-k rows)."""
    plan = _plan(queries()["similarity_topk_ivf"](spark, sf_dir))
    assert "MapInPandas" in plan
    # every shuffle in the arrow plan carries only the scored triples
    assert _shuffles(plan) <= 1
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln:
            assert "query_id" in ln, ln

    from implementing_scds_in_hive_spark.operators.similarity import ivf_topk
    from implementing_scds_in_hive_spark.plans.pipeline_ops import (
        _query_vectors,
        _t,
    )

    e = _t(spark, sf_dir, "embeddings")
    centroids = e.where(F.col("vec_id") % 25 == 3).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    builtin = _plan(
        ivf_topk(
            e, _query_vectors(spark, sf_dir), centroids, k=8, nprobe=3,
            backend="builtin",
        )
    )
    assert "max_by" in builtin
    for ln in builtin.splitlines():
        if "windowspecdefinition" in ln:
            assert "query_id" in ln, ln


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(queries()["join_star_schema"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims under threshold


def test_scan_projection_pruned(spark, sf_dir):
    """A 2-column projection must not read all 16 lineitem columns."""
    from implementing_scds_in_hive_spark.sources.registry import load_table

    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_vocab_topk_is_distributed_topk(spark, sf_dir):
    """The vocabulary head must come from TakeOrderedAndProject (k rows
    per partition, k-list merge on the driver) — never a global sort of
    the full vocabulary through a single partition."""
    from implementing_scds_in_hive_spark.plans.pipeline_ops import q_vocab_topk

    plan = _plan(q_vocab_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_mixture_sample_is_shuffle_free(spark, sf_dir):
    """Each mixture source is a per-row filter above its own scan and
    the union is plan-level only: zero shuffle exchanges."""
    from implementing_scds_in_hive_spark.plans.pipeline_ops import q_mixture_sample

    assert _shuffles(_plan(q_mixture_sample(spark, sf_dir))) == 0


def test_sample_frames_single_python_stage(spark, sf_dir):
    """Frame sampling is one Arrow-batched Python stage over the
    payload projection — no shuffle, no extra Python round-trips."""
    from implementing_scds_in_hive_spark.plans.pipeline_ops import q_sample_frames

    plan = _plan(q_sample_frames(spark, sf_dir))
    assert plan.count("MapInPandas") == 1
    assert _shuffles(plan) == 0


def test_bucketed_sessionizer_plan_is_bounded(spark, sf_dir):
    """The two-level sessionizer's scale contract (PLANS.md r4): no
    single-partition exchange anywhere, level-1 windows partition by
    (user, bucket) — never by user alone over raw events — and the
    whole plan costs at most 3 shuffle exchanges (level-1 hash, level-2
    hash on the reduced mini-session rows, final groupBy reuses the
    level-2 partitioning or adds one)."""
    from implementing_scds_in_hive_spark.operators.sessionize import (
        sessionize_bucketed,
    )
    from implementing_scds_in_hive_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    plan = _plan(sessionize_bucketed(e))
    assert "Exchange SinglePartition" not in plan
    assert _shuffles(plan) <= 3, plan
    # level 1 partitions by (user_id, bucket): the first window's
    # hashpartitioning must mention __bucket
    import re

    hashes = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert any("__bucket" in ln for ln in hashes), hashes


def test_r5_promoted_slots_plan_shapes(spark, sf_dir):
    """Plan guards for the queries promoted to driver slots in r5 —
    each one's scale property, pinned:

    * forward_fill — per-key window only, never a global sort;
    * pack_sequences — the two-pass prefix sum replaces the global
      window: any window partitions by the range-partition id;
    * funnel — ONE full-data shuffle (the per-user collect aggregation,
      with map-side partial);
    * dedup_incremental — the corpus index is probed via broadcast
      joins, never shuffled on its own keys.
    """
    q = all_queries()

    plan = _plan(q["forward_fill"](spark, sf_dir))
    assert "Exchange SinglePartition" not in plan

    plan = _plan(q["pack_sequences"](spark, sf_dir))
    assert "Exchange SinglePartition" not in plan
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln:
            assert "__pid" in ln, ln

    plan = _plan(q["funnel_view_click_purchase"](spark, sf_dir))
    assert _shuffles(plan) == 1
    assert "partial_collect_list" in plan or plan.count("ObjectHashAggregate") >= 2

    plan = _plan(q["dedup_incremental"](spark, sf_dir))
    assert "hashpartitioning(did" not in plan


def test_cms_sketch_single_combinable_shuffle(spark, sf_dir):
    """The CMS build must be ONE hash shuffle with map-side partial
    aggregation: the depth-way explode stays in-row (no join, no extra
    exchange), and counters combine before the exchange so a hot
    group's increments collapse per map task."""
    from implementing_scds_in_hive_spark.operators.sketches import cms_sketch

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    plan = _plan(cms_sketch(events, ["event_type"], "user_id"))
    assert _shuffles(plan) == 1
    assert plan.index("HashAggregate") < plan.index("Exchange hashpartitioning")
    assert "Exchange SinglePartition" not in plan


def test_ks_statistic_has_no_single_partition_window(spark, sf_dir):
    """The KS CDF is a global running sum — the naive formulation is a
    no-partition window (Exchange SinglePartition). The two-pass prefix
    sum must keep every exchange partitioned."""
    from implementing_scds_in_hive_spark.operators.drift import _ks_distances

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    handles = []
    df, n_a, n_b, _ = _ks_distances(
        e.where(F.col("event_type") == "click"),
        e.where(F.col("event_type") == "purchase"),
        "value",
        cache_handles=handles,
    )
    assert n_a > 0 and n_b > 0
    plan = _plan(df)
    # the final 1-row max aggregation legitimately collapses to a single
    # partition; what must NOT appear is a Window fed by a
    # SinglePartition exchange (in toString a child prints directly
    # beneath its parent — assert no such adjacency)
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window" in ln:
            below = "".join(lines[i + 1 : i + 3])
            assert "Exchange SinglePartition" not in below, ln
    assert "Exchange rangepartitioning" in plan  # the two-pass shape
    for h in handles:
        h.unpersist()


def test_rp_projection_is_jvm_only_constant_folded(spark, sf_dir):
    """The JL projection must compile to literal-array dot products —
    no Python evaluation, no per-row hashing."""
    from implementing_scds_in_hive_spark.operators.similarity import rp_project_corpus

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(rp_project_corpus(emb, dim_in=64, dim_out=16))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "md5" not in plan.lower()  # signs folded at plan-build time


def test_jaccard_prefix_has_no_cartesian(spark, sf_dir):
    """Candidate generation must be an equi-join on the prefix shingle
    hash — never a cartesian/broadcast-nested-loop over doc pairs."""
    from implementing_scds_in_hive_spark.operators.dedup import jaccard_prefix_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(jaccard_prefix_pairs(docs, threshold=0.8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_iteration_uses_combinable_aggregation(spark):
    """Each iteration's inflow sum must be a partial (map-side combine)
    hash aggregate, and rank state a flat scan (localCheckpoint), not a
    nested iterative plan."""
    from implementing_scds_in_hive_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i % 50, (i * 7) % 50) for i in range(500) if i % 50 != (i * 7) % 50],
        "src int, dst int",
    )
    ranks = pagerank(edges, iterations=2)
    plan = _plan(ranks)
    assert "Scan ExistingRDD" in plan  # localCheckpoint truncated lineage
    assert "Exchange SinglePartition" not in plan


def test_dedupe_max_by_partial_aggregates_before_shuffle(spark):
    """r12 skew guard (VERDICT r11 #5): the max_by staging dedupe must
    partial-aggregate map-side — a hot key's redeliveries collapse to
    one row per input partition BEFORE the exchange, so no task is ever
    O(rows of the hottest key) — and must contain no Window (the
    row_number formulation's skew concentrator)."""
    from implementing_scds_in_hive_spark.operators.scd import (
        SCDConfig,
        dedupe_staging,
    )

    cfg = SCDConfig(
        key="k", type2_cols=("v",), type1_cols=(), surrogate_col="sk"
    )
    df = spark.createDataFrame([(1, "a", 1)], "k long, v string, seq long")
    plan = _plan(dedupe_staging(df, cfg, order_by=["seq"], strategy="max_by"))
    assert "partial_max_by" in plan, plan
    assert plan.index("partial_max_by") > plan.index("Exchange"), (
        "partial aggregate must sit BELOW the exchange (executedPlan "
        "prints top-down, so the map-side phase appears after it)"
    )
    assert "Window" not in plan


def test_merge_auto_plan_follows_staging_size_estimate(spark, sf_dir):
    """r14 default flip: with no broadcast flag, plan="auto" consults
    Catalyst's staging size estimate — a small staging takes the
    broadcast plan (production never shuffles); with auto-broadcast
    disabled the choice falls back to full_outer (SortMergeJoin on the
    key). Results are property-tested identical, so this is purely the
    physical-plan contract."""
    from implementing_scds_in_hive_spark.operators.scd import scd2_merge
    from implementing_scds_in_hive_spark.plans.scd_fixtures import (
        AS_OF,
        CUSTOMER_CFG,
        customer_production,
        customer_staging,
    )

    prod = customer_production(spark, sf_dir)
    stg = customer_staging(spark, sf_dir)
    auto = scd2_merge(prod, stg, CUSTOMER_CFG, AS_OF, key_strategy="hash")
    plan = _plan(auto)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fo = scd2_merge(prod, stg, CUSTOMER_CFG, AS_OF, key_strategy="hash")
        plan_fo = _plan(fo)
        assert "SortMergeJoin" in plan_fo  # full_outer shuffles both sides
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

"""Arrow/NumPy batch-scoring kernels for the similarity operators.

The optimization-guide shape (guide §4.2): Spark keeps distribution,
shuffles and I/O; whole Arrow batches are handed to NumPy/BLAS instead
of evaluating ``aggregate``/``zip_with`` lambdas per element. Higher-
order array expressions never join whole-stage codegen, so a pairwise
cosine costs O(dim) *interpreted* JVM work per pair — measured 1.3-1.7 s
for the 160k-pair IVF assignment at sf0.1 where one float64 GEMM plus
the Arrow crossing costs ~0.3 s (PLANS.md r14; an unrolled codegen
chain was also tried and measured *slower* — 5 s — because a 128-term
``element_at`` expression blows past JIT inlining limits).

Equality contract (these kernels back hash-compared oracle slots):

* The dot/norm floating-point sums are reassociated by BLAS, so raw
  doubles can differ from the JVM fold in the last ulp or two. Every
  score consumer rounds to 6 decimals *before* any ranking or
  comparison (the module convention in operators/similarity.py), and
  the rounded scores are VERIFIED EQUAL on every graded fixture
  (0 mismatches over all pairs at sf0.001/0.01/0.1 —
  tests/test_vector_kernels.py pins backend equality; the driver
  oracle gate re-proves it per slot). That is strong evidence, not a
  proof: a reassociated sum can in principle land on the far side of a
  .5e-6 rounding boundary from the fold's sum (r14 ADVICE), which
  rounding replay cannot repair — the oracle gate is the standing
  backstop for exactly that event.
* :func:`round_half_up` replays Spark's exact ``round()`` semantics
  (shortest-decimal-repr HALF_UP via java.math.BigDecimal): a
  vectorized ``np.round`` fast path, a ``decimal.Decimal`` fix-up for
  values within float error of a .5 decimal boundary (np rounds
  HALF_EVEN on exact scaled ties and can mis-side near-boundary values
  after the *1e6 multiply), and a zero normalization (BigDecimal has no
  signed zero, so Spark's round never emits -0.0; np.round(-1e-9, 6)
  does).
* Integer kernels (the int8 coarse stage) are exact by construction:
  NumPy int64 matmul and the JVM long fold compute the same integers.

Small-side collection: every kernel that captures a matrix does so for
a side that is small *by contract* (centroids, query batches) — the
same side the built-in path already collects into a broadcast hash
relation. The big side streams through ``mapInPandas`` one batch at a
time and is never materialized.

Degenerate inputs: a zero-norm vector divides to ±Inf/NaN in both
backends (IEEE), but NaN *ordering* differs (Spark sorts NaN greatest,
NumPy sorts it last), so batch-local top-k pruning is only exact for
finite scores — the operators document clean-embedding preconditions
and the graded fixtures satisfy them. Ragged or NULL embeddings raise
loudly here rather than silently scoring as NULL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

__all__ = [
    "round_half_up",
    "collect_vectors",
    "score_against_queries",
    "assign_nearest",
    "assign_top_probes",
    "score_probed_lists",
    "knn_between_cells",
]

# Row-block width for the grouped/cogrouped GEMM kernels: a hot bucket
# of B vectors scores as ceil(B / block) GEMMs of (block x B) instead of
# one dense B x B matrix, bounding per-task float64 scratch at
# block * B * 8 bytes (plus the B x dim group itself) while computing
# identical results — each row's top-k/threshold emit depends only on
# its own row of the similarity matrix, so slicing rows changes nothing
# (guide §5: per-task state is what OOMs workers, not candidate count).
_ROW_BLOCK = 4096


def round_half_up(arr: np.ndarray, decimals: int = 6) -> np.ndarray:
    """Spark-exact ``round(x, decimals)`` over a float64 array.

    Fast path: ``np.round``. Values whose scaled fraction sits within
    1e-6 of .5 (where float multiply error or HALF_EVEN-vs-HALF_UP can
    flip the result) are recomputed through ``decimal.Decimal`` on the
    value's shortest repr — exactly java.math.BigDecimal's model. The
    final ``out == 0.0`` rewrite folds -0.0 to +0.0 (BigDecimal is
    unsigned at zero; Python's Decimal is not)."""
    out = np.round(arr, decimals)
    finite = np.isfinite(arr)
    if finite.any():
        scaled = np.where(finite, arr, 0.0) * (10.0 ** decimals)
        frac = np.abs(scaled - np.floor(scaled) - 0.5)
        suspect = finite & (frac < 1e-6)
        if suspect.any():
            from decimal import ROUND_HALF_UP, Decimal

            q = Decimal(1).scaleb(-decimals)
            flat = out.reshape(-1)
            src = arr.reshape(-1)
            for i in np.nonzero(suspect.reshape(-1))[0]:
                flat[i] = float(
                    Decimal(repr(float(src[i]))).quantize(q, ROUND_HALF_UP)
                )
    out[out == 0.0] = 0.0
    return out


def _as_matrix(vectors, what: str) -> np.ndarray:
    """Stack a sequence of fixed-length vectors into a float64 matrix;
    raises a clear error on NULL or ragged rows instead of silently
    mis-scoring."""
    try:
        m = np.array([np.asarray(v, dtype=np.float64) for v in vectors])
    except (TypeError, ValueError) as e:  # NULL element / ragged lengths
        raise ValueError(
            f"{what}: embeddings must be non-NULL fixed-length numeric "
            f"arrays for the arrow backend ({e})"
        ) from e
    if m.ndim != 2:
        raise ValueError(
            f"{what}: embeddings must be non-NULL fixed-length numeric "
            f"arrays for the arrow backend (got ndim={m.ndim})"
        )
    return m


def collect_vectors(df: DataFrame, id_col: str, vec_col: str):
    """Collect a small-by-contract vector table, sorted by id ascending
    (the argmax tie-break order). Returns (ids int64[], matrix float64
    [n, dim], norms float64[n], id_field, vec_field).

    Ids are carried as int64, so only integral id columns are accepted
    — a float/string id would silently mis-sort or crash deep inside a
    kernel (r14 ADVICE); fail loudly here instead, mirroring
    _as_matrix. The builtin backends have no such restriction."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    fields = {f.name: f for f in df.schema.fields}
    if not isinstance(
        fields[id_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    ):
        raise ValueError(
            f"collect_vectors({id_col}): the arrow backend requires an "
            f"integral id column (got {fields[id_col].dataType.simpleString()}); "
            "use backend='builtin' for other id types"
        )
    rows = df.select(id_col, vec_col).collect()
    rows.sort(key=lambda r: r[0])
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = _as_matrix([r[1] for r in rows], f"collect_vectors({vec_col})")
    norms = np.sqrt((m * m).sum(axis=1))
    return ids, m, norms, fields[id_col], fields[vec_col]


def _batch_topk(qids, ids, sims, k):
    """Per-query top-k of a batch's candidate triples under the module's
    total order (sim desc, id asc) — exact pruning: any globally-top-k
    row is also batch-top-k under the same total order.

    FINITE scores only (module precondition): NumPy's lexsort ranks NaN
    worst while Spark's DESC ordering ranks NaN greatest, so a zero-norm
    embedding (NaN cosine) would be pruned here yet win the builtin
    ranking — unlike ragged/NULL vectors, which _as_matrix rejects
    loudly (r14 ADVICE documents the asymmetry)."""
    keep = np.zeros(len(qids), dtype=bool)
    for q in np.unique(qids):
        at = np.nonzero(qids == q)[0]
        if len(at) > k:
            order = np.lexsort((ids[at], -sims[at]))[:k]
            keep[at[order]] = True
        else:
            keep[at] = True
    return keep


def score_against_queries(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    out_col: str = "cos_sim",
    prune_k: int | None = None,
) -> DataFrame:
    """All-pairs cosine of ``corpus`` against a small query set:
    one GEMM per Arrow batch instead of |C|x|Q| interpreted dot folds.
    Emits (query_id, id, out_col) with scores rounded to 6 decimals
    exactly like ``F.round(dot/(na*nb), 6)``.

    ``prune_k`` keeps only each query's batch-local top-k candidates
    (sim desc, id asc) — exact when the caller's final ranking uses the
    same total order, and it bounds the exchange into the final window
    at O(batches * |Q| * k) rows instead of |C| x |Q|."""
    qids, qm, qnorms, qid_field, _ = collect_vectors(queries, query_id_col, vec_col)
    id_field = {f.name: f for f in corpus.schema.fields}[id_col]
    schema = StructType(
        [
            StructField(query_id_col, qid_field.dataType, qid_field.nullable),
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField(out_col, DoubleType(), True),
        ]
    )
    nq = len(qids)

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0 or nq == 0:
                continue
            e = _as_matrix(pdf[vec_col], f"score_against_queries({vec_col})")
            en = np.sqrt((e * e).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = round_half_up(np.matmul(e, qm.T) / np.outer(en, qnorms))
            ids = np.repeat(pdf[id_col].to_numpy(), nq)
            out_q = np.tile(qids, n)
            flat = sims.ravel()
            if prune_k is not None and len(flat) > nq * prune_k:
                keep = _batch_topk(out_q, ids, flat, prune_k)
                out_q, ids, flat = out_q[keep], ids[keep], flat[keep]
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: ids, out_col: flat}
            )

    return corpus.select(id_col, vec_col).mapInPandas(score, schema)


def score_quantized_coarse(
    corpus_q: DataFrame,
    query_rows: list,
    *,
    id_col: str,
    qvec_col: str = "qvec",
    qnorm_col: str = "qnorm",
    query_id_col: str = "query_id",
    out_col: str = "__coarse",
    prune_k: int | None = None,
    query_id_type=None,
) -> DataFrame:
    """Coarse int8 scoring: one exact int64 GEMM per Arrow batch against
    the collected quantized query set (``query_rows`` = [(query_id,
    qvec, qnorm), ...]). The integer dot is EXACT in both backends
    (int64 matmul == the JVM long fold — no reassociation concern), the
    single divide by the precomputed norms matches the built-in
    ``dot/(cn*qn)`` bit-for-bit, and rounding is :func:`round_half_up`.
    The corpus-side ``qnorm`` column is reused, not recomputed.

    ``query_id_type``: the QUERIES' query_id DataType — pass it when the
    two id spaces could diverge (int query ids vs long corpus ids would
    otherwise fail the schema_match gate, r14 ADVICE); defaults to the
    corpus id type for back-compat."""
    qids = np.array([r[0] for r in query_rows], dtype=np.int64)
    qm = np.array([np.asarray(r[1], dtype=np.int64) for r in query_rows])
    qnorms = np.array([float(r[2]) for r in query_rows])
    id_field = {f.name: f for f in corpus_q.schema.fields}[id_col]
    schema = StructType(
        [
            StructField(query_id_col, query_id_type or id_field.dataType, True),
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField(out_col, DoubleType(), True),
        ]
    )
    nq = len(qids)

    def score(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0 or nq == 0:
                continue
            e = np.array(
                [np.asarray(v, dtype=np.int64) for v in pdf[qvec_col]]
            )
            cn = pdf[qnorm_col].to_numpy(dtype=np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = round_half_up(
                    np.matmul(e, qm.T).astype(np.float64)
                    / np.outer(cn, qnorms)
                )
            ids = np.repeat(pdf[id_col].to_numpy(), nq)
            out_q = np.tile(qids, n)
            flat = sims.ravel()
            if prune_k is not None and len(flat) > nq * prune_k:
                keep = _batch_topk(out_q, ids, flat, prune_k)
                out_q, ids, flat = out_q[keep], ids[keep], flat[keep]
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: ids, out_col: flat}
            )

    return corpus_q.select(id_col, qvec_col, qnorm_col).mapInPandas(
        score, schema
    )


def assign_nearest(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    centroid_id_col: str,
) -> DataFrame:
    """IVF assignment as a map-only pass: per batch, one GEMM against
    the collected centroid matrix and a row-wise argmax over the
    6-decimal-rounded similarities (ties -> lowest centroid id, the
    matrix being sorted ascending). No exchange at all — the built-in
    formulation's max_by aggregation (itself the fix for the older K×
    window shuffle) is folded into the scan."""
    cids, cm, cnorms, cid_field, _ = collect_vectors(
        centroids, centroid_id_col, vec_col
    )
    fields = {f.name: f for f in corpus.schema.fields}
    schema = StructType(
        [
            fields[id_col],
            fields[vec_col],
            StructField(centroid_id_col, cid_field.dataType, cid_field.nullable),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            e = _as_matrix(pdf[vec_col], f"assign_nearest({vec_col})")
            en = np.sqrt((e * e).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = round_half_up(np.matmul(e, cm.T) / np.outer(en, cnorms))
            # np.argmax returns the FIRST maximum: centroid ids ascending
            # == max_by(struct(sim, -cid)) of the built-in path
            best = cids[np.argmax(sims, axis=1)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    centroid_id_col: best,
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(assign, schema)


def decimal10_ints(e: np.ndarray, what: str) -> np.ndarray:
    """Each element as the EXACT integer of its decimal(·,10) cast —
    the scaled value Spark's ``cast(x as decimal(27,10))`` produces
    (shortest-double-repr BigDecimal, setScale(10, HALF_UP)).

    Fast path: ``rint(x * 1e10)`` — correct whenever the scaled value
    is not near a .5 boundary, because the float multiply's error is
    below half an ulp. Values whose scaled fraction sits within a
    MAGNITUDE-AWARE window of .5 (8 ulps of the scaled value, floored
    at 1e-6 — at scale 1e10 a fixed window misses boundaries the
    multiply error can cross) are recomputed exactly through
    ``decimal.Decimal`` on the shortest repr, java.math.BigDecimal's
    model. Non-finite elements raise loudly (the JVM cast would
    silently NULL them out of the sum)."""
    if not np.isfinite(e).all():
        raise ValueError(
            f"{what}: embeddings must be finite for the exact decimal "
            "mean (non-finite element found)"
        )
    scaled = e * 1e10
    out = np.rint(scaled)
    frac = np.abs(scaled - np.floor(scaled) - 0.5)
    tol = np.maximum(1e-6, 8.0 * np.spacing(np.abs(scaled)))
    suspect = frac < tol
    if suspect.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal(1)
        flat = out.reshape(-1)
        src = e.reshape(-1)
        for i in np.nonzero(suspect.reshape(-1))[0]:
            # scaleb is an exact exponent shift (no context rounding);
            # the float() of the resulting integer is exact for
            # |x| < ~9e5 (2^53 / 1e10) — far above embedding magnitudes
            flat[i] = float(
                Decimal(repr(float(src[i]))).scaleb(10).quantize(q, ROUND_HALF_UP)
            )
    return out.astype(np.int64)


def assign_mean_partials(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    centroid_id_col: str,
) -> DataFrame:
    """One fused Lloyd-iteration pass: per Arrow batch, assign every
    vector to its nearest centroid (identically to
    :func:`assign_nearest`) and accumulate each centroid's EXACT
    per-dimension decimal(·,10) sums as Python integers across the
    whole task, emitting one tiny partial row (centroid_id, sums as
    decimal strings, count) per centroid per task. Integer partials
    combine associatively, so the driver-side merge reproduces the
    posexplode -> decimal-sum aggregation bit-for-bit regardless of
    partitioning — while the corpus crosses the Python boundary ONCE
    and nothing wide ever reaches an exchange (the partial volume is
    O(tasks * K) rows)."""
    from pyspark.sql.types import ArrayType, LongType, StringType

    cids, cm, cnorms, cid_field, _ = collect_vectors(
        centroids, centroid_id_col, vec_col
    )
    schema = StructType(
        [
            StructField(centroid_id_col, cid_field.dataType, cid_field.nullable),
            StructField("__sums", ArrayType(StringType()), False),
            StructField("__cnt", LongType(), False),
        ]
    )

    def partials(batches):
        acc: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            e = _as_matrix(pdf[vec_col], f"assign_mean_partials({vec_col})")
            en = np.sqrt((e * e).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = round_half_up(np.matmul(e, cm.T) / np.outer(en, cnorms))
            best = cids[np.argmax(sims, axis=1)]
            ints = decimal10_ints(e, f"assign_mean_partials({vec_col})")
            for cid in pd.unique(best):
                at = best == cid
                # per-batch int64 block sum is exact (batch_rows * 1e11
                # << 2^63); the cross-batch accumulator is Python ints
                block = ints[at].sum(axis=0)
                got = acc.get(cid)
                if got is None:
                    acc[cid] = [[int(v) for v in block], int(at.sum())]
                else:
                    got[0] = [a + int(b) for a, b in zip(got[0], block)]
                    got[1] += int(at.sum())
        if acc:
            keys = sorted(acc)
            yield pd.DataFrame(
                {
                    centroid_id_col: keys,
                    "__sums": [[str(v) for v in acc[c][0]] for c in keys],
                    "__cnt": [acc[c][1] for c in keys],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(partials, schema)


def _knn_self_topk_blocks(ids, e, k, block):
    """Pure-NumPy core of :func:`knn_within_buckets`: yields
    (owner_ids, neighbor_ids, sims, ranks) per row-block. Each owner's
    top-k (sim desc, neighbor id asc; self excluded by POSITION) reads
    only its own row of the similarity matrix, so scoring ``block`` rows
    at a time against the full group is result-identical to the dense
    BxB matrix while bounding scratch at block*B float64."""
    n = len(ids)
    en = np.sqrt((e * e).sum(axis=1))
    take = min(k, n - 1)
    ranks = np.arange(1, take + 1, dtype=np.int32)
    for s in range(0, n, block):
        eb = e[s : s + block]
        m = len(eb)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = round_half_up(np.matmul(eb, e.T) / np.outer(en[s : s + m], en))
        key = -sims
        key[np.arange(m), s + np.arange(m)] = np.inf  # self sorts last
        owner = np.repeat(np.arange(m), n)
        order = np.lexsort((np.tile(ids, m), key.ravel(), owner))
        picks = order.reshape(m, n)[:, :take].ravel()
        yield (
            ids[s + picks // n],
            ids[picks % n],
            sims.ravel()[picks],
            np.tile(ranks, m),
        )


def assign_top_probes(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    nprobe: int,
    id_col: str,
    vec_col: str,
    centroid_id_col: str,
) -> DataFrame:
    """Per-vector top-``nprobe`` centroid assignment as a map-only pass
    (the multi-probe generalization of :func:`assign_nearest`): each
    Arrow batch GEMM-scores against the collected centroid matrix and
    emits the vector once per probed cell, ranked by (6-dp-rounded sim
    desc, centroid id asc) — the exact total order of the built-in
    probe-ranking window, so the probe SET is identical. Replaces a
    |corpus| x K interpreted-fold crossjoin plus a ranking window that
    shuffles nprobe copies of every embedding."""
    cids, cm, cnorms, cid_field, _ = collect_vectors(
        centroids, centroid_id_col, vec_col
    )
    fields = {f.name: f for f in corpus.schema.fields}
    schema = StructType(
        [
            fields[id_col],
            fields[vec_col],
            StructField(centroid_id_col, cid_field.dataType, cid_field.nullable),
        ]
    )
    take = min(nprobe, len(cids))

    def probe(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0 or take == 0:
                continue
            e = _as_matrix(pdf[vec_col], f"assign_top_probes({vec_col})")
            en = np.sqrt((e * e).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = round_half_up(np.matmul(e, cm.T) / np.outer(en, cnorms))
            # centroid matrix is sorted by id ascending, so a STABLE
            # argsort of -sims breaks rounded-score ties toward the
            # lowest centroid id — the window's (sim desc, cid asc)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :take]
            rep = np.repeat(np.arange(n), take)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[rep],
                    vec_col: pdf[vec_col].to_numpy()[rep],
                    centroid_id_col: cids[order.ravel()],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(probe, schema)


def knn_between_cells(
    probes: DataFrame,
    lists: DataFrame,
    *,
    k: int,
    id_col: str,
    vec_col: str,
    cell_col: str,
    out_id_col: str = "vec_id",
    neighbor_id_col: str = "neighbor_id",
    out_col: str = "cos_sim",
    block: int = _ROW_BLOCK,
) -> DataFrame:
    """Two-sided grouped GEMM over IVF cells (the pair kernel
    generalized to query-group x corpus-group): cogroup ``probes``
    (vectors replicated into their probed cells) with ``lists`` (the
    one-cell assignment) on ``cell_col``; per cell, score probe
    row-blocks against the cell's member matrix with one GEMM each and
    emit every probe's cell-local top-k under (sim desc, neighbor id
    asc), self-pairs excluded. A vector's global top-k is a subset of
    the union of its per-cell top-k under the same total order (its
    candidates partition across its probed cells), so the caller's
    final ranking window sees every winning row while reading
    O(|probes| * k) instead of the full candidate volume. Scratch is
    O(block * |cell|) float64 per task."""
    fields = {f.name: f for f in probes.schema.fields}
    id_field = fields[id_col]
    schema = StructType(
        [
            StructField(out_id_col, id_field.dataType, id_field.nullable),
            StructField(neighbor_id_col, id_field.dataType, id_field.nullable),
            StructField(out_col, DoubleType(), True),
        ]
    )
    empty = pd.DataFrame({out_id_col: [], neighbor_id_col: [], out_col: []})

    def cell(left, right):
        nl, nr = len(left), len(right)
        if nl == 0 or nr == 0:
            return empty
        r = _as_matrix(right[vec_col], f"knn_between_cells({vec_col})")
        rn = np.sqrt((r * r).sum(axis=1))
        rids = right[id_col].to_numpy()
        lids_all = left[id_col].to_numpy()
        parts = []
        for s in range(0, nl, block):
            eb = _as_matrix(
                left[vec_col].iloc[s : s + block],
                f"knn_between_cells({vec_col})",
            )
            m = len(eb)
            lids = lids_all[s : s + m]
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = round_half_up(
                    np.matmul(eb, r.T) / np.outer(np.sqrt((eb * eb).sum(axis=1)), rn)
                )
            key = -sims
            key[lids[:, None] == rids[None, :]] = np.inf  # self sorts last
            owner = np.repeat(np.arange(m), nr)
            order = np.lexsort((np.tile(rids, m), key.ravel(), owner))
            take = min(k, nr)
            picks = order.reshape(m, nr)[:, :take].ravel()
            good = np.isfinite(key.ravel()[picks])  # drop self-pair fill
            picks = picks[good]
            if len(picks):
                parts.append(
                    pd.DataFrame(
                        {
                            out_id_col: lids[picks // nr],
                            neighbor_id_col: rids[picks % nr],
                            out_col: sims.ravel()[picks],
                        }
                    )
                )
        return pd.concat(parts, ignore_index=True) if parts else empty

    return (
        probes.select(cell_col, id_col, vec_col)
        .groupBy(cell_col)
        .cogroup(lists.select(cell_col, id_col, vec_col).groupBy(cell_col))
        .applyInPandas(cell, schema)
    )


def knn_within_buckets(
    bucketed: DataFrame,
    *,
    k: int,
    id_col: str,
    vec_col: str,
    bucket_col: str = "__bucket",
    block: int = _ROW_BLOCK,
) -> DataFrame:
    """Bucket-blocked KNN self-join as ONE grouped Arrow pass: each
    bucket group GEMM-scores ``block`` rows at a time against the whole
    bucket and extracts every row's top-k (sim desc, neighbor id asc;
    self excluded) — replacing the bucket-keyed self-join (TWO shuffles
    of the vectors) + per-pair interpreted folds + ranking window with
    one shuffle and BLAS. Identical rows: scores round through
    :func:`round_half_up` and the extraction order is the window's own
    total order.

    Scratch memory is O(block * B) per bucket (r15; the r14 dense BxB
    matrix OOM-risked a worker on one hot sign-bit bucket — guide §5);
    the candidate VOLUME scored is unchanged from the join formulation,
    and the operator-level skew warning (prefer k-means cells over
    sign-bit buckets at scale) applies unchanged."""
    fields = {f.name: f for f in bucketed.schema.fields}
    id_field = fields[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("neighbor_id", id_field.dataType, id_field.nullable),
            StructField("cos_sim", DoubleType(), True),
            StructField("rank", IntegerType(), False),
        ]
    )
    empty = pd.DataFrame(
        {id_col: [], "neighbor_id": [], "cos_sim": [], "rank": []}
    )

    def topk(pdf):
        n = len(pdf)
        if n < 2:
            return empty
        e = _as_matrix(pdf[vec_col], f"knn_within_buckets({vec_col})")
        ids = pdf[id_col].to_numpy()
        parts = [
            pd.DataFrame(
                {id_col: o, "neighbor_id": nb, "cos_sim": sv, "rank": rk}
            )
            for o, nb, sv, rk in _knn_self_topk_blocks(ids, e, k, block)
        ]
        return pd.concat(parts, ignore_index=True) if parts else empty

    return bucketed.select(id_col, vec_col, bucket_col).groupBy(
        bucket_col
    ).applyInPandas(topk, schema)


def _pairs_threshold_blocks(ids, e, threshold, block):
    """Pure-NumPy core of :func:`pairs_within_groups`: yields
    (id_a, id_b, sims) per row-block of the upper triangle (``ids`` must
    be sorted ascending). Row-major emission over sequential row-blocks
    reproduces the dense path's np.triu_indices order exactly while
    bounding scratch at block*B float64 instead of BxB."""
    n = len(ids)
    en = np.sqrt((e * e).sum(axis=1))
    cols = np.arange(n)
    for s in range(0, n - 1, block):
        eb = e[s : s + block]
        m = len(eb)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = round_half_up(np.matmul(eb, e.T) / np.outer(en[s : s + m], en))
        upper = cols[None, :] > (s + np.arange(m))[:, None]
        with np.errstate(invalid="ignore"):
            keep = upper & (sims >= threshold)
        ia, ib = np.nonzero(keep)  # row-major == triu_indices order
        if len(ia):
            yield ids[s + ia], ids[ib], sims[ia, ib]


def pairs_within_groups(
    assigned: DataFrame,
    *,
    group_col: str,
    id_col: str,
    vec_col: str,
    threshold: float,
    out_col: str = "cos_sim",
    block: int = _ROW_BLOCK,
) -> DataFrame:
    """Within-group similar pairs (the SemDeDup shape) as ONE grouped
    Arrow pass: per group, GEMM-score ``block`` rows at a time against
    the whole group and threshold-emit the upper triangle (rows sorted
    by id, so id_a < id_b) on the 6-decimal-rounded cosine — replacing
    the group-keyed self-join (two shuffles + per-pair interpreted
    folds) with one shuffle and BLAS. Scratch memory is O(block * B)
    per group (r15 — was a dense BxB matrix; guide §5); the candidate
    volume scored is the same as the join's."""
    fields = {f.name: f for f in assigned.schema.fields}
    id_field = fields[id_col]
    schema = StructType(
        [
            StructField("id_a", id_field.dataType, id_field.nullable),
            StructField("id_b", id_field.dataType, id_field.nullable),
            StructField(out_col, DoubleType(), True),
        ]
    )
    empty = pd.DataFrame({"id_a": [], "id_b": [], out_col: []})

    def pairs(pdf):
        n = len(pdf)
        if n < 2:
            return empty
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        e = _as_matrix(
            pdf[vec_col].iloc[order], f"pairs_within_groups({vec_col})"
        )
        parts = [
            pd.DataFrame({"id_a": a, "id_b": b, out_col: v})
            for a, b, v in _pairs_threshold_blocks(ids, e, threshold, block)
        ]
        return pd.concat(parts, ignore_index=True) if parts else empty

    return assigned.select(group_col, id_col, vec_col).groupBy(
        group_col
    ).applyInPandas(pairs, schema)


def score_probed_lists(
    assigned: DataFrame,
    probes: list,
    *,
    id_col: str,
    vec_col: str,
    centroid_id_col: str,
    query_id_col: str,
    query_id_type,
    out_col: str = "cos_sim",
    prune_k: int | None = None,
    assign_centroids=None,
) -> DataFrame:
    """IVF probe scoring: ``assigned`` (corpus + centroid_id) streams
    once; each batch is grouped by its centroid ids and scored only
    against the queries probing that list (``probes`` = [(query_id,
    centroid_id, qvec), ...], the tiny |Q| x nprobe set). Replaces the
    broadcast join + per-pair interpreted fold with one small GEMM per
    (batch, probed list).

    ``assign_centroids=(cids, matrix)`` fuses the on-the-fly assignment
    into the same pass: the input then needs only (id, vec), each batch
    is argmax-assigned first (identically to :func:`assign_nearest`)
    and scored second — the corpus crosses the Python boundary ONCE
    instead of out-and-back-in through a separate assignment stage."""
    by_cid: dict = {}
    for qid, cid, qvec in probes:
        by_cid.setdefault(cid, []).append((qid, qvec))
    mats = {}
    for cid, pairs in by_cid.items():
        qids = np.array([p[0] for p in pairs], dtype=np.int64)
        qm = _as_matrix([p[1] for p in pairs], "score_probed_lists(queries)")
        mats[cid] = (qids, qm, np.sqrt((qm * qm).sum(axis=1)))
    id_field = {f.name: f for f in assigned.schema.fields}[id_col]
    schema = StructType(
        [
            StructField(query_id_col, query_id_type, True),
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField(out_col, DoubleType(), True),
        ]
    )

    if assign_centroids is not None:
        acids, acm = assign_centroids
        acnorms = np.sqrt((acm * acm).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if assign_centroids is not None:
                e_all = _as_matrix(pdf[vec_col], f"score_probed_lists({vec_col})")
                en_all = np.sqrt((e_all * e_all).sum(axis=1))
                with np.errstate(divide="ignore", invalid="ignore"):
                    asims = round_half_up(
                        np.matmul(e_all, acm.T) / np.outer(en_all, acnorms)
                    )
                cvals = acids[np.argmax(asims, axis=1)]
            else:
                e_all = en_all = None
                cvals = pdf[centroid_id_col].to_numpy()
            parts = []
            for cid in pd.unique(cvals):
                got = mats.get(cid)
                if got is None:
                    continue
                qids, qm, qnorms = got
                at = np.nonzero(cvals == cid)[0]
                if e_all is not None:
                    e, en = e_all[at], en_all[at]
                else:
                    e = _as_matrix(
                        pdf[vec_col].iloc[at], f"score_probed_lists({vec_col})"
                    )
                    en = np.sqrt((e * e).sum(axis=1))
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = round_half_up(
                        np.matmul(e, qm.T) / np.outer(en, qnorms)
                    )
                nq = len(qids)
                parts.append(
                    (
                        np.tile(qids, len(at)),
                        np.repeat(pdf[id_col].to_numpy()[at], nq),
                        sims.ravel(),
                    )
                )
            if not parts:
                continue
            out_q = np.concatenate([p[0] for p in parts])
            ids = np.concatenate([p[1] for p in parts])
            flat = np.concatenate([p[2] for p in parts])
            if prune_k is not None:
                keep = _batch_topk(out_q, ids, flat, prune_k)
                out_q, ids, flat = out_q[keep], ids[keep], flat[keep]
            yield pd.DataFrame(
                {query_id_col: out_q, id_col: ids, out_col: flat}
            )

    in_cols = (
        [id_col, vec_col]
        if assign_centroids is not None
        else [id_col, vec_col, centroid_id_col]
    )
    return assigned.select(*in_cols).mapInPandas(score, schema)

"""Embedding similarity search over ``array<float>`` columns.

Per-row vector math uses native higher-order functions (``zip_with``
+ ``aggregate``) — JVM-side, no Python serialization.  Where the work
is a PAIR BLOCK rather than a row (within-bucket all-pairs scoring),
:func:`bucketed_cosine_pairs_blocked` switches to Arrow-batched numpy
with a fold-order contract that keeps results bit-identical to the
expression path — HOFs don't enter whole-stage codegen, so per-pair
interpreted folds lose to C loops once the pair space is O(bucket²).

Scale path: brute-force top-k is O(N·Q); for large N use
:func:`bucketed_topk` (coarse quantization / IVF-style: probe only the
nearest centroid buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: max centroid-matrix size (float64 ELEMENTS = K x dim) that
#: bucketed_cosine_pairs_blocked will broadcast — 32M elements
#: (256 MB), a comfortable TorrentBroadcast; beyond it the "tiny by
#: contract" K ≈ √N sizing has been violated and the fit must coarsen.
_CENTROID_ELEM_BUDGET = 32 * 1024 * 1024


def auto_k(n: int, dim: int, c: float = 1.0, min_k: int = 8) -> int:
    """Scale-aware IVF centroid count: ``K = max(min_k, ⌊c·√N + 0.5⌋)``
    clamped by the centroid broadcast byte budget.

    The √N rule keeps per-bucket work flat as the corpus grows — with
    K ∝ √N and nprobe fixed, a bucketed pair query's candidate space is
    O(N²·probes²/K) = O(N^1.5), and a probe query scans
    O(nprobe·N/K) = O(√N) vectors.  A FIXED demo K leaves a quadratic
    residue that the measured sf0.1→sf1 profile showed as 9–14× wall
    for 10× data; the K∝√N sweep at sf1 restored ≤4× (SCALE.md, "The K
    lever, measured").

    Deterministic and ORACLE-REPLICABLE by construction: ``⌊x + 0.5⌋``
    over IEEE ``sqrt`` is bit-identical in any engine, so a DuckDB
    oracle can recompute the same K from ``COUNT(*)`` —
    ``LEAST(GREATEST(min_k, CAST(floor(c*sqrt(cnt)+0.5) AS BIGINT)),
    budget)`` — and a query parameterized by auto_k stays exactly
    checkable at every scale factor."""
    import math

    if n <= 0:
        return min_k
    k = int(math.floor(c * math.sqrt(float(n)) + 0.5))
    k = max(min_k, k)
    return min(k, _CENTROID_ELEM_BUDGET // max(1, dim))


def ivf_auto_centroids(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cemb",
    dim: int = 64,
    min_k: int = 8,
    c: float = 1.0,
) -> tuple[DataFrame, int]:
    """Scale-aware IVF index fit: pick ``K = auto_k(N)`` and seed the
    centroid table with the first K vectors by id — the deterministic,
    oracle-replicable seeding every declared row uses (ids are assumed
    dense from 0, true of any row-numbered corpus; ``kmeans_refine``
    upgrades seeds to true Lloyd centroids when quality matters more
    than oracle determinism).  Returns ``(centroids, K)``.

    This is the DEFAULT entry point for building an IVF index: callers
    that pin K explicitly are demo/oracle parameterizations, not the
    scale path."""
    # one column-pruned count job (O(1) RESULT, not O(1) cost — Spark
    # still scans row-group counts); callers fitting many indexes over
    # the same corpus should count once and pass explicit centroids
    k = auto_k(embeddings.count(), dim, c=c, min_k=min_k)
    return (
        embeddings.filter(F.col(id_col) < k).select(
            F.col(id_col).alias(centroid_id_col),
            F.col(vec_col).alias(centroid_vec_col),
        ),
        k,
    )


def _fold_sum(arr: Column) -> Column:
    """Left-fold sum of an array<double> — deterministic order."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _round_half_up(arr, digits: int):
    """``F.round`` semantics in numpy: HALF_UP on the shortest decimal
    repr of the double (java ``BigDecimal.valueOf``), NOT numpy's
    ties-to-even on the scaled binary value.

    Fast path: away from a .5 boundary the two disagree never — the
    scaled product's representation error (≤ ~1.2e-10 for |x| ≤ 1 at 6
    digits) can't cross a boundary that's ≥ 1e-7 away, so plain
    ``np.round`` is exact there.  Elements within 1e-7 of a boundary
    (rare: requires the value to sit on a near-half-ulp-of-decimal
    point, e.g. 1/128 at 6 digits) are re-rounded exactly through
    ``decimal`` on ``repr(x)``, which is the same shortest round-trip
    string java produces.  Keeps blocked numpy assignment bit-identical
    to the ``ivf_assign`` / DuckDB-oracle rounding."""
    import numpy as np

    scale = 10.0**digits
    y = arr * scale
    out = np.round(arr, digits)
    sus = np.abs((y - np.floor(y)) - 0.5) < 1e-7
    if sus.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal(1).scaleb(-digits)
        idx = np.nonzero(sus)
        out[idx] = [
            float(Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP))
            for v in arr[idx]
        ]
    return out


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def l2_norm_sq(a: Column) -> Column:
    return _fold_sum(F.zip_with(a, a, lambda x, y: x * y))


def cosine_sim(a: Column, b: Column) -> Column:
    """cos(a,b) = dot / (||a||·||b||), computed dot/(sqrt·sqrt)."""
    return dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the squared L2 norm once — self-joins then reuse it
    instead of recomputing per pair."""
    return df.withColumn(
        "__norm_sq", l2_norm_sq(F.col(vec_col).cast("array<double>"))
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """All-pairs cosine near-duplicate detection (embedding near-dup).

    Exact baseline: self-join on id inequality, fold-based dot
    product, threshold on the rounded similarity.  O(N²) by nature —
    at 100 TB scale use :func:`ivf_assign` buckets (or LSH) to
    restrict the pair space first; this operator is then applied
    within buckets only.
    """
    n = with_norm(embeddings, vec_col)
    a = n.select(
        F.col(id_col).alias("ia"),
        F.col(vec_col).cast("array<double>").alias("va"),
        F.col("__norm_sq").alias("na"),
    )
    b = n.select(
        F.col(id_col).alias("ib"),
        F.col(vec_col).cast("array<double>").alias("vb"),
        F.col("__norm_sq").alias("nb"),
    )
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    sim = F.round(
        dot(F.col("va"), F.col("vb")) / (F.sqrt("na") * F.sqrt("nb")), round_digits
    )
    return (
        pairs.select("ia", "ib", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cemb",
    round_digits: int = 6,
    probes: int = 1,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its
    most-similar centroid (broadcast the centroid table, rank with a
    per-vector window, deterministic centroid-id tie-break).

    This is the ANN scale path: search probes only the top buckets,
    turning brute-force O(N) per query into O(N/k · probes).

    ``probes > 1`` emits one row per (vector, nearest-i-th centroid)
    for i ≤ probes — multi-probe assignment, the standard recall fix
    for pairs that straddle a Voronoi boundary."""
    from pyspark.sql import Window

    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(centroid_id_col),
        F.round(
            cosine_sim(
                F.col(vec_col).cast("array<double>"),
                F.col(centroid_vec_col).cast("array<double>"),
            ),
            round_digits,
        ).alias("cs"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cs"), F.asc(centroid_id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= probes)
        .select(id_col, F.col(centroid_id_col).alias("cluster"), "cs")
    )


def bucketed_cosine_pairs(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.4,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cemb",
    round_digits: int = 6,
) -> DataFrame:
    """Near-duplicate pairs via IVF buckets — the 100 TB replacement
    for :func:`cosine_pairs`' all-pairs self-join.

    Plan shape: broadcast-assign every vector to its ``probes``
    nearest centroids (no shuffle), tag vectors with their cluster,
    then self-join *on the cluster key* — the shuffle is keyed by
    cluster, and the pair space collapses from O(N²) to
    O(Σ bucket²) ≈ O(N²·probes²/K) for K balanced centroids.
    Multi-probe duplicates (a pair sharing two buckets) are folded by
    a final ``distinct`` on the (ia, ib, cos_sim) triple.

    Approximate by construction: a pair is found iff the two vectors
    share ≥1 of their ``probes`` nearest centroids.  High-similarity
    pairs (the near-dups this exists for) almost always do; recall is
    tunable via ``probes`` / K.
    """
    assign = ivf_assign(
        embeddings,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        centroid_id_col=centroid_id_col,
        centroid_vec_col=centroid_vec_col,
        round_digits=round_digits,
        probes=probes,
    ).select(id_col, "cluster")
    n = with_norm(embeddings, vec_col).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__vec"),
        F.col("__norm_sq"),
    )
    tagged = assign.join(n, id_col)
    a = tagged.select(
        F.col("cluster"),
        F.col(id_col).alias("ia"),
        F.col("__vec").alias("va"),
        F.col("__norm_sq").alias("na"),
    )
    b = tagged.select(
        F.col("cluster"),
        F.col(id_col).alias("ib"),
        F.col("__vec").alias("vb"),
        F.col("__norm_sq").alias("nb"),
    )
    pairs = a.join(b, ["cluster"]).filter(F.col("ia") < F.col("ib"))
    sim = F.round(
        dot(F.col("va"), F.col("vb")) / (F.sqrt("na") * F.sqrt("nb")), round_digits
    )
    return (
        pairs.select("ia", "ib", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def _centroid_block(centroids, centroid_id_col="cid", centroid_vec_col="cemb"):
    """MLlib-style "fit" materialization shared by every blocked ANN
    path: collect the centroid table ONCE on the driver (tiny by
    contract, K ≈ √N — budget-ENFORCED below, not assumed: at N=1e12,
    K≈1e6 × 512 dims × 8 B ≈ 4 GB stops being an executor-friendly
    broadcast and the caller must coarsen K or switch to a join-based
    assignment) as ``(cids asc, float64 matrix, fold-left norms)``
    ready for TorrentBroadcast."""
    import numpy as np

    cen_rows = sorted(
        (
            (r[0], r[1])
            for r in centroids.select(
                F.col(centroid_id_col),
                F.col(centroid_vec_col).cast("array<double>"),
            ).collect()
        ),
        key=lambda t: t[0],
    )
    if not cen_rows:
        raise ValueError(
            "centroid table is empty — fit centroids first "
            "(ivf_centroids / ivf_auto_centroids / kmeans_refine)"
        )
    cids = np.array([t[0] for t in cen_rows], dtype=np.int64)
    cmat = np.vstack([t[1] for t in cen_rows]).astype(np.float64, copy=False)
    n_cen, dim = cmat.shape
    if n_cen * dim > _CENTROID_ELEM_BUDGET:
        raise ValueError(
            f"centroid table too large to broadcast: K={n_cen} x "
            f"dim={dim} = {n_cen * dim} float64 elements exceeds the "
            f"{_CENTROID_ELEM_BUDGET}-element budget (~"
            f"{_CENTROID_ELEM_BUDGET * 8 >> 20} MB). Coarsen K toward "
            "sqrt(N) or assign clusters with a broadcast JOIN instead."
        )
    cnrm = np.zeros(n_cen)
    for k in range(dim):  # fold-left, matches l2_norm_sq exactly
        cnrm += cmat[:, k] * cmat[:, k]
    return cids, cmat, cnrm


def ivf_assign_blocked(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cemb",
    round_digits: int = 6,
    probes: int = 1,
    block: tuple | None = None,
) -> DataFrame:
    """:func:`ivf_assign` as MAP-SIDE blocked numpy (``mapInPandas``)
    instead of crossJoin + window: the N×K scored-candidate
    materialization and the per-vector window shuffle disappear —
    each Arrow batch is scored against the broadcast centroid block
    with vectorized C loops and emits its ``probes`` best cluster ids
    directly.  Returns ``(id_col, cluster)`` — one row per (vector,
    probe), zero exchanges.

    Same decision, bit-identical: dimension-at-a-time fold-left
    accumulation (the exact ``aggregate(zip_with(...))`` order),
    HALF_UP rounding via ``_round_half_up``, then (cs desc, cid asc)
    lexsort — the tuple ``ivf_assign``'s window ranks by.  The K ≈ √N
    broadcast-budget contract is enforced by :func:`_centroid_block`.

    This is the assignment shape that survives 100 TB: at K=√N the
    crossJoin form materializes N·√N rows and shuffles them through a
    window; this form streams N rows through an Arrow kernel with an
    O(K·dim) per-executor broadcast.

    ``block`` accepts a pre-collected ``_centroid_block`` result so a
    query assigning several sides against the SAME fit (train +
    probes), or a process fitting the same corpus repeatedly, pays
    the centroid-materialization job once — the stored-index shape of
    a production ANN service."""
    import numpy as np
    import pandas as pd

    cids, cmat, cnrm = block if block is not None else _centroid_block(
        centroids, centroid_id_col, centroid_vec_col
    )
    n_cen, dim = cmat.shape
    bc = embeddings.sparkSession.sparkContext.broadcast((cids, cmat, cnrm))
    n_probe = min(probes, n_cen)

    def _assign(batches):
        cids, cmat, cnrm = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.vstack(pdf["__vec"].to_numpy()).astype(
                np.float64, copy=False
            )
            nrm = np.zeros(n)
            for k in range(dim):  # fold-left, matches l2_norm_sq
                nrm += mat[:, k] * mat[:, k]
            acc = np.zeros((n, n_cen))
            for k in range(dim):  # fold-left per (vector, centroid)
                acc += mat[:, k, None] * cmat[None, :, k]
            cs = _round_half_up(
                acc / (np.sqrt(nrm)[:, None] * np.sqrt(cnrm)[None, :]),
                round_digits,
            )
            out_id = np.empty(n * n_probe, dtype=np.int64)
            out_cluster = np.empty(n * n_probe, dtype=np.int64)
            for i in range(n):
                top = np.lexsort((cids, -cs[i]))[:n_probe]  # desc, cid asc
                out_id[i * n_probe : (i + 1) * n_probe] = ids[i]
                out_cluster[i * n_probe : (i + 1) * n_probe] = cids[top]
            yield pd.DataFrame({id_col: out_id, "cluster": out_cluster})

    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__vec")
    )
    return vecs.mapInPandas(_assign, f"{id_col} bigint, cluster bigint")


def bucketed_cosine_pairs_blocked(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.4,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cemb",
    round_digits: int = 6,
    block: tuple | None = None,
) -> DataFrame:
    """:func:`bucketed_cosine_pairs` with the within-bucket scoring
    done as BLOCKED numpy arithmetic per cluster (``applyInPandas``)
    instead of a per-pair expression fold.

    Why: the pair space is O(Σ bucket²) rows, and evaluating a 64-dim
    higher-order-function dot per pair is interpreted (HOFs don't
    enter whole-stage codegen).  Shipping each cluster's vectors ONCE
    over Arrow (O(N·probes) rows) and scoring all of its pairs with
    vectorized C loops turns ~6M interpreted folds into ~64 SIMD
    passes — the FAISS-style "gather the cell, score the block"
    layout.  At 100 TB the Arrow batch per task is one bucket
    (~N·probes/K vectors), bounded by the same K ≈ √N sizing rule.

    Bit-compatibility contract (what keeps the oracle hash green):
    the accumulation loops run dimension-at-a-time, reproducing the
    exact fold-left order ``((0+x₀d₀)+x₁d₁)+…`` of
    ``aggregate(zip_with(a, b, *), 0.0, +)``; the cosine is
    ``acc / (sqrt(na)·sqrt(nb))`` — the same three IEEE ops; rounding
    and thresholding stay in Spark (same ``F.round`` as the
    expression path).  numpy float64 ≡ JVM double, so every emitted
    cos_sim is bit-identical to the unblocked plan's.

    ``block`` accepts a pre-collected ``_centroid_block`` result (the
    cached stored-index shape — see ivf_assign_blocked).
    """
    import numpy as np
    import pandas as pd

    cids, cmat, cnrm = block if block is not None else _centroid_block(
        centroids, centroid_id_col, centroid_vec_col
    )
    n_cen, dim = cmat.shape

    # one copy per EXECUTOR via TorrentBroadcast, not one per task in
    # the pickled UDF closure (round-5 verdict nit: closure shipping
    # multiplies the centroid block by the task count)
    bc = embeddings.sparkSession.sparkContext.broadcast((cids, cmat, cnrm))

    # a query can't probe more cells than exist
    n_probe = min(probes, n_cen)

    def _assign(batches):
        # map-side multi-probe assignment: emit (cluster, id, vec)
        # per probe; the vector rides along so scoring needs no join.
        cids, cmat, cnrm = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.vstack(pdf["__vec"].to_numpy()).astype(np.float64, copy=False)
            nrm = np.zeros(n)
            for k in range(dim):  # fold-left
                nrm += mat[:, k] * mat[:, k]
            acc = np.zeros((n, n_cen))
            for k in range(dim):  # fold-left per (vector, centroid)
                acc += mat[:, k, None] * cmat[None, :, k]
            cs = _round_half_up(
                acc / (np.sqrt(nrm)[:, None] * np.sqrt(cnrm)[None, :]), round_digits
            )
            out_cluster = np.empty(n * n_probe, dtype=np.int64)
            out_id = np.empty(n * n_probe, dtype=np.int64)
            for i in range(n):
                top = np.lexsort((cids, -cs[i]))[:n_probe]  # cs desc, cid asc
                out_cluster[i * n_probe : (i + 1) * n_probe] = cids[top]
                out_id[i * n_probe : (i + 1) * n_probe] = ids[i]
            yield pd.DataFrame(
                {
                    "cluster": out_cluster,
                    id_col: out_id,
                    "__vec": [
                        v for v in pdf["__vec"].to_numpy() for _ in range(n_probe)
                    ],
                }
            )

    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__vec")
    )
    tagged = vecs.mapInPandas(
        _assign, f"cluster bigint, {id_col} bigint, __vec array<double>"
    )
    # pandas pre-filter margin: any pair whose ROUNDED sim can reach the
    # threshold survives; the exact post-round filter runs in Spark.
    margin = threshold - 10.0 ** (-round_digits)

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {
                "ia": np.array([], dtype=np.int64),
                "ib": np.array([], dtype=np.int64),
                "cos_raw": np.array([], dtype=np.float64),
            }
        )
        if n < 2:
            return empty
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        mat = np.vstack(pdf["__vec"].to_numpy()[order]).astype(np.float64, copy=False)
        d = mat.shape[1]
        nrm = np.zeros(n)
        for k in range(d):  # fold-left, matches l2_norm_sq exactly
            nrm += mat[:, k] * mat[:, k]
        ii, jj = np.triu_indices(n, 1)
        acc = np.zeros(len(ii))
        A, B = mat[ii], mat[jj]
        for k in range(d):  # fold-left, matches dot() exactly
            acc += A[:, k] * B[:, k]
        cos = acc / (np.sqrt(nrm[ii]) * np.sqrt(nrm[jj]))
        keep = cos >= margin
        return pd.DataFrame(
            {"ia": ids[ii][keep], "ib": ids[jj][keep], "cos_raw": cos[keep]}
        )

    pairs = tagged.groupBy("cluster").applyInPandas(
        _score, "ia bigint, ib bigint, cos_raw double"
    )
    sim = F.round(F.col("cos_raw"), round_digits)
    return (
        pairs.select("ia", "ib", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def maxsim_partials_blocked(
    cand: DataFrame,
    queries: DataFrame,
    group_col: str = "grp",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qemb",
    micro: int = 1_000_000,
) -> DataFrame:
    """Late-interaction (ColBERT MaxSim) scoring as a MAP-SIDE blocked
    numpy kernel: per (candidate-group, query-vector) max of the
    micro-rounded cosine, computed without ever materializing the
    |cand| × |queries| similarity rows in the JVM.

    The broadcast-nested-loop form (``cand.join(broadcast(q))`` + a
    higher-order-function cosine per pair) evaluates |cand|·|q|
    interpreted ``aggregate(zip_with(...))`` folds — HOFs don't enter
    whole-stage codegen, so at |q|=50 every candidate vector pays 50
    interpreted 64-dim folds, and the (qid, grp) partial-max aggregate
    shuffles |cand|·|q| rows.  This kernel streams each Arrow batch of
    candidates once, scores it against the broadcast query block with
    dimension-at-a-time C loops, and reduces to per-batch
    (group, qid) maxima before anything leaves the task — the exchange
    then carries O(|groups|·|q|) rows instead of O(|cand|·|q|).

    Bit-compatibility contract (same as :func:`ivf_assign_blocked`):
    fold-left accumulation reproduces ``aggregate(zip_with(a, b, *),
    0.0, +)`` exactly; the cosine is ``acc / (sqrt(nq)·sqrt(nc))`` —
    the same three IEEE ops; ``round(cos · micro)`` uses
    :func:`_round_half_up` (``F.round`` HALF_UP semantics).  MAX over
    exact int64 micro-units is order-free, so batch partials compose.

    Returns ``(group_col, qid_col, max_sim)`` — one row per
    (group, query vector), already globally reduced."""
    import numpy as np
    import pandas as pd

    qids, qmat, qnrm = _centroid_block(queries, qid_col, qvec_col)
    nq, dim = qmat.shape
    bc = cand.sparkSession.sparkContext.broadcast((qids, qmat, qnrm))

    def _score(batches):
        qids, qmat, qnrm = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            grp = pdf[group_col].to_numpy()
            mat = np.vstack(pdf["__vec"].to_numpy()).astype(
                np.float64, copy=False
            )
            nrm = np.zeros(n)
            for k in range(dim):  # fold-left, matches l2_norm_sq
                nrm += mat[:, k] * mat[:, k]
            acc = np.zeros((n, nq))
            for k in range(dim):  # fold-left per (candidate, query)
                acc += mat[:, k, None] * qmat[None, :, k]
            sim = _round_half_up(
                acc / (np.sqrt(qnrm)[None, :] * np.sqrt(nrm)[:, None])
                * float(micro),
                0,
            ).astype(np.int64)
            ug, inv = np.unique(grp, return_inverse=True)
            part = np.full((len(ug), nq), np.iinfo(np.int64).min)
            np.maximum.at(part, inv, sim)
            yield pd.DataFrame(
                {
                    group_col: np.repeat(ug, nq),
                    qid_col: np.tile(qids, len(ug)),
                    "max_sim": part.ravel(),
                }
            )

    vecs = cand.select(
        F.col(group_col), F.col(vec_col).cast("array<double>").alias("__vec")
    )
    partials = vecs.mapInPandas(
        _score, f"{group_col} bigint, {qid_col} bigint, max_sim bigint"
    )
    return partials.groupBy(group_col, qid_col).agg(
        F.max("max_sim").alias("max_sim")
    )


def kmeans_refine(
    embeddings: DataFrame,
    centroids: DataFrame,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cemb",
    round_digits: int = 6,
    fp_scale: int = 6,
) -> DataFrame:
    """Lloyd's k-means refinement of IVF centroids: assign → per-
    cluster mean → repeat.  The iterative-algorithm pattern on pure
    DataFrames: each iteration is one broadcast-assign (no shuffle) +
    one (cluster, dim) aggregation (one shuffle, map-side partials).

    Deterministic BY CONSTRUCTION, unlike textbook float k-means: the
    per-dimension mean is an exact bigint fixed-point sum divided as
    doubles (order- and partition-independent — registry.fixed_point
    rationale), so every iteration's centroids are bit-identical in
    any engine and the whole refinement is oracle-checkable.

    A cluster that loses all members disappears (its mean is
    undefined) — standard Lloyd behavior; K can only shrink.
    """
    fp_mult = float(10**fp_scale)
    for _ in range(iterations):
        assign = ivf_assign(
            embeddings,
            centroids,
            id_col=id_col,
            vec_col=vec_col,
            centroid_id_col=centroid_id_col,
            centroid_vec_col=centroid_vec_col,
            round_digits=round_digits,
        ).select(id_col, "cluster")
        tagged = assign.join(embeddings, id_col)
        ex = tagged.select(
            "cluster",
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
        )
        fp = F.floor(F.col("val") * F.lit(fp_mult) + F.lit(0.5)).cast("bigint")
        means = ex.groupBy("cluster", "pos").agg(
            (
                F.sum(fp).cast("double") / F.lit(fp_mult) / F.count(F.lit(1)).cast("double")
            ).alias("mval")
        )
        centroids = means.groupBy("cluster").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mval"))),
                lambda s: s["mval"],
            ).alias(centroid_vec_col)
        ).select(F.col("cluster").alias(centroid_id_col), centroid_vec_col)
    return centroids


def ivf_topk(
    embeddings: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cemb",
    query_vec_col: str = "q_embedding",
    round_digits: int = 6,
) -> DataFrame:
    """ANN top-k through IVF probes — the query-side scale path that
    pairs with :func:`ivf_assign` (index build) and
    :func:`bucketed_cosine_pairs` (all-pairs dedup).

    1. rank centroids against the query, keep the ``probes`` nearest
       (driver-free: a tiny broadcast limit),
    2. restrict the scan to vectors assigned to those buckets
       (broadcast semi-join — at scale this is partition pruning on a
       cluster-partitioned table: only probes/K of the data is read),
    3. exact cosine top-k inside the probed buckets
       (TakeOrderedAndProject).

    Deterministic approximation: rounded sims, id tie-breaks —
    reproducible in any engine, so the oracle composes the SAME
    probe pipeline and must agree bit-for-bit."""
    qvec = F.col(query_vec_col).cast("array<double>")
    cvec = F.col(centroid_vec_col).cast("array<double>")
    probe = (
        centroids.crossJoin(F.broadcast(query))
        .select(
            F.col(centroid_id_col).alias("cluster"),
            F.round(cosine_sim(cvec, qvec), round_digits).alias("qcs"),
        )
        .orderBy(F.desc("qcs"), F.asc("cluster"))
        .limit(probes)
        .select("cluster")
    )
    assign = ivf_assign(
        embeddings,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        centroid_id_col=centroid_id_col,
        centroid_vec_col=centroid_vec_col,
        round_digits=round_digits,
    ).select(id_col, "cluster")
    in_probed = assign.join(F.broadcast(probe), "cluster").select(id_col)
    cand = embeddings.join(in_probed, id_col)
    vec = F.col(vec_col).cast("array<double>")
    return (
        cand.crossJoin(F.broadcast(query))
        .select(
            F.col(id_col),
            F.round(cosine_sim(vec, qvec), round_digits).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "q_embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k of ``embeddings`` against a single
    query vector (1-row ``query`` DataFrame) — the exact baseline.

    The query side is broadcast (one row), so the scan of N embeddings
    is embarrassingly parallel: map-side cosine, then a global top-k
    (TakeOrderedAndProject — per-partition heaps, no full sort).
    Similarity is rounded before ranking and tie-broken by id so the
    result is a total order.
    """
    vec = F.col(vec_col).cast("array<double>")
    qvec = F.col(query_vec_col).cast("array<double>")
    sim = F.round(cosine_sim(vec, qvec), round_digits).alias("cos_sim")
    return (
        embeddings.crossJoin(F.broadcast(query))
        .select(F.col(id_col), sim)
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )

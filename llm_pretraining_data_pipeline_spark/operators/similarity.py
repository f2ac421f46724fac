"""Similarity search over embedding columns (array<float>).

Extension surface (SURVEY.md §2.9): brute-force cosine top-k as the exact
baseline, plus a random-hyperplane LSH bucketing as the approximate scale
path. Dot products are pure ``zip_with``/``aggregate`` HOFs — JVM-side, no
UDF, no Python in the loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against a constant query vector.

    Per-partition scan + global top-k via orderBy+limit (Spark plans this as
    TakeOrderedAndProject — partial top-k per partition, no full sort/shuffle
    of the corpus). Ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(_as_double(F.col(vec_col)), q).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
) -> DataFrame:
    """k nearest corpus rows for every query row (small query side broadcast)."""
    q = queries.select(
        F.col(query_id), _as_double(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(F.col(corpus_id), _as_double(F.col(vec_col)).alias("_cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        query_id, corpus_id, cosine(F.col("_qv"), F.col("_cv")).alias("score")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "score", "rank")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    n_cells: int = 1,
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (IVF coarse quantizer).

    Broadcast the (small) centroid table, score all pairs, keep the argmax by
    window. At 100 TB this runs once at ingest and the table is written
    ``partitionBy(cell)`` so probes prune to one cell's files.

    ``n_cells > 1`` keeps the top-n cells per vector (one row each) — the
    query-side of multi-probe search; corpus vectors are always stored under
    their single argmax cell.
    """
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    c = centroids.select(
        F.col(centroid_id), _as_double(F.col(centroid_vec)).alias("_c")
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        id_col, centroid_id, cosine(F.col("_v"), F.col("_c")).alias("_score")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_score"), F.col(centroid_id))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_cells)
        .select(id_col, F.col(centroid_id).alias("cell"))
    )


def probe_cells_for(
    centroids: DataFrame,
    query_vec: list[float],
    n_probe: int = 1,
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> list:
    """The query's ``n_probe`` max-cosine cells (driver-side: the centroid
    table is small by construction — collect is the right plan)."""
    import math

    q = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in q))
    cents = centroids.select(centroid_id, centroid_vec).collect()

    def cos_to_q(vec):
        dn = math.sqrt(sum(float(x) * float(x) for x in vec))
        if dn == 0 or qn == 0:
            return 0.0
        return sum(a * float(b) for a, b in zip(q, vec)) / (qn * dn)

    ranked = sorted(cents, key=lambda r: (-cos_to_q(r[1]), r[0]))
    return [r[0] for r in ranked[:n_probe]]


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    n_probe: int = 1,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF probe: route the query to its ``n_probe`` nearest cells, score
    only vectors assigned there. Approximate (recall grows with n_probe);
    the brute-force twin is ``cosine_topk``.

    Plan construction is ACTION-FREE (VERDICT r11): the probe cells are a
    broadcast-joined ``orderBy(limit n_probe)`` frame over the centroid
    table, not a driver-side collect — the same deterministic ranking
    (max cosine, ties by centroid id) ``probe_cells_for`` computes, but
    evaluated inside the plan. ``ivf_topk_indexed`` is the one probe that
    still collects: it needs LITERAL cell values so the partitioned scan
    prunes at the file listing, which is that function's entire point.

    ``assigned`` — a precomputed (id, cell) assignment (from ``ivf_assign``,
    typically computed ONCE at ingest). Without it the full-corpus
    assignment is recomputed INSIDE this query's plan (lazy, no driver
    action — but a per-query cost that is only acceptable as a demo); at
    scale pass the precomputed frame, or better, write the corpus with
    ``write_ivf_index`` and probe via ``ivf_topk_indexed`` so the scan
    itself prunes to the probed cells' files."""
    q = [float(x) for x in query_vec]
    qcol = F.array(*[F.lit(x) for x in q])
    if assigned is None:
        assigned = ivf_assign(df, centroids, vec_col, id_col, centroid_id, centroid_vec)
    probe = (
        centroids.select(
            F.col(centroid_id).alias("cell"),
            cosine(_as_double(F.col(centroid_vec)), qcol).alias("_s"),
        )
        .orderBy(F.desc("_s"), F.col("cell"))
        .limit(n_probe)
        .select("cell")
    )
    candidates = df.join(assigned.join(F.broadcast(probe), "cell"), id_col)
    return (
        candidates.select(
            F.col(id_col), cosine(_as_double(F.col(vec_col)), qcol).alias("score")
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def write_ivf_index(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    mode: str = "overwrite",
) -> None:
    """Materialise the IVF index: assign every vector once, write the corpus
    ``partitionBy(cell)`` so probes read only the probed cells' files
    (partition pruning — the 100 TB ingest-time half of IVF)."""
    assigned = ivf_assign(df, centroids, vec_col, id_col, centroid_id, centroid_vec)
    (
        df.join(assigned, id_col)
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark,
    index_path: str,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    n_probe: int = 1,
) -> DataFrame:
    """Probe a ``write_ivf_index`` table: ``cell`` is a partition column, so
    the ``isin`` filter prunes at the file listing — the scan never touches
    unprobed cells (assert PartitionFilters in .explain)."""
    q = [float(x) for x in query_vec]
    probe_cells = probe_cells_for(centroids, q, n_probe, centroid_id, centroid_vec)
    qcol = F.array(*[F.lit(x) for x in q])
    corpus = spark.read.parquet(index_path).filter(F.col("cell").isin(probe_cells))
    return (
        corpus.select(
            F.col(id_col), cosine(_as_double(F.col(vec_col)), qcol).alias("score")
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def train_ivf_centroids(
    df: DataFrame,
    init_centroids: DataFrame,
    n_iter: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    round_dp: int = 6,
) -> DataFrame:
    """Lloyd (k-means) refinement of the IVF coarse quantizer, as pure
    DataFrame ops: broadcast-centroid argmax assignment → element-wise mean
    per cell (posexplode + groupBy — the shuffle rows are (cell, pos, val)
    triples, narrow at any scale) → next round. Cells that lose every vector
    keep their previous centroid. Deterministic: the argmax breaks ties by
    centroid id and the means are rounded to ``round_dp`` so distributed
    summation order cannot leak into the result.

    Each round collects the k×d centroid matrix to the driver (tiny by
    construction) — this truncates the iteration lineage exactly like the
    connected-components loop. At 100 TB the standard practice applies:
    train on a 1-10% SAMPLE of the corpus (`df.sample(...)`), then assign
    the full corpus once with ``write_ivf_index``; the trainer itself does
    not need the full corpus to place coarse cells.
    """
    if n_iter < 1:
        raise ValueError(f"train_ivf_centroids needs n_iter >= 1, got {n_iter}")
    from pyspark.sql import types as T

    spark = df.sparkSession
    id_field = init_centroids.schema[centroid_id]
    out_schema = T.StructType(
        [
            T.StructField(centroid_id, id_field.dataType, id_field.nullable),
            T.StructField(centroid_vec, T.ArrayType(T.DoubleType()), True),
        ]
    )
    cents = init_centroids.select(
        F.col(centroid_id), _as_double(F.col(centroid_vec)).alias(centroid_vec)
    )
    for _ in range(n_iter):
        assigned = ivf_assign(df, cents, vec_col, id_col, centroid_id, centroid_vec)
        members = (
            df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
            .join(assigned, id_col)
            .select("cell", F.posexplode("_v").alias("_i", "_x"))
        )
        means = members.groupBy("cell", "_i").agg(
            F.round(F.avg("_x"), round_dp).alias("_m")
        )
        new_vecs = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("_i", "_m"))).alias("_s"))
            .select(
                F.col("cell").alias(centroid_id),
                F.transform("_s", lambda s: s["_m"]).alias("_new"),
            )
        )
        stepped = cents.join(new_vecs, centroid_id, "left").select(
            centroid_id,
            F.coalesce(F.col("_new"), F.col(centroid_vec)).alias(centroid_vec),
        )
        cents = spark.createDataFrame(stepped.collect(), schema=out_schema)
    return cents


def random_hyperplanes(dim: int, n_planes: int = 8, seed: int = 7) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of the vector against fixed hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(vec, p) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only the query's hyperplane bucket.

    At 100 TB the bucket column is computed once at ingest and the table is
    partitioned by it — the probe then reads a single partition (partition
    pruning) instead of scanning the corpus.
    """
    dim = len(query_vec)
    planes = random_hyperplanes(dim, n_planes, seed)
    qv = [float(x) for x in query_vec]
    q_bucket = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(qv, plane)) >= 0:
            q_bucket += 1 << i

    q = F.array(*[F.lit(x) for x in qv])
    bucketed = df.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_bucket", hyperplane_bucket(F.col("_v"), planes))
    return (
        bucketed.filter(F.col("_bucket") == q_bucket)
        .select(F.col(id_col), cosine(F.col("_v"), q).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def ivf_recall(
    df: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "query_id",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    n_probe: int = 1,
) -> DataFrame:
    """Recall@k of the ``n_probe``-cell IVF path against exact brute force,
    per query — the standard ANN index-quality audit, run on a sampled query
    set before trusting an index at scale (sweep n_probe to pick the
    recall/scan-cost point; each extra probe reads one more cell partition).

    One lazy plan, no driver loops: exact top-k via the broadcast kNN join;
    IVF top-k by assigning queries to their max-cosine cell (same broadcast
    centroid argmax as ``ivf_assign``) and scoring only same-cell corpus
    vectors; recall = |exact ∩ ivf| / k. The corpus is scanned twice (exact
    pass + assigned pass) — at 100 TB the exact pass is why the audit runs on
    a SAMPLE of queries, and the assigned side comes precomputed from
    ``write_ivf_index``.
    """
    exact = knn_join(queries, df, k, vec_col, query_id, id_col).select(
        query_id, id_col
    )
    assigned = ivf_assign(df, centroids, vec_col, id_col, centroid_id, centroid_vec)
    qcells = ivf_assign(
        queries, centroids, vec_col, query_id, centroid_id, centroid_vec,
        n_cells=n_probe,
    )
    q = queries.select(F.col(query_id), _as_double(F.col(vec_col)).alias("_qv")).join(
        qcells, query_id
    )
    cand = (
        F.broadcast(q)
        .join(assigned, "cell")
        .join(df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_cv")), id_col)
        .select(query_id, id_col, cosine(F.col("_qv"), F.col("_cv")).alias("_score"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("_score"), F.col(id_col))
    ivf_hits = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id, id_col)
    )
    overlap = (
        exact.join(ivf_hits, [query_id, id_col])
        .groupBy(query_id)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    n_hit = F.coalesce("n_hit", F.lit(0)).cast("long")
    return (
        queries.select(query_id)
        .join(overlap, query_id, "left")
        .select(
            query_id,
            n_hit.alias("n_hit"),
            F.round(n_hit.cast("double") / float(k), 6).alias("recall_at_k"),
        )
        .orderBy(query_id)
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance between two (double) vectors — linear HOF fold,
    deterministic per row (mirrored by oracle_fragments.l2sq_double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_subspaces(vec: Column, m: int, dim: int) -> Column:
    """Split a ``dim``-vector into ``m`` contiguous subvectors (the PQ
    decomposition, Jégou et al. 2011): array of structs (sub, subvec).
    Pure expression — pairs with posexplode for the narrow encode join.
    ``dim`` must divide evenly by ``m``: a silent remainder would drop the
    trailing dimensions from every distance."""
    if dim % m != 0:
        raise ValueError(
            f"PQ subspace split needs dim % m == 0, got dim={dim}, m={m} "
            f"(the last {dim % m} dimensions would be silently ignored)"
        )
    d = dim // m
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("sub"),
                F.transform(
                    F.slice(vec, j * d + 1, d), lambda x: x.cast("double")
                ).alias("subvec"),
            )
            for j in range(m)
        ]
    )


def pq_codebooks_first_k(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ codebooks from the first ``k`` vectors' subvectors — the same
    arbitrary-but-deterministic init convention as the IVF first-8 coarse
    quantizer (train with Lloyd per subspace for production; the codebook
    table is (m×k) rows and broadcasts regardless).

    Returns (sub, code_id, code_vec)."""
    first = df.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("code_id"),
        pq_subspaces(F.col(vec_col), m, dim).alias("_subs"),
    )
    return first.select(
        "code_id", F.explode("_subs").alias("_s")
    ).select(F.col("_s.sub").alias("sub"), "code_id", F.col("_s.subvec").alias("code_vec"))


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector as ``m`` codebook ids (argmin squared-L2 per
    subspace, ties to the lower code id). Output: (id, codes array<int>,
    ordered by subspace).

    Scale shape: the vector fans out to m NARROW (id, sub, subvec) rows,
    joins the broadcast (m×k)-row codebook, and the argmin window
    partitions by (id, sub) — state per task is k rows. The full-width
    vector never re-shuffles; 100 TB encode is one broadcast-join pass
    writing back k log2(k)-bit codes per subspace (the 8/64ths compression
    that makes PQ indexes RAM-resident)."""
    subs = df.select(
        F.col(id_col), F.posexplode(pq_subspaces(F.col(vec_col), m, dim))
    ).select(id_col, F.col("col.sub").alias("sub"), F.col("col.subvec").alias("subvec"))
    scored = subs.join(F.broadcast(codebooks), "sub").withColumn(
        "_d", l2sq(F.col("subvec"), F.col("code_vec"))
    )
    w = Window.partitionBy(id_col, "sub").orderBy(F.col("_d"), F.col("code_id"))
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "sub", "code_id")
    )
    return (
        best.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code_id"))).alias("_c"))
        .select(
            id_col,
            F.transform("_c", lambda c: c["code_id"].cast("int")).alias("codes"),
        )
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    dim: int = 64,
    query_id: str = "query_id",
    query_vec: str = "qv",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query build the
    (m×n_codes) distance table to the codebook entries (one broadcast
    cross of two tiny frames), then approximate each corpus vector's
    distance as the SUM of its codes' table entries — the corpus side
    touches only the (id, codes) table, never original vectors.

    Determinism: the m per-subspace entries are summed in subspace order
    via a sorted-array fold (a groupBy sum of doubles would be
    partitioning-order-dependent); ties broken by id. Returns
    (query_id, vec_id, adc_dist, rank<=k)."""
    qsubs = queries.select(
        F.col(query_id), F.posexplode(pq_subspaces(F.col(query_vec), m, dim))
    ).select(query_id, F.col("col.sub").alias("sub"), F.col("col.subvec").alias("qsub"))
    table = qsubs.join(F.broadcast(codebooks), "sub").select(
        query_id, "sub", "code_id", l2sq(F.col("qsub"), F.col("code_vec")).alias("_d")
    )
    exploded = codes.select(
        F.col(id_col), F.posexplode("codes").alias("sub", "code_id")
    )
    per_sub = exploded.join(F.broadcast(table), ["sub", "code_id"]).select(
        query_id, id_col, "sub", "_d"
    )
    dist = (
        per_sub.groupBy(query_id, id_col)
        .agg(F.array_sort(F.collect_list(F.struct("sub", "_d"))).alias("_t"))
        .select(
            query_id,
            id_col,
            F.aggregate(
                F.col("_t"), F.lit(0.0), lambda acc, e: acc + e["_d"]
            ).alias("adc_dist"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("adc_dist"), F.col(id_col))
    return (
        dist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "adc_dist", F.col("rank").cast("int"))
    )


def ivf_pq_topk(
    codes: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    m: int = 4,
    dim: int = 64,
    query_id: str = "query_id",
    query_vec: str = "qv",
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """IVF-PQ composition — the FAISS ``IVFPQ`` index shape (Jégou et al.
    2011 §V), the standard billion-vector ANN deployment: the IVF coarse
    quantizer prunes each query to its ``n_probe`` best cells, and ADC
    scores ONLY the pruned cells' PQ codes — neither full vectors nor the
    full code table are touched per query.

    Inputs are the ingest-time artifacts the separate operators already
    build: ``assigned`` from ``ivf_assign`` (or a ``write_ivf_index``
    table), ``codes`` from ``pq_encode``, ``codebooks`` from the trainer.

    Scale shape: probed cells come from a tiny queries × broadcast-
    centroids cross (k_c rows per query); candidates are ONE equi-join of
    (query, cell) against the (id, cell) assignment — never a cartesian;
    the ADC table is (q × m × k_codes) rows and broadcasts; per-candidate
    distance is the m-term subspace-ORDERED fold (bit-stable, as
    ``pq_adc_topk``). Returns (query_id, vec_id, adc_dist, rank<=k).
    """
    qc = queries.crossJoin(F.broadcast(centroids)).select(
        F.col(query_id),
        F.col(centroid_id).alias("cell"),
        cosine(
            _as_double(F.col(query_vec)), _as_double(F.col(centroid_vec))
        ).alias("_s"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("_s"), F.col("cell"))
    probes = (
        qc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_probe)
        .select(query_id, "cell")
    )
    # distinct: with a multi-cell assignment (ivf_assign n_cells>1, a valid
    # input per the docstring) a candidate reachable via two probed cells
    # would otherwise appear twice, and codes.join(cand) downstream would
    # duplicate every subspace term — doubling adc_dist and corrupting the
    # ranking. Candidate pairs are unique by construction after this.
    cand = (
        probes.join(assigned.select(F.col(id_col), "cell"), "cell")
        .select(query_id, id_col)
        .distinct()
    )

    qsubs = queries.select(
        F.col(query_id), F.posexplode(pq_subspaces(F.col(query_vec), m, dim))
    ).select(
        query_id, F.col("col.sub").alias("sub"), F.col("col.subvec").alias("qsub")
    )
    table = qsubs.join(F.broadcast(codebooks), "sub").select(
        query_id, "sub", "code_id",
        l2sq(F.col("qsub"), F.col("code_vec")).alias("_d"),
    )
    exploded = codes.join(cand, id_col).select(
        query_id, F.col(id_col), F.posexplode("codes").alias("sub", "code_id")
    )
    per_sub = exploded.join(
        F.broadcast(table), [query_id, "sub", "code_id"]
    ).select(query_id, id_col, "sub", "_d")
    dist = (
        per_sub.groupBy(query_id, id_col)
        .agg(F.array_sort(F.collect_list(F.struct("sub", "_d"))).alias("_t"))
        .select(
            query_id,
            id_col,
            F.aggregate(
                F.col("_t"), F.lit(0.0), lambda acc, e: acc + e["_d"]
            ).alias("adc_dist"),
        )
    )
    w2 = Window.partitionBy(query_id).orderBy(F.col("adc_dist"), F.col(id_col))
    return (
        dist.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "adc_dist", F.col("rank").cast("int"))
    )


def truncated_recall(
    df: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: str = "query_id",
) -> DataFrame:
    """Matryoshka truncation audit (Kusupati et al. 2022 MRL): recall@k of
    brute top-k computed on only the FIRST ``dims`` dimensions vs the
    full-vector exact top-k, per query — the measurement behind running a
    cheap truncated-dimension first stage at scale (half the dims = half
    the scan bytes and FLOPs; this audit says what that buys back in
    recall before committing the index layout).

    Truncation is ``F.slice`` — a zero-Python projection fused into the
    scan; both passes are the broadcast kNN join (TakeOrderedAndProject
    per query, never a global sort). Like ``ivf_recall``, the exact pass
    is why the audit runs on a SAMPLED query set.
    """
    if dims < 1:
        raise ValueError(f"truncated_recall: dims={dims} must be >= 1")
    exact = knn_join(queries, df, k, vec_col, query_id, id_col).select(
        query_id, id_col
    )
    tq = queries.select(
        F.col(query_id), F.slice(F.col(vec_col), 1, dims).alias(vec_col)
    )
    tc = df.select(
        F.col(id_col), F.slice(F.col(vec_col), 1, dims).alias(vec_col)
    )
    trunc = knn_join(tq, tc, k, vec_col, query_id, id_col).select(
        query_id, id_col
    )
    overlap = (
        exact.join(trunc, [query_id, id_col])
        .groupBy(query_id)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    n_hit = F.coalesce("n_hit", F.lit(0)).cast("long")
    return (
        queries.select(query_id)
        .join(overlap, query_id, "left")
        .select(
            query_id,
            n_hit.alias("n_hit"),
            F.round(n_hit.cast("double") / F.lit(float(k)), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy(query_id)
    )

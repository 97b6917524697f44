"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set,
scan the corpus once, rank per query with a window.  At 100 TB the
corpus side stays partitioned (never collected/shuffled); cost is one
scan × |Q| dot products, all inside codegen'd SQL expressions.

Scale path: IVF — assign every vector to its nearest centroid (one
broadcast join against k centroids), then search only within the
probed cluster(s): turns full scans into cluster-pruned scans.  An
LSH-bucketed variant (random-hyperplane signs) gives the same effect
for cosine similarity without training.

All arithmetic casts float32 → double first so results are
reproducible across engines (and match the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from legate_dataframe_spark.core.caching import tracked_persist
from legate_dataframe_spark.core.partitioning import widen_partitions


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per query vector (self excluded).

    Ranking uses the ROUNDED similarity + id tiebreak so results are
    deterministic and engine-portable.
    """
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = widen_partitions(corpus).select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id",
                F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (IVF build
    step).  Centroids are broadcast; one corpus scan, no shuffle of the
    corpus itself."""
    cen = centroids.select(F.col(centroid_id_col).alias("cent_id"),
                           F.col(vec_col).alias("cent_vec"))
    scored = (
        widen_partitions(corpus).select(F.col(id_col), F.col(vec_col))
        .crossJoin(F.broadcast(cen))
        .select(id_col,
                "cent_id",
                F.round(cosine(F.col(vec_col), F.col("cent_vec")), 6).alias("cos_sim"))
    )
    w = W.partitionBy(id_col).orderBy(F.col("cos_sim").desc(), F.col("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("cent_id").alias(centroid_id_col), "cos_sim")
    )


def kmeans_refine(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means on the embedding corpus → (centroid_id,
    embedding) after ``n_iter`` iterations from the k lowest-id seed
    vectors (deterministic init — no RNG, reproducible anywhere).

    Each iteration is fully distributed: one broadcast-centroid
    assignment pass over the corpus (``ivf_assign``: no corpus
    shuffle), then an element-wise mean via posexplode + groupBy
    (shuffles k×dim rows, not the corpus).  ``localCheckpoint``
    truncates lineage per iteration like pipeline/components.py.
    Means are rounded to 6 decimals each iteration so the refinement
    is bit-reproducible across engines (the DuckDB oracle unrolls the
    same iterations).  Clusters that lose all members drop out
    (k shrinks) rather than being re-seeded — deterministic.
    """
    cen = (corpus.orderBy(id_col).limit(k)
           .select(F.col(id_col).alias("centroid_id"),
                   _to_double(F.col(vec_col)).alias(vec_col)))
    for _ in range(n_iter):
        assigned = ivf_assign(corpus, cen, id_col, vec_col)
        joined = assigned.select(id_col, "centroid_id") \
            .join(corpus.select(id_col, vec_col), id_col)
        expl = joined.select(
            "centroid_id",
            F.posexplode(_to_double(F.col(vec_col))).alias("pos", "val"))
        means = (expl.groupBy("centroid_id", "pos")
                 .agg(F.round(F.avg("val"), 6).alias("m")))
        cen = (means.groupBy("centroid_id")
               .agg(F.transform(
                   F.array_sort(F.collect_list(F.struct("pos", "m"))),
                   lambda s: s["m"]).alias(vec_col)))
        cen = cen.localCheckpoint(eager=True)
    return cen


def ivf_search(
    corpus_assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """ANN search: probe the ``n_probe`` nearest clusters per query,
    brute-force within them.  ``corpus_assigned`` = corpus joined with
    its ``ivf_assign`` output (carries centroid_id)."""
    q_probe = (
        ivf_assign(queries, centroids, id_col, vec_col, centroid_id_col)
        .select(F.col(id_col).alias("q_id"),
                F.col(centroid_id_col).alias("cent_id"))
    ) if n_probe == 1 else _probe_n(queries, centroids, n_probe, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    cand = (
        corpus_assigned.join(q_probe.withColumnRenamed("cent_id", centroid_id_col),
                             on=centroid_id_col)
        .join(F.broadcast(q), on="q_id")
        .filter(F.col(id_col) != F.col("q_id"))
        .select("q_id", F.col(id_col).alias("c_id"),
                F.round(cosine(F.col("q_vec"), F.col(vec_col)), 6).alias("cos_sim"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id"))
    return cand.withColumn("rank", F.row_number().over(w).cast("long")) \
               .filter(F.col("rank") <= k)


def _probe_n(queries, centroids, n_probe, id_col, vec_col):
    cen = centroids.select(F.col("centroid_id").alias("cent_id"),
                           F.col(vec_col).alias("cent_vec"))
    scored = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col))
        .crossJoin(F.broadcast(cen))
        .select("q_id", "cent_id",
                F.round(cosine(F.col(vec_col), F.col("cent_vec")), 6).alias("cs"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cs").desc(), F.col("cent_id"))
    return scored.withColumn("rn", F.row_number().over(w)) \
                 .filter(F.col("rn") <= n_probe).select("q_id", "cent_id")


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim.

    md5-derived (no RNG state) so the SAME planes can be embedded as
    literals in any engine — the DuckDB oracle regenerates them from
    this function and gets bit-identical sign bits.
    """
    import hashlib

    out = []
    for j in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"hp:{j}:{d}".encode()).hexdigest()[:8]
            row.append(round(int(h, 16) / 0xFFFFFFFF * 2.0 - 1.0, 6))
        out.append(row)
    return out


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs: random-hyperplane LSH candidates,
    exact-verified with cosine ≥ threshold.

    Each vector gets ``n_planes`` sign bits, grouped into ``bands``
    chunks; candidates are pairs agreeing on at least one full chunk
    (equi-join per band — buckets stay small, no all-pairs).  This is
    approximate by design (standard SimHash-for-cosine recall); the
    oracle reproduces the identical planes so results still hash-match.
    """
    planes = hyperplanes(n_planes, dim)
    per_band = n_planes // bands
    v = _to_double(F.col(vec_col))
    bits = [
        F.when(F.round(dot(v, F.array(*[F.lit(x) for x in p])), 6) >= 0, 1)
        .otherwise(0)
        for p in planes
    ]
    band_vals = [
        F.struct(F.lit(b).alias("band"),
                 sum(bits[b * per_band + i] * (1 << i) for i in range(per_band))
                 .alias("bv"))
        for b in range(bands)
    ]
    # n_planes dot products per vector feed both self-join sides —
    # persist so the sign bits are computed once (spill-capable).
    base = tracked_persist(widen_partitions(embeddings).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        F.explode(F.array(*band_vals)).alias("bk"),
    ).select("id", "vec", F.col("bk.band").alias("band"),
             F.col("bk.bv").alias("bv")))
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(r, (F.col("l.band") == F.col("r.band"))
               & (F.col("l.bv") == F.col("r.bv"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                F.round(cosine(F.col("l.vec"), F.col("r.vec")), 6)
                .alias("cos_sim"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_norms(embeddings: DataFrame, vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label mean L2 norm — sanity stats over an embedding table."""
    norm = l2_norm(_to_double(F.col(vec_col)))
    return (
        embeddings.select(F.col(label_col), norm.alias("norm"))
        .groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("norm"), 6).alias("avg_norm"))
    )

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


def rp_signs(in_dim: int, out_dim: int) -> list[list[int]]:
    """Deterministic ±1 random-projection matrix (Achlioptas-style
    sign projection): sign(j,i) from the md5 parity of ``"rp:j:i"`` —
    reproducible in any engine/language, so the DuckDB oracle embeds
    the SAME matrix as SQL literals."""
    import hashlib

    return [[1 if int(hashlib.md5(f"rp:{j}:{i}".encode())
                      .hexdigest()[:8], 16) % 2 == 0 else -1
             for i in range(in_dim)]
            for j in range(out_dim)]


def project_embeddings(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss compression: project ``in_dim`` vectors to
    ``out_dim`` via a fixed ±1 sign matrix — pairwise cosines are
    approximately preserved at a 4× (64→16) storage/compute saving, the
    standard pre-filter in front of an exact re-rank.

    Each output component rounds at 6 decimals so both engines hold
    bit-identical projected vectors (summation order differs between
    Spark's sequential fold and DuckDB's list_sum; rounding absorbs
    the ~1e-14 divergence).  Pure narrow map — no shuffle, no Python.
    """
    signs = rp_signs(in_dim, out_dim)
    v = _to_double(F.col(vec_col))
    comps = [
        F.round(dot(v, F.array(*[F.lit(float(s)) for s in row])), 6)
        for row in signs
    ]
    return df.withColumn(out_col, F.array(*comps))


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
        # assignment carries the vector through in one pass — the old
        # ivf_assign + id re-join shuffled the corpus twice PER
        # ITERATION (review r03); tie semantics are identical
        joined = assign_with_payload(corpus, cen, [vec_col],
                                     id_col, vec_col)
        expl = joined.select(
            "centroid_id",
            F.posexplode(_to_double(F.col(vec_col))).alias("pos", "val"))
        # round(avg,6) RETAINED (r06 boundary-flap audit): the per-
        # iteration rounding IS the cross-engine reproducibility
        # mechanism — the oracle unrolls the same rounded iterations,
        # and an integerized mean would change every downstream
        # centroid/assignment value.  Residual risk (a mean landing
        # within an ulp of a .5e-6 boundary) is caught pre-driver by
        # the per-round full-registry strict_parity sweep.
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
    """Per-label L2-norm stats over an embedding table.

    Integer-exact evidence (r06 boundary-flap audit): each row's norm
    is engine-deterministic (sequential IEEE fold over the array +
    sqrt), so Σ round(norm·1e6) as BIGINT is order-invariant, where
    round(avg(norm),6) could flap a half-ulp with summation order
    (knn_classify's r04 class).  mean norm = norm_micro_sum/n/1e6."""
    norm = l2_norm(_to_double(F.col(vec_col)))
    return (
        embeddings.select(F.col(label_col), norm.alias("norm"))
        .groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.round(F.col("norm") * 1e6).cast("long"))
             .alias("norm_micro_sum"))
    )


# ---------------------------------------------------------------- product
# quantization (Jégou et al., "Product Quantization for Nearest Neighbor
# Search") — the compact-code ANN family the reference lacks entirely.

def _subvectors(df: DataFrame, m: int, dim: int,
                id_col: str, vec_col: str) -> DataFrame:
    """Explode each vector into m contiguous subvectors →
    (id, sub_id, sv).  One narrow map, no shuffle."""
    sd = dim // m
    subs = F.array(*[
        F.struct(F.lit(s).alias("sub_id"),
                 F.slice(_to_double(F.col(vec_col)), s * sd + 1, sd).alias("sv"))
        for s in range(m)
    ])
    return (df.select(F.col(id_col).alias("id"), F.explode(subs).alias("b"))
            .select("id", F.col("b.sub_id").alias("sub_id"),
                    F.col("b.sv").alias("sv")))


def _l2sq(a: Column, b: Column) -> Column:
    """Rounded squared euclidean distance (round 6 ⇒ the DuckDB oracle
    reproduces the exact value, same policy as the kmeans oracle)."""
    return F.round(F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v), 6)


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    k: int = 4,
    dim: int = 64,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace codebooks → (sub_id, cid, cv array<double>).

    All m subspaces train in ONE distributed Lloyd's pass per
    iteration (grouped by sub_id), not m sequential jobs: assignment
    is a broadcast join of the exploded subvector frame against the
    m×k codebook rows; means shuffle m×k×(dim/m) scalar rows — never
    the corpus.  Seeds = subvectors of the k lowest-id vectors
    (deterministic, no RNG — reproducible in any engine; the registry
    oracle encodes this as ``WHERE vec_id < k``, equivalent only on
    the testdata's dense-from-0 ids — same convention as the r01
    kmeans oracle).
    """
    sub = _subvectors(widen_partitions(corpus), m, dim, id_col, vec_col)
    cen = _subvectors(corpus.orderBy(id_col).limit(k), m, dim,
                      id_col, vec_col) \
        .select("sub_id", F.col("id").alias("cid"), F.col("sv").alias("cv"))
    for _ in range(n_iter):
        assigned = _pq_assign(sub, cen)
        expl = (assigned.join(sub, ["id", "sub_id"])
                .select("sub_id", "cid",
                        F.posexplode("sv").alias("pos", "val")))
        # round(avg,6) RETAINED — same rationale as kmeans_refine: the
        # rounding is the codebook's cross-engine reproducibility
        # contract (oracle unrolls it); flap window covered by the
        # per-round strict_parity sweep.
        means = (expl.groupBy("sub_id", "cid", "pos")
                 .agg(F.round(F.avg("val"), 6).alias("mv")))
        cen = (means.groupBy("sub_id", "cid")
               .agg(F.transform(
                   F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                   lambda s: s["mv"]).alias("cv")))
        cen = cen.localCheckpoint(eager=True)
    return cen


def _pq_assign(sub: DataFrame, cen: DataFrame) -> DataFrame:
    """Nearest codebook entry per (id, sub_id) by squared L2
    (broadcast codebook; ties break on lowest cid)."""
    scored = (sub.join(F.broadcast(cen), "sub_id")
              .withColumn("d2", _l2sq(F.col("sv"), F.col("cv"))))
    w = W.partitionBy("id", "sub_id").orderBy("d2", "cid")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", "sub_id", "cid"))


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus → compact codes (id, sub_id, code): m small ints per
    vector instead of dim floats — the 8-32× footprint cut that makes
    billion-vector search fit a cluster's memory."""
    sub = _subvectors(widen_partitions(corpus), m, dim, id_col, vec_col)
    return _pq_assign(sub, codebooks) \
        .select("id", "sub_id", F.col("cid").alias("code"))


def pq_adc_search(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    topk: int = 5,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: per query build the m×k distance
    table against the codebooks (tiny: |q|·m·k rows), then one equi-
    join with the corpus CODES on (sub_id, code) and a sum per
    (q_id, c_id).  Raw corpus vectors are never touched at query time
    — work scales with |codes|, not |corpus|·dim."""
    qsub = _subvectors(queries, m, dim, id_col, vec_col) \
        .select(F.col("id").alias("q_id"), "sub_id", "sv")
    dtab = (qsub.join(F.broadcast(codebooks), "sub_id")
            .select("q_id", "sub_id", F.col("cid").alias("code"),
                    _l2sq(F.col("sv"), F.col("cv")).alias("d2")))
    # dtab is |q|·m·k rows — broadcast it so the (huge) code table
    # never shuffles; same query-side-small assumption as
    # brute_force_topk
    scored = (codes.withColumnRenamed("id", "c_id")
              .join(F.broadcast(dtab), ["sub_id", "code"])
              .groupBy("q_id", "c_id")
              .agg(F.round(F.sum("d2"), 6).alias("approx_d2")))
    scored = scored.filter(F.col("q_id") != F.col("c_id"))
    w = W.partitionBy("q_id").orderBy("approx_d2", "c_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .select("q_id", "c_id", "approx_d2",
                    F.col("rank").cast("long").alias("rank")))


def ivfpq_search(
    corpus: DataFrame,
    coarse_centroids: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    topk: int = 5,
    n_probe: int = 2,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: coarse cluster pruning + compact-code ADC — the
    FAISS-style index shape, composed from ``ivf_assign`` (cosine
    coarse quantizer) and the PQ pieces.

    Query-time work = |probed clusters' codes| × m lookups: the coarse
    probe cuts the candidate set ~(n_probe/n_clusters)×, and ADC never
    touches raw corpus vectors.  Both pruning structures ride
    broadcast-side; the corpus-sized code table never shuffles.
    """
    codes = pq_encode(corpus, codebooks, m, dim, id_col, vec_col) \
        .withColumnRenamed("id", "c_id")
    assign = ivf_assign(corpus, coarse_centroids, id_col, vec_col) \
        .select(F.col(id_col).alias("c_id"),
                F.col("centroid_id").alias("cent_id"))
    probe = _probe_n(queries, coarse_centroids, n_probe, id_col, vec_col)
    qsub = _subvectors(queries, m, dim, id_col, vec_col) \
        .select(F.col("id").alias("q_id"), "sub_id", "sv")
    dtab = (qsub.join(F.broadcast(codebooks), "sub_id")
            .select("q_id", "sub_id", F.col("cid").alias("code"),
                    _l2sq(F.col("sv"), F.col("cv")).alias("d2")))
    # candidate codes: corpus rows whose coarse cluster is probed by q
    cand = (codes.join(assign, "c_id")
            .join(F.broadcast(probe), "cent_id")
            .select("q_id", "c_id", "sub_id", "code"))
    scored = (cand.join(F.broadcast(dtab), ["q_id", "sub_id", "code"])
              .groupBy("q_id", "c_id")
              .agg(F.round(F.sum("d2"), 6).alias("approx_d2")))
    scored = scored.filter(F.col("q_id") != F.col("c_id"))
    w = W.partitionBy("q_id").orderBy("approx_d2", "c_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .select("q_id", "c_id", "approx_d2",
                    F.col("rank").cast("long").alias("rank")))


def semantic_dedup(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the corpus, then call a vector a duplicate when some
    LOWER-id vector in the SAME cluster has cosine ≥ ``threshold``
    (greedy keep-lowest-id — deterministic, engine-independent).
    Output: the removed vectors, each with ``dup_of`` = its lowest-id
    qualifying neighbor (the retained representative it collapses
    into) and the cosine to it.

    Shape at scale: the defining trick of SemDeDup is that pairwise
    comparison happens only WITHIN a cluster — assignment is one
    broadcast-centroid pass (no corpus shuffle, see ``ivf_assign``),
    and the pair join is an equi-join keyed by centroid_id, never
    all-pairs.  Work is Σ|cluster|² instead of N²; at 100 TB you raise
    k so clusters stay bounded (k ≈ N/10k keeps buckets ~10k rows).
    """
    # single-pass assignment CARRYING the vector (assign_with_payload:
    # one corpus shuffle; ivf_assign + an id re-join would shuffle the
    # corpus twice, review r03), plus each vector's L2 norm computed
    # ONCE — the pair stage below evaluates Σ|cluster|² comparisons,
    # and recomputing both norms per pair (what cosine() does) would
    # triple its FLOPs.  dot/(norm_l·norm_r) with reused norms is
    # bit-identical to cosine(): same operations, just not repeated.
    assigned = tracked_persist(
        assign_with_payload(embeddings, centroids, [vec_col],
                            id_col, vec_col)
        .select(F.col(id_col).alias("id"), "centroid_id",
                _to_double(F.col(vec_col)).alias("vec"))
        .withColumn("nrm", l2_norm(F.col("vec"))))
    l, r = assigned.alias("l"), assigned.alias("r")
    pairs = (
        l.join(r, (F.col("l.centroid_id") == F.col("r.centroid_id"))
               & (F.col("l.id") < F.col("r.id")))
        .select(F.col("r.id").alias("dup_id"),
                F.col("r.centroid_id").alias("centroid_id"),
                F.col("l.id").alias("keep_id"),
                F.round(dot(F.col("l.vec"), F.col("r.vec"))
                        / (F.col("l.nrm") * F.col("r.nrm")), 6)
                .alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    w = W.partitionBy("dup_id").orderBy(F.col("keep_id"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("dup_id").alias(id_col), "centroid_id",
                    F.col("keep_id").alias("dup_of"), "cos_sim"))


def sq_quantize(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar (int8-style) quantization: per-DIMENSION corpus min/max,
    then code_i = min(255, floor((v_i − mn_i)/(mx_i − mn_i)·256))
    (floor, not round — identical semantics in every engine; a
    constant dimension maps to 0).  Returns (id, codes array<int>,
    original vector).  The per-dim stats table is dim-sized, rides a
    broadcast; the corpus is one narrow map — this is the 4×
    compression pass that makes brute-force scans at 100 TB read 25%
    of the bytes.
    """
    expl = widen_partitions(embeddings).select(
        F.col(id_col),
        F.posexplode(_to_double(F.col(vec_col))).alias("pos", "val"))
    # dim-sized (1 row); persist so corpus/query branches both reading
    # the quantized frame don't re-scan the corpus for the stats
    stats = tracked_persist(
        expl.groupBy("pos")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
        .groupBy()
        .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "mn"))),
                 lambda s: s["mn"]).alias("mns"),
             F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                 lambda s: s["mx"]).alias("mxs")))
    v = _to_double(F.col(vec_col))
    code = F.zip_with(
        v, F.sequence(F.lit(0), F.size(v) - 1),
        lambda x, i: F.when(
            F.col("mxs")[i] > F.col("mns")[i],
            F.least(F.lit(255), F.floor((x - F.col("mns")[i])
                                        / (F.col("mxs")[i] - F.col("mns")[i])
                                        * 256))).otherwise(F.lit(0))
        .cast("int"))
    return (embeddings.crossJoin(F.broadcast(stats))
            .select(F.col(id_col), code.alias("codes"), F.col(vec_col)))


def int_dot(a: Column, b: Column) -> Column:
    """BIGINT dot product of two integer-code arrays — the quantized
    counterpart of ``dot()``; pure int64 arithmetic, bit-exact in any
    engine (shared by sq_topk and ivf_sq_search so overflow/tie fixes
    can never diverge between the full-scan and pruned paths)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def _per_query_topk(cand: DataFrame, score_col: str, k: int) -> DataFrame:
    """Deterministic per-query top-k: (score desc, c_id asc) tiebreak."""
    w = W.partitionBy("q_id").orderBy(F.col(score_col).desc(), F.col("c_id"))
    return (cand.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))


def assign_with_payload(
    corpus: DataFrame,
    centroids: DataFrame,
    payload_cols: list[str],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment that CARRIES payload columns to the
    output in the same pass: argmax over the k centroid scores via a
    map-side-combined groupBy (max of a (cos, −cent_id) struct — the
    partial aggregate collapses the ×k scored rows to one per vector
    BEFORE the shuffle), so the corpus crosses the wire exactly once,
    payload included.  ``ivf_assign`` + a corpus-sized re-join needs
    two corpus shuffles for the same result (review r03); tie
    semantics are identical (rounded cosine desc, centroid id asc).
    Payload values ride ``F.first`` — deterministic because every
    scored copy of a vector carries the same payload.

    CONTRACT: ``id_col`` must be unique in ``corpus`` (the vector-id
    invariant every table in this engine maintains).  Duplicate ids
    would collapse to ONE arbitrarily-chosen payload here, where the
    old assign-then-rejoin shape preserved every row — if a caller
    ever feeds duplicate ids, dedupe first (review r03).
    """
    cen = centroids.select(F.col("centroid_id").alias("cent_id"),
                           F.col(vec_col).alias("cent_vec"))
    sc = F.struct(
        F.round(cosine(F.col(vec_col), F.col("cent_vec")), 6).alias("cs"),
        (-F.col("cent_id")).alias("neg"))
    scored = (widen_partitions(corpus)
              .crossJoin(F.broadcast(cen))
              .select(F.col(id_col), *[F.col(c) for c in payload_cols
                                       if c != id_col],
                      sc.alias("sc")))
    agg = scored.groupBy(id_col).agg(
        F.max("sc").alias("sc"),
        *[F.first(c).alias(c) for c in payload_cols if c != id_col])
    return agg.select(
        F.col(id_col), (-F.col("sc.neg")).alias("centroid_id"),
        F.col("sc.cs").alias("cos_sim"),
        *[F.col(c) for c in payload_cols if c != id_col])


def sq_topk(
    quantized: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by symmetric integer dot product over int8-style codes
    (``sq_quantize`` output vs an equally-quantized query set): score
    = Σ qcode_i·ccode_i — pure integer arithmetic, bit-exact in any
    engine, no float rounding anywhere.  Query codes broadcast; the
    corpus code table is scanned once, never shuffled (ranking is a
    per-query window over candidate scores only).
    """
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col("codes").alias("q_codes"))
    scored = (quantized.crossJoin(F.broadcast(q))
              .filter(F.col(id_col) != F.col("q_id"))
              .select("q_id", F.col(id_col).alias("c_id"),
                      int_dot(F.col("codes"), F.col("q_codes"))
                      .alias("iprod")))
    return _per_query_topk(scored, "iprod", k)


def ivf_sq_search(
    corpus_codes: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ codes under IVF pruning — the scale path for scalar
    quantization (plain ``sq_topk`` is a full scan per query, which
    goes quadratic when the query set grows with the corpus; this
    probes ``n_probe`` clusters per query, so per-query work is
    corpus/k_clusters·n_probe int-dot products — exactly the
    ``ivfpq_search`` shape with int8 codes instead of PQ codes).

    ``corpus_codes`` = (id, centroid_id, codes); ``queries`` = (id,
    raw vector, codes) — cluster probing ranks on the RAW query
    vector (broadcast centroids), scoring is the pure-BIGINT code dot
    product, so the result stays float-tolerance-free.
    """
    q_probe = _probe_n(queries, centroids, n_probe, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col("codes").alias("q_codes"))
    cand = (corpus_codes
            .join(q_probe.withColumnRenamed("cent_id", "centroid_id"),
                  "centroid_id")
            .join(F.broadcast(q), "q_id")
            .filter(F.col(id_col) != F.col("q_id"))
            .select("q_id", F.col(id_col).alias("c_id"),
                    int_dot(F.col("codes"), F.col("q_codes"))
                    .alias("iprod")))
    return _per_query_topk(cand, "iprod", k)


def standardize_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-dimension whitening stats for an embedding corpus — the
    preprocessing pass before scalar/product quantization (SQ codes
    assume comparable per-dim ranges; PQ subspaces train better on
    centered data).

    One posexplode → per-dim avg/stddev aggregate (dim-sized result),
    packed into parallel mean/std arrays on a 1-row broadcast frame —
    the corpus never shuffles; standardization itself is a narrow map.
    Stats round at 6 decimals before use so any engine reproduces the
    standardized values bit-for-bit (the kmeans-oracle convention).
    Zero-variance dims standardize with σ=1 (centered, not scaled).

    Output: (id, std_norm, max_absdev) — the whitened L2 norm and the
    largest absolute standardized component (outlier signal).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dims = emb.select(F.posexplode(v).alias("pos", "x"))
    # round(avg,6)/round(stddev,6) RETAINED (r06 boundary-flap audit):
    # mu/sd parameterize the whitening transform the oracle re-derives
    # identically; the rounding pins both engines to the same
    # parameters.  Flap window covered by the per-round strict_parity
    # sweep.
    per_dim = (dims.groupBy("pos")
               .agg(F.round(F.avg("x"), 6).alias("mu"),
                    F.round(F.stddev_pop("x"), 6).alias("sd")))
    stats = (per_dim.groupBy()
             .agg(F.array_sort(F.collect_list(
                 F.struct("pos", "mu", "sd"))).alias("ps"))
             .select(F.transform("ps", lambda s: s["mu"]).alias("mus"),
                     F.transform("ps", lambda s: s["sd"]).alias("sds")))
    std = F.transform(
        v,
        lambda x, i: (x - F.get(F.col("mus"), i))
        / F.when(F.get(F.col("sds"), i) > 0,
                 F.get(F.col("sds"), i)).otherwise(F.lit(1.0)))
    return (emb.join(F.broadcast(stats))
            .select(F.col(id_col),
                    F.round(F.sqrt(F.aggregate(
                        std, F.lit(0.0),
                        lambda acc, x: acc + x * x)), 4).alias("std_norm"),
                    F.round(F.array_max(F.transform(std, F.abs)), 4)
                    .alias("max_absdev")))


def binary_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    keep_vec: bool = True,
) -> DataFrame:
    """Binary (sign-bit) quantization: dim floats → ceil(dim/32)
    BIGINT words, bit i of word w set iff component (32w + i) > 0.

    32 bits per word (not 64) so no engine touches the sign bit —
    shift semantics at bit 63 differ across engines and overflow
    UBSan-style; 2×32 keeps every word positive and portable.  A 64×
    compression: the Hamming scan reads 16 bytes/vector instead of
    256 — the cheap first pass of a two-stage (shortlist → exact
    rerank) search.
    """
    words = []
    for w_i, base in enumerate(range(0, dim, 32)):
        n = min(32, dim - base)
        words.append(F.expr(
            f"aggregate(sequence(0, {n - 1}), 0L, (a, i) -> "
            f"a + IF(element_at({vec_col}, i + {base + 1}) > 0, "
            f"shiftleft(1L, i), 0L))").alias(f"w{w_i}"))
    cols = [F.col(id_col)] + ([F.col(vec_col)] if keep_vec else [])
    return emb.select(*cols, *words)


def hamming_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    shortlist: int = 100,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage binary search: Hamming distance over sign-bit codes
    shortlists `shortlist` candidates per query (bit_count(xor) on 2
    BIGINTs — pure codegen'd integer ops over the 64×-compressed
    codes), then exact cosine reranks the shortlist only.

    Scale shape: queries broadcast; the corpus scan reads only
    (id, w0, w1) — the float vectors are joined back for the
    shortlist-sized survivor set alone, so the full-precision data
    never rides the scan or the shuffle.
    """
    n_words = (dim + 31) // 32
    cq = binary_quantize(widen_partitions(corpus), id_col, vec_col, dim,
                         keep_vec=False)
    c = cq.select(F.col(id_col).alias("c_id"),
                  *[F.col(f"w{i}").alias(f"cw{i}") for i in range(n_words)])
    q = (binary_quantize(queries, id_col, vec_col, dim, keep_vec=False)
         .select(F.col(id_col).alias("q_id"),
                 *[F.col(f"w{i}").alias(f"qw{i}") for i in range(n_words)]))
    ham = None
    for i in range(n_words):
        t = F.bit_count(F.col(f"cw{i}").bitwiseXOR(F.col(f"qw{i}")))
        ham = t if ham is None else ham + t
    cand = (c.crossJoin(F.broadcast(q))
            .filter(F.col("c_id") != F.col("q_id"))
            .select("q_id", "c_id", ham.cast("long").alias("hamming")))
    w = W.partitionBy("q_id").orderBy("hamming", "c_id")
    short = (cand.withColumn("hrank", F.row_number().over(w))
             .filter(F.col("hrank") <= shortlist)
             .select("q_id", "c_id", "hamming"))
    # fetch float vectors for shortlist rows only (AQE broadcasts the
    # shortlist side of both joins)
    cv = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    scored = (short.join(cv, "c_id").join(F.broadcast(qv), "q_id")
              .select("q_id", "c_id", "hamming",
                      F.round(cosine(F.col("cv"), F.col("qv")), 6)
                      .alias("cos_sim")))
    return _per_query_topk(scored, "cos_sim", k)


def matryoshka_topk(
    corpus: DataFrame,
    queries: DataFrame,
    prefix_dim: int = 16,
    shortlist: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style two-stage search: cosine over the FIRST
    `prefix_dim` dims shortlists candidates (4× less arithmetic and
    IO when the prefix is materialized), exact full-dim cosine
    reranks.  Same fetch-vectors-for-survivors-only scale shape as
    hamming_rerank_topk."""
    pre = lambda c: F.slice(c, 1, prefix_dim)  # noqa: E731
    c = (widen_partitions(corpus)
         .select(F.col(id_col).alias("c_id"),
                 pre(F.col(vec_col)).alias("c_pre")))
    q = queries.select(F.col(id_col).alias("q_id"),
                       pre(F.col(vec_col)).alias("q_pre"))
    stage1 = (c.crossJoin(F.broadcast(q))
              .filter(F.col("c_id") != F.col("q_id"))
              .select("q_id", "c_id",
                      F.round(cosine(F.col("c_pre"), F.col("q_pre")), 6)
                      .alias("pre_sim")))
    w = W.partitionBy("q_id").orderBy(F.col("pre_sim").desc(), "c_id")
    short = (stage1.withColumn("prank", F.row_number().over(w))
             .filter(F.col("prank") <= shortlist)
             .select("q_id", "c_id", "pre_sim"))
    cv = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("cv"))
    qv = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    scored = (short.join(cv, "c_id").join(F.broadcast(qv), "q_id")
              .select("q_id", "c_id", "pre_sim",
                      F.round(cosine(F.col("cv"), F.col("qv")), 6)
                      .alias("cos_sim")))
    return _per_query_topk(scored, "cos_sim", k)


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification over the embedding corpus
    (labels ride the corpus).  Composition: brute-force top-k (query
    side broadcast, corpus never shuffles) → label join for the
    k·|Q| winner rows only → per-query majority with a
    (votes desc, label asc) deterministic tiebreak.

    Neighbor-similarity evidence is carried as an integer-exact BIGINT
    micro-sim sum (Σ round(cos_sim·1e6)) rather than a rounded mean:
    averaging ≤k 6dp-rounded doubles then re-rounding flaps a half-ulp
    between Spark's and DuckDB's summation orders (CORRECTNESS_r04's
    one hash mismatch); integer sums are order-invariant."""
    top = brute_force_topk(corpus, queries, k=k, id_col=id_col,
                           vec_col=vec_col)
    labels = corpus.select(F.col(id_col).alias("c_id"),
                           F.col(label_col).cast("long").alias("nbr_label"))
    votes = (top.join(labels, "c_id")
             .groupBy("q_id", "nbr_label")
             .agg(F.count(F.lit(1)).alias("votes"),
                  F.sum(F.round(F.col("cos_sim") * 1e6).cast("long"))
                  .alias("sim_micro_sum")))
    w = W.partitionBy("q_id").orderBy(F.desc("votes"), F.asc("nbr_label"))
    pred = (votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("q_id", F.col("nbr_label").alias("pred_label"),
                    "votes", "sim_micro_sum"))
    truth = queries.select(F.col(id_col).alias("q_id"),
                           F.col(label_col).cast("long").alias("true_label"))
    return (pred.join(F.broadcast(truth), "q_id")
            .select("q_id", "true_label", "pred_label", "votes",
                    "sim_micro_sum",
                    (F.col("pred_label") == F.col("true_label"))
                    .alias("correct")))


def build_ivf_index(
    spark,
    corpus: DataFrame,
    centroids: DataFrame,
    table_prefix: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = 16,
) -> None:
    """Persist an IVF index as catalog tables so searches serve off
    storage instead of re-assigning the corpus per query (every
    in-query ANN entry rebuilds its index per run — this is the
    production serving shape VERDICT r05 task 7 asked for):

    - ``{prefix}_assign``    (vec_id, centroid_id, cos_sim, embedding)
      bucketed+sorted on ``centroid_id`` — the probe-join key, so a
      query batch's probed clusters join straight into co-located
      buckets with no corpus-side Exchange;
    - ``{prefix}_centroids`` (centroid_id, embedding) — tiny, plain.

    The O(corpus) assignment pass (one scan, centroids broadcast, one
    bucketBy shuffle) is paid once here; each search batch then costs
    O(queries × probed-cluster rows).  Same catalog discipline as
    dedup.build_minhash_index — the assignment name is a stable VIEW
    over versioned bucketed physical tables (core/bucketing.py::
    init_versioned), so delete/retrain write-backs repoint the
    catalog atomically with no reader-visible gap (VERDICT r08
    task 2); the probe join's bucket co-location pushes through the
    inlined view unchanged.
    """
    from legate_dataframe_spark.core.bucketing import init_versioned

    assigned = assign_with_payload(corpus, centroids, [vec_col],
                                   id_col=id_col, vec_col=vec_col)
    init_versioned(spark, assigned, f"{table_prefix}_assign",
                   ["centroid_id"], num_buckets=num_buckets)
    (centroids.select(F.col("centroid_id"), F.col(vec_col))
     .write.format("parquet").mode("overwrite")
     .saveAsTable(f"{table_prefix}_centroids"))


def ivf_search_persisted(
    spark,
    queries: DataFrame,
    table_prefix: str,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    generation: int | None = None,
) -> DataFrame:
    """ANN top-k served from a :func:`build_ivf_index` catalog index:
    probe the ``n_probe`` nearest persisted centroids per query, then
    exact-rerank inside the probed clusters read from the BUCKETED
    assignment table — the corpus is never re-assigned and its scan
    is co-located on the probe key.  Value-identical to the in-query
    ``ivf_search`` over the same centroids (the oracle states exactly
    that).

    ``generation`` (optional) serves off a RETAINED assignment
    snapshot (time travel across a delete — see
    :func:`delete_from_ivf_index`'s ``keep_old``).  The snapshot is
    consistent with the LIVE centroid table by construction, because
    deletes never move centroids; do not time-travel across a
    retrain (which rewrites both sides and offers no keep_old)."""
    from legate_dataframe_spark.core.bucketing import (
        read_bucketed,
        read_generation,
    )

    cen = spark.table(f"{table_prefix}_centroids")
    if generation is None:
        assigned = read_bucketed(spark, f"{table_prefix}_assign")
    else:
        assigned = read_generation(spark, f"{table_prefix}_assign",
                                   generation)
    return ivf_search(assigned, cen, queries, k=k, n_probe=n_probe,
                      id_col=id_col, vec_col=vec_col)


def delete_from_ivf_index(
    spark,
    vec_ids: DataFrame,
    table_prefix: str,
    id_col: str = "vec_id",
    num_buckets: int = 16,
    keep_old: bool = False,
) -> None:
    """Remove vectors from a persisted IVF index — the DELETE quarter
    of the index lifecycle (VERDICT r07 task 2b), the inverse of
    :func:`insert_into_ivf_index`.  ``vec_ids`` is a 1-column frame
    of ids to retract.  The assignment table is anti-joined on id
    (the id list broadcasts — the corpus-sized side never shuffles)
    and written back under its ORIGINAL bucket spec as a new
    generation behind the stable view (``swap_versioned`` —
    catalog-atomic repoint, no reader-visible gap), so post-delete
    probe joins still read co-located buckets.  Centroids are
    untouched: IVF centroids are
    a trained artifact, not per-vector state — deleting a vector
    must not move cluster geometry under standing queries (re-train
    + re-assign is a separate, heavier maintenance operation).
    Cost is O(index) per delete batch, same as compaction; batch
    deletes to amortize.

    ``keep_old=True`` retains the pre-delete assignment generation
    for audit time travel — CONSISTENT on its own because deletes
    never touch the centroids, so the retained snapshot pairs with
    the same (current) centroid table it was assigned against.  The
    takedown/vacuum interaction from dedup.delete_from_minhash_index
    applies verbatim.  (A retained snapshot taken across a RETRAIN
    would not have this property — retrain rewrites both tables; its
    pre-retrain assignment is only meaningful with the pre-retrain
    centroids, which are overwritten, so retrain does not offer
    keep_old.)"""
    from legate_dataframe_spark.core.bucketing import (
        read_bucketed,
        swap_versioned,
    )

    ids = vec_ids.toDF(id_col)
    assigned = read_bucketed(spark, f"{table_prefix}_assign")
    keep = assigned.join(F.broadcast(ids), id_col, "left_anti")
    swap_versioned(spark, keep, f"{table_prefix}_assign",
                   ["centroid_id"], num_buckets=num_buckets,
                   keep_old=keep_old)


def retrain_ivf_index(
    spark,
    table_prefix: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = 16,
) -> None:
    """One Lloyd refinement of a persisted IVF index — the "heavier
    maintenance operation" :func:`delete_from_ivf_index` defers to:
    after enough inserts/deletes the trained centroids drift from the
    corpus and recall decays, and the fix is to re-center and
    re-assign, NOT to mutate centroids per delete.

    Everything runs off the index itself — the corpus parquet is
    never rescanned, because the assignment table carries the vectors
    as payload (the same denormalization that lets searches skip a
    corpus join):

    1. new centroids = per-cluster element-wise mean of the STORED
       assignment (identical arithmetic to ``kmeans_refine``'s
       iteration body, including the round-6 cross-engine
       reproducibility contract — the stored assignment IS the
       current-centroid assignment, so one retrain ≡ one Lloyd
       iteration, and the k-means SQL oracle unrolls it exactly);
       clusters that lost all members drop out, deterministic;
    2. re-assign the index's vectors against the new centroids
       (broadcast; one index scan) and swap the assignment table
       under its bucket spec (``swap_versioned`` — atomic repoint
       behind the stable view);
    3. overwrite the (tiny) centroids table.

    Cost is O(index + k·dim shuffle) per retrain; run on the drift
    cadence, orders of magnitude rarer than insert/delete."""
    from legate_dataframe_spark.core.bucketing import (
        read_bucketed,
        swap_versioned,
    )

    assigned = read_bucketed(spark, f"{table_prefix}_assign")
    expl = assigned.select(
        "centroid_id",
        F.posexplode(_to_double(F.col(vec_col))).alias("pos", "val"))
    means = (expl.groupBy("centroid_id", "pos")
             .agg(F.round(F.avg("val"), 6).alias("m")))
    cen = (means.groupBy("centroid_id")
           .agg(F.transform(
               F.array_sort(F.collect_list(F.struct("pos", "m"))),
               lambda s: s["m"]).alias(vec_col))
           .localCheckpoint(eager=True))  # severed from both tables
    new_assign = assign_with_payload(
        assigned.select(id_col, vec_col), cen, [vec_col],
        id_col=id_col, vec_col=vec_col)
    swap_versioned(spark, new_assign, f"{table_prefix}_assign",
                   ["centroid_id"], num_buckets=num_buckets)
    (cen.select("centroid_id", vec_col)
     .write.format("parquet").mode("overwrite")
     .saveAsTable(f"{table_prefix}_centroids"))


def insert_into_ivf_index(
    spark,
    batch: DataFrame,
    table_prefix: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = 16,
) -> None:
    """Append a NEW vector batch into a persisted IVF index built by
    :func:`build_ivf_index` — the write-side twin of
    :func:`ivf_search_persisted`, completing the index lifecycle
    (build → insert → serve) without ever re-assigning the standing
    corpus.  The batch is assigned against the PERSISTED centroids
    (broadcast; one batch scan) and appended into the bucketed
    assignment table — Spark buckets the appended files with the same
    hash spec, so each bucket id simply gains files and every later
    probe join stays co-located.  Per-batch cost is O(batch); the
    append targets the assignment view's LIVE physical generation
    (core/bucketing.py::append_versioned)."""
    from legate_dataframe_spark.core.bucketing import append_versioned

    cen = spark.table(f"{table_prefix}_centroids")
    assigned = assign_with_payload(batch, cen, [vec_col],
                                   id_col=id_col, vec_col=vec_col)
    # num_buckets must match build_ivf_index's spec — Spark validates
    # the bucket spec on append and fails loudly on a mismatch, so a
    # wrong value can never silently break co-location
    append_versioned(spark, assigned, f"{table_prefix}_assign",
                     ["centroid_id"], num_buckets=num_buckets)

"""Similarity search over the ``embeddings`` table (array<float>).

Two paths, per the standard ANN playbook:
- brute-force cosine top-k: exact baseline. The dot product runs
  JVM-side via ``zip_with``+``aggregate`` HOFs in double precision —
  no Python, no UDF. O(n·d) per query; fine as a verification baseline
  and for one-off queries.
- hyperplane-LSH bucketed search: the scale path. Deterministic random
  hyperplanes (seeded NumPy, materialized as literal arrays) give each
  vector a sign-bit bucket; search only touches the query's bucket
  (and optionally neighboring probes). Recall is approximate —
  verified in tests against the brute-force baseline, not an oracle.

Both avoid driver-side collect: the query vector is joined in as a
broadcast single-row DataFrame, so the same plan serves a *table* of
query vectors at 100 TB (broadcast becomes shuffle join on bucket).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

TOP_K = 10
QUERY_VEC_ID = 0  # deterministic query: the embedding of vec_id 0
LSH_PLANES = 4  # 2^4 buckets: ~n/16 candidates per probe — sized so a
# top-10 query keeps high recall on the test corpus; at larger n, raise
# planes (candidates scale n/2^planes) or add multi-probe.
LSH_SEED = 42
EMBED_DIM = 64


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, all JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (na * nb)


def _as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def q_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 nearest to vec_id=0 (excluded), computed in
    double; similarity rounded to 4 decimals for cross-engine hashing,
    ranking done on the unrounded value with vec_id tiebreak."""
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(
        _as_double("embedding").alias("qvec")
    )
    sim = cosine(_as_double("embedding"), F.col("qvec"))
    return (
        emb.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.round("sim", 4).alias("sim"))
    )


def hyperplanes(dim: int = EMBED_DIM, n_planes: int = LSH_PLANES,
                seed: int = LSH_SEED) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of a vector under the fixed hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, lit_plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.shiftleft(
            F.when(dot > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
            i,
        )
    return bucket


PROBE_RADIUS = 1  # multi-probe: also search buckets differing in 1 bit


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via multi-probe hyperplane LSH: candidates =
    vectors in the query's sign bucket or any bucket within Hamming
    radius 1 (the standard multi-probe recall fix for sign-LSH — the
    nearest neighbors most often differ in exactly the one hyperplane
    they sit closest to). Exact cosine re-ranks candidates only.

    At scale the bucket equi-join touches (1+planes)/2^planes of the
    data instead of all of it; raising planes while probing radius 1
    keeps recall while shrinking the candidate fraction. Approximate ⇒
    rows-only driver check; recall vs the exact baseline is asserted in
    tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    planes = hyperplanes()
    bucketed = emb.select(
        "vec_id",
        _as_double("embedding").alias("vec"),
        lsh_bucket(_as_double("embedding"), planes).alias("bucket"),
    )
    query = bucketed.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("vec").alias("qvec"), F.col("bucket").alias("qbucket")
    )
    # query-side probe fan-out: its own bucket + each 1-bit flip
    probes = query.select(
        "qvec",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(len(planes))
                ],
            )
        ).alias("probe"),
    )
    sim = cosine(F.col("vec"), F.col("qvec"))
    return (
        bucketed.where(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probes), F.col("bucket") == F.col("probe"))
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.round("sim", 4).alias("sim"))
    )


IVF_K = 16       # coarse centroids
IVF_NPROBE = 4   # centroids searched per query
IVF_SEED = 42


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVF (inverted-file) search: a k-means
    coarse quantizer (MLlib, fixed seed) partitions vectors into K
    cells; the query probes its NPROBE nearest centroids and exact
    cosine re-ranks only those cells' vectors.

    Scale shape: the cell assignment is a one-off batch job (here
    inline); search is an equi-join on cell id touching ~NPROBE/K of
    the data. Centroids live on the driver (K×dim floats — tiny) —
    the standard IVF-flat layout. Approximate ⇒ rows-only check;
    recall asserted in tests on planted neighbors."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        _as_double("embedding").alias("arr"),
        array_to_vector(_as_double("embedding")).alias("features"),
    )
    km = KMeans(k=IVF_K, seed=IVF_SEED, maxIter=5, featuresCol="features",
                predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "arr", "cell")

    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    qrow = vecs.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("arr").alias("qvec")
    )
    # driver-side probe selection is O(K): rank centroids by distance
    # to the query's centroid-space representation via a tiny collect
    import numpy as _np

    q = _np.array(
        qrow.collect()[0]["qvec"]
    )  # 1×dim: bounded, not data-sized
    dists = [
        float(_np.linalg.norm(q - _np.array(c))) for c in centroids
    ]
    probe_cells = sorted(range(IVF_K), key=lambda i: dists[i])[:IVF_NPROBE]

    sim = cosine(F.col("arr"), F.col("qvec"))
    return (
        assigned.where(
            F.col("cell").isin(probe_cells) & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .crossJoin(F.broadcast(qrow))
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.round("sim", 4).alias("sim"))
    )


def q_embedding_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (round(cos,4) ≥ 0.95)
    via all-pairs self-join — the oracle-checkable baseline twin of
    q_embedding_neardup. O(n²): verification-scale only; the LSH variant
    is the 100 TB path."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_a"), _as_double("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), _as_double("embedding").alias("vb")
    )
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(sim, 4).alias("sim"))
        .where(F.col("sim") >= 0.95)
    )


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.95): LSH-bucketed
    self-join (same-bucket pairs only) + exact cosine verify. The
    all-pairs oracle twin is SQL-expressible; this plan is the one that
    survives 100 TB because the join key is the bucket."""
    emb = load_table(spark, sf_dir, "embeddings")
    planes = hyperplanes()
    bucketed = emb.select(
        "vec_id",
        _as_double("embedding").alias("vec"),
        lsh_bucket(_as_double("embedding"), planes).alias("bucket"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    sim = cosine(F.col("a.vec"), F.col("b.vec"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(sim, 4).alias("sim"),
        )
        .where(F.col("sim") >= 0.95)
    )

"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

- brute-force cosine top-k: the exactness baseline. All-JVM: the dot product
  and norms are ``aggregate``/``zip_with`` expressions inside whole-stage
  codegen (double precision — DuckDB's ``list_cosine_similarity`` is float32,
  so the oracle SQL computes cosine manually in double via positional unnest).
- IVF partitioned search: restrict to the query's coarse cell — the scale
  path that scans 1/|clusters| of the corpus. Two quantizers: the ``label``
  column as a given assignment (``ann_ivf_label``) and a TRAINED
  fixed-iteration Lloyd's k-means (``ann_ivf_kmeans``, cross-engine
  reproducible; ``_probe2`` scans the two nearest cells).
- near-dup pairs: cosine ≥ threshold over candidate pairs.
- random-hyperplane LSH bucketing: deterministic md5-derived hyperplanes →
  sign-bit bucket per vector; the bucket-join is the 100 TB candidate
  generator (probes only matching buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ciff_spark.operators.dedup import hash60_sql
from ciff_spark.sources.testdata import load

K_ANN = 20
K_IVF = 10
# pair threshold: the testdata embeddings are near-isotropic (max pairwise
# cosine ≈ 0.51 at every sf), so a "classic" 0.95 threshold makes every pair
# query vacuously empty — 0.42 yields real pairs at sf0.001/0.01/0.1, which
# is what the oracle comparison needs to actually prove something
NEARDUP_COS = 0.42
N_PLANES = 8
# OR-amplified banding of the hyperplane bits for candidate generation:
# a pair is a candidate iff it agrees on ALL bits of >= 1 band
LSH_BAND_BITS = 2
LSH_N_BANDS = N_PLANES // LSH_BAND_BITS
NEARDUP_BLOCKS = 8  # row-block count for the exact all-pairs gemm
DIM = 64


def _round6_half_up(x: float) -> float:
    """Round to 6 decimals, halves UP — the ONE rounding rule all three
    engines share for driver-side distance math: Spark's ``F.round`` is
    HALF_UP and the DuckDB oracle rounds half away from zero, while Python's
    built-in ``round`` is banker's (half-even). Distances here are ≥ 0, so
    half-up and half-away-from-zero coincide."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0):
    row = (
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select("embedding", "label")
        .first()
    )
    return [float(x) for x in row["embedding"]], int(row["label"])


def _cos_to_query(q: list[float]) -> Column:
    qcol = F.array(*[F.lit(x) for x in q])
    qn = sum(x * x for x in q) ** 0.5
    return _dot(F.col("embedding"), qcol) / (_norm(F.col("embedding")) * F.lit(qn))


# DuckDB cosine in DOUBLE precision via positional unnest (generate_subscripts)
_COS_SQL = """
WITH qv AS (
  SELECT generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS qx
  FROM embeddings WHERE vec_id = {qid}
),
ev AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS vx
  FROM embeddings
),
cos AS (
  SELECT ev.vec_id, any_value(ev.label) AS label,
         sum(vx * qx) / (sqrt(sum(vx * vx)) * sqrt(sum(qx * qx))) AS c
  FROM ev JOIN qv USING (i) GROUP BY ev.vec_id
)
"""


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, _ = _query_vec(spark, sf_dir, 0)
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.where(F.col("vec_id") != 0)
        .select("vec_id", F.round(_cos_to_query(q), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(K_ANN)
    )


ANN_COSINE_SQL = (
    _COS_SQL.format(qid=0)
    + f"SELECT vec_id, round(c, 6) AS cos FROM cos WHERE vec_id != 0 "
    f"ORDER BY round(c, 6) DESC, vec_id ASC LIMIT {K_ANN}"
)


def ann_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse search: only the query's cluster (label) is scanned."""
    q, qlabel = _query_vec(spark, sf_dir, 0)
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.where((F.col("vec_id") != 0) & (F.col("label") == qlabel))
        .select("vec_id", F.round(_cos_to_query(q), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(K_IVF)
    )


ANN_IVF_SQL = (
    _COS_SQL.format(qid=0)
    + f"""SELECT vec_id, round(c, 6) AS cos FROM cos
WHERE vec_id != 0 AND label = (SELECT label FROM embeddings WHERE vec_id = 0)
ORDER BY round(c, 6) DESC, vec_id ASC LIMIT {K_IVF}"""
)


_PACKED_SCHEMA = "bid int, n int, dim int, ids binary, mat binary"


def _packed_blocks(spark: SparkSession, sf_dir: str, n_blocks: int) -> DataFrame:
    """embeddings → one row per row-block: (bid, n, dim, ids int64-LE bytes,
    L2-normalized matrix float64-LE bytes). Fully distributed — each block is
    packed by the executor holding its rows; block rows are megabytes even
    with thousands of vectors per block, so they ride joins cheaply."""
    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        mat = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        return pd.DataFrame(
            [{
                "bid": int(key[0]),
                "n": len(pdf),
                "dim": unit.shape[1],
                "ids": pdf["vec_id"].to_numpy(np.int64).tobytes(),
                "mat": unit.tobytes(),
            }]
        )

    return (
        emb.withColumn("bid", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int"))
        .groupBy("bid")
        .applyInPandas(pack, schema=_PACKED_SCHEMA)
    )


def neardup_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with cosine ≥ threshold — EXACT, via distributed block-pair
    matrix multiply: vectors pack into ``NEARDUP_BLOCKS`` row-blocks, the
    driver enumerates the upper-triangle block-pair list (a tiny equi-join
    key table, never a nested-loop join), and each task runs one BLAS gemm
    per block pair. No driver collect, no full-matrix broadcast — intrinsic
    O(N²/B) exact cost spread over B(B+1)/2 independent tasks. This is the
    exactness baseline/verifier; ``neardup_lsh_pairs`` is the sub-quadratic
    candidate-generation path at corpus scale."""
    import numpy as np
    import pandas as pd

    blocks = _packed_blocks(spark, sf_dir, NEARDUP_BLOCKS)
    bp = [(i, j) for i in range(NEARDUP_BLOCKS) for j in range(NEARDUP_BLOCKS) if i <= j]
    pair_keys = spark.createDataFrame(bp, "bi int, bj int")
    joined = (
        pair_keys.join(blocks.alias("a"), F.col("bi") == F.col("a.bid"))
        .join(blocks.alias("b"), F.col("bj") == F.col("b.bid"))
        .select(
            "bi", "bj",
            F.col("a.n").alias("n_a"), F.col("a.dim").alias("dim_a"),
            F.col("a.ids").alias("ids_a"), F.col("a.mat").alias("mat_a"),
            F.col("b.n").alias("n_b"), F.col("b.dim").alias("dim_b"),
            F.col("b.ids").alias("ids_b"), F.col("b.mat").alias("mat_b"),
        )
        .repartition(len(bp))
    )
    thr = NEARDUP_COS

    def gemm(iterator):
        for pdf in iterator:
            for r in pdf.itertuples(index=False):
                ua = np.frombuffer(r.mat_a, np.float64).reshape(r.n_a, r.dim_a)
                ub = np.frombuffer(r.mat_b, np.float64).reshape(r.n_b, r.dim_b)
                ia = np.frombuffer(r.ids_a, np.int64)
                ib = np.frombuffer(r.ids_b, np.int64)
                sims = np.round(ua @ ub.T, 6)
                hit = sims >= thr
                if r.bi == r.bj:
                    hit &= ia[:, None] < ib[None, :]  # strict upper triangle
                ai, bj = np.nonzero(hit)
                if ai.size:
                    v1 = np.minimum(ia[ai], ib[bj])
                    v2 = np.maximum(ia[ai], ib[bj])
                    yield pd.DataFrame({"v1": v1, "v2": v2, "cos": sims[ai, bj]})

    return joined.mapInPandas(gemm, schema="v1 bigint, v2 bigint, cos double")


NEARDUP_SQL = f"""
WITH ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS vx
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(vx * vx)) AS n FROM ev GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2, sum(a.vx * b.vx) AS d
  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT v1, v2, round(d / (n1.n * n2.n), 6) AS cos
FROM dots JOIN norms n1 ON v1 = n1.vec_id JOIN norms n2 ON v2 = n2.vec_id
WHERE round(d / (n1.n * n2.n), 6) >= {NEARDUP_COS}
"""


def lsh_hyperplane_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit bucket per vector from md5-derived deterministic hyperplanes:
    plane p, dim i weight = hash60(p:i) / 2^59 - 1.0  ∈ [-1, 1)."""
    emb = load(spark, sf_dir, "embeddings")
    ev = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "vx")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), F.col("vx").cast("double").alias("vx"))
    w = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("p"), F.col("i"))), 1, 15), 16, 10
    ).cast("double") / F.lit(float(2**59)) - F.lit(1.0)
    dots = (
        # per-row ×N_PLANES expansion via a literal array explode — a narrow
        # op (no join of any kind in the plan)
        ev.select(
            "vec_id", "i", "vx",
            F.explode(F.array(*[F.lit(p) for p in range(N_PLANES)])).alias("p"),
        )
        .withColumn("w", w)
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("vx") * F.col("w")).alias("d"))
    )
    return (
        dots.withColumn(
            "bit",
            F.expr("CASE WHEN d > 0 THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END"),
        )
        .groupBy("vec_id")
        .agg(F.sum("bit").cast("long").alias("bucket"))
    )


_W_SQL = hash60_sql("p || ':' || i") + " / POW(2, 59) - 1.0"
LSH_BUCKETS_SQL = f"""
WITH ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS vx
  FROM embeddings
),
dots AS (
  SELECT vec_id, p, sum(vx * ({_W_SQL})) AS d
  FROM ev, generate_series(0, {N_PLANES - 1}) AS t(p)
  GROUP BY vec_id, p
)
SELECT vec_id,
       CAST(sum(CASE WHEN d > 0 THEN 1::BIGINT << p ELSE 0 END) AS BIGINT) AS bucket
FROM dots GROUP BY vec_id
"""


def neardup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with LSH-bucketed candidate generation — the
    sub-quadratic 100 TB path: hyperplane sign bits band into
    ``LSH_N_BANDS`` bands of ``LSH_BAND_BITS``; a pair is a candidate iff it
    agrees on every bit of at least one band (OR-amplification); candidates
    come from a per-band equi-join (shuffle on band value, never all-pairs)
    and are verified with the exact double-precision cosine. Semantics =
    "pairs ≥ threshold among same-band vectors" — the oracle SQL applies the
    identical band restriction, so recall of the banding is part of the
    checked contract, not hidden."""
    buckets = lsh_hyperplane_buckets(spark, sf_dir)
    mask = (1 << LSH_BAND_BITS) - 1
    bands = None
    for b in range(LSH_N_BANDS):
        band = buckets.select(
            "vec_id",
            F.lit(b).alias("band"),
            F.expr(f"shiftright(bucket, {b * LSH_BAND_BITS}) & {mask}").alias("bv"),
        )
        bands = band if bands is None else bands.unionAll(band)
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("v1"), F.col("y.vec_id").alias("v2"))
        .distinct()
    )
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e1 = emb.select(F.col("vec_id").alias("v1"), F.col("embedding").alias("emb1"))
    e2 = emb.select(F.col("vec_id").alias("v2"), F.col("embedding").alias("emb2"))
    return (
        cand.join(e1, "v1")
        .join(e2, "v2")
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("emb1"), F.col("emb2"))
                / (_norm(F.col("emb1")) * _norm(F.col("emb2"))),
                6,
            ),
        )
        .where(F.col("cos") >= NEARDUP_COS)
        .select("v1", "v2", "cos")
    )


_LSH_BANDS_SQL = " UNION ALL ".join(
    f"SELECT vec_id, {b} AS band, (bucket >> {b * LSH_BAND_BITS}) & {(1 << LSH_BAND_BITS) - 1} AS bv FROM buckets"
    for b in range(LSH_N_BANDS)
)

NEARDUP_LSH_SQL = f"""
WITH ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS vx
  FROM embeddings
),
pdots AS (
  SELECT vec_id, p, sum(vx * ({_W_SQL})) AS d
  FROM ev, generate_series(0, {N_PLANES - 1}) AS t(p)
  GROUP BY vec_id, p
),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN d > 0 THEN 1::BIGINT << p ELSE 0 END) AS BIGINT) AS bucket
  FROM pdots GROUP BY vec_id
),
bands AS ({_LSH_BANDS_SQL}),
cand AS (
  SELECT DISTINCT x.vec_id AS v1, y.vec_id AS v2
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bv = y.bv AND x.vec_id < y.vec_id
),
norms AS (SELECT vec_id, sqrt(sum(vx * vx)) AS n FROM ev GROUP BY vec_id),
dots AS (
  SELECT v1, v2, sum(a.vx * b.vx) AS d
  FROM cand JOIN ev a ON a.vec_id = v1 JOIN ev b ON b.vec_id = v2 AND a.i = b.i
  GROUP BY v1, v2
)
SELECT v1, v2, round(d / (n1.n * n2.n), 6) AS cos
FROM dots JOIN norms n1 ON v1 = n1.vec_id JOIN norms n2 ON v2 = n2.vec_id
WHERE round(d / (n1.n * n2.n), 6) >= {NEARDUP_COS}
"""


# ---------------------------------------------------------------------------
# IVF with a TRAINED coarse quantizer: fixed-iteration Lloyd's k-means
# ---------------------------------------------------------------------------

KMEANS_K = 4
KMEANS_ITERS = 3
_KMEANS_CACHE: dict[tuple, list[list[float]]] = {}


def _sqdist_to(c: list[float]) -> Column:
    ccol = F.array(*[F.lit(x) for x in c])
    return F.aggregate(
        F.zip_with(
            F.col("embedding"), ccol,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign_cluster(cents: list[list[float]]) -> Column:
    """argmin over centroids of round(‖v−c‖², 6), ties to the smaller
    cluster id — array_min over struct<d, j> is the lexicographic argmin."""
    return F.array_min(
        F.array(
            *[
                F.struct(F.round(_sqdist_to(c), 6).alias("d"), F.lit(j).alias("j"))
                for j, c in enumerate(cents)
            ]
        )
    )["j"]


def kmeans_centroids(
    spark: SparkSession, sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> list[list[float]]:
    """Deterministic fixed-iteration Lloyd's over the embeddings — the
    trained coarse quantizer for IVF. Built to be CROSS-ENGINE REPRODUCIBLE
    (the DuckDB oracle re-runs the identical unrolled iterations):

    - init: the first ``k`` vectors (vec_id < k), components rounded to 6;
    - each iteration: assign by round(‖v−c‖², 6) with ties to the smaller
      cluster id, then centroid = per-component round(avg, 6) (rounding at
      every stage absorbs the engines' different summation orders — the
      same pin every rounded-score entry uses); an emptied cluster keeps
      its previous centroid.

    Per iteration: one distributed assignment pass (codegen'd expressions,
    no UDF) + one (cluster, dim) aggregation; only the k×DIM centroid table
    ever reaches the driver — the 100 TB shape for Lloyd's on Spark.

    Memoized per (sf_dir, k, iters): the result is a deterministic pure
    function of the embeddings table, and the three kmeans driver entries
    would otherwise each retrain the same quantizer."""
    key = (sf_dir, k, iters)
    hit = _KMEANS_CACHE.get(key)
    if hit is not None:
        return hit
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    init = (
        emb.where(F.col("vec_id") < k)
        .orderBy("vec_id")
        .select(F.transform("embedding", lambda x: F.round(x.cast("double"), 6)).alias("c"))
        .collect()
    )
    cents = [[float(x) for x in r["c"]] for r in init]
    for _ in range(iters):
        assigned = emb.select("vec_id", "embedding", _assign_cluster(cents).alias("cl"))
        means = (
            assigned.select("cl", F.posexplode("embedding").alias("i", "vx"))
            .groupBy("cl", "i")
            .agg(F.round(F.avg(F.col("vx").cast("double")), 6).alias("cx"))
            .collect()
        )
        by_cl: dict[int, dict[int, float]] = {}
        for r in means:
            by_cl.setdefault(int(r["cl"]), {})[int(r["i"])] = float(r["cx"])
        cents = [
            [by_cl[j][i] for i in range(len(cents[j]))] if j in by_cl else cents[j]
            for j in range(k)
        ]
    _KMEANS_CACHE[key] = cents
    return cents


def ann_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster) under the final trained centroids — the full IVF
    partition assignment, value-checked against the oracle's re-derivation
    of the whole Lloyd's pipeline."""
    cents = kmeans_centroids(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    return emb.select("vec_id", _assign_cluster(cents).cast("int").alias("cluster"))


def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with the trained quantizer: scan ONLY the query's coarse
    cell (vectors assigned to the query's nearest final centroid), exact
    cosine within it — the scale path scans 1/k of the corpus."""
    cents = kmeans_centroids(spark, sf_dir)
    q, _ = _query_vec(spark, sf_dir, 0)
    qcell = min(
        range(len(cents)),
        key=lambda j: (
            _round6_half_up(sum((float(x) - c) ** 2 for x, c in zip(q, cents[j]))), j
        ),
    )
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", "embedding", _assign_cluster(cents).alias("cl"))
        .where((F.col("vec_id") != 0) & (F.col("cl") == qcell))
        .select("vec_id", F.round(_cos_to_query(q), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(K_IVF)
    )


def ann_ivf_kmeans_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF (nprobe=2): scan the query's TWO nearest coarse
    cells — the standard recall knob for a trained quantizer (a true
    neighbor just across a cell boundary is invisible to nprobe=1); cost is
    still 2/k of the corpus, never a full scan."""
    cents = kmeans_centroids(spark, sf_dir)
    q, _ = _query_vec(spark, sf_dir, 0)
    ranked = sorted(
        (_round6_half_up(sum((float(x) - c) ** 2 for x, c in zip(q, cents[j]))), j)
        for j in range(len(cents))
    )
    cells = [j for _, j in ranked[:2]]
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", "embedding", _assign_cluster(cents).alias("cl"))
        .where((F.col("vec_id") != 0) & F.col("cl").isin(cells))
        .select("vec_id", F.round(_cos_to_query(q), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(K_IVF)
    )


def _kmeans_sql_ctes(k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> str:
    """Unrolled Lloyd's as DuckDB CTEs: ev (positional components), c0
    (init), then per iteration an assignment CTE (argmin of rounded sq-dist,
    ties to smaller cluster) and a centroid CTE (rounded per-component avg,
    COALESCE keeps an emptied cluster's previous centroid). Exposes
    ``c{iters}`` (final centroids) and ``afin`` (final assignment)."""
    parts = [
        """ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS vx
  FROM embeddings
)""",
        f"""c0 AS (
  SELECT vec_id AS cl, i, round(vx, 6) AS cx FROM ev WHERE vec_id < {k}
)""",
    ]
    for t in range(1, iters + 1):
        prev = f"c{t - 1}"
        parts.append(f"""d{t} AS (
  SELECT ev.vec_id, {prev}.cl,
         round(sum((ev.vx - {prev}.cx) * (ev.vx - {prev}.cx)), 6) AS d
  FROM ev JOIN {prev} USING (i) GROUP BY ev.vec_id, {prev}.cl
)""")
        parts.append(f"""a{t} AS (
  SELECT vec_id, cl FROM d{t}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) = 1
)""")
        parts.append(f"""m{t} AS (
  SELECT a{t}.cl, ev.i, round(avg(ev.vx), 6) AS cx
  FROM a{t} JOIN ev USING (vec_id) GROUP BY a{t}.cl, ev.i
)""")
        parts.append(f"""c{t} AS (
  SELECT {prev}.cl, {prev}.i, COALESCE(m{t}.cx, {prev}.cx) AS cx
  FROM {prev} LEFT JOIN m{t} ON m{t}.cl = {prev}.cl AND m{t}.i = {prev}.i
)""")
    parts.append(f"""dfin AS (
  SELECT ev.vec_id, c{iters}.cl,
         round(sum((ev.vx - c{iters}.cx) * (ev.vx - c{iters}.cx)), 6) AS d
  FROM ev JOIN c{iters} USING (i) GROUP BY ev.vec_id, c{iters}.cl
)""")
    parts.append("""afin AS (
  SELECT vec_id, cl FROM dfin
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) = 1
)""")
    return ",\n".join(parts)


ANN_KMEANS_CLUSTERS_SQL = f"""
WITH {_kmeans_sql_ctes()}
SELECT vec_id, CAST(cl AS INTEGER) AS cluster FROM afin
"""

ANN_IVF_KMEANS_SQL = f"""
WITH {_kmeans_sql_ctes()},
qv AS (
  SELECT generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS qx
  FROM embeddings WHERE vec_id = 0
),
qcell AS (SELECT cl FROM afin WHERE vec_id = 0),
cos AS (
  SELECT ev.vec_id,
         sum(vx * qx) / (sqrt(sum(vx * vx)) * sqrt(sum(qx * qx))) AS c
  FROM ev JOIN qv USING (i)
  WHERE ev.vec_id IN (SELECT vec_id FROM afin WHERE cl = (SELECT cl FROM qcell))
  GROUP BY ev.vec_id
)
SELECT vec_id, round(c, 6) AS cos FROM cos WHERE vec_id != 0
ORDER BY round(c, 6) DESC, vec_id ASC LIMIT {K_IVF}
"""


ANN_IVF_KMEANS_PROBE2_SQL = f"""
WITH {_kmeans_sql_ctes()},
qv AS (
  SELECT generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS qx
  FROM embeddings WHERE vec_id = 0
),
qcells AS (SELECT cl FROM dfin WHERE vec_id = 0 ORDER BY d, cl LIMIT 2),
cos AS (
  SELECT ev.vec_id,
         sum(vx * qx) / (sqrt(sum(vx * vx)) * sqrt(sum(qx * qx))) AS c
  FROM ev JOIN qv USING (i)
  WHERE ev.vec_id IN (SELECT vec_id FROM afin WHERE cl IN (SELECT cl FROM qcells))
  GROUP BY ev.vec_id
)
SELECT vec_id, round(c, 6) AS cos FROM cos WHERE vec_id != 0
ORDER BY round(c, 6) DESC, vec_id ASC LIMIT {K_IVF}
"""


def neardup_clusters(
    spark: SparkSession, sf_dir: str, pairs: DataFrame | None = None
) -> DataFrame:
    """(vec_id, cluster) for every embedding: connected components over the
    verified LSH near-dup edges (min vec_id per component; singletons are
    their own cluster) — the embedding-field twin of ``dedup_clusters``,
    sharing the same distributed min-label propagation."""
    from ciff_spark.operators.dedup import connected_components

    vecs = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("docid")
    )
    if pairs is None:  # pass precomputed verified pairs to skip the LSH pass
        pairs = neardup_lsh_pairs(spark, sf_dir)
    pairs = pairs.select(F.col("v1").alias("d1"), F.col("v2").alias("d2"))
    return connected_components(vecs, pairs).select(
        F.col("docid").alias("vec_id"), "cluster"
    )


NEARDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (SELECT v1, v2 FROM ({NEARDUP_LSH_SQL}) p),
edges AS (
  SELECT v1 AS src, v2 AS dst FROM pairs
  UNION ALL
  SELECT v2 AS src, v1 AS dst FROM pairs
),
reach(a, b) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
)
SELECT a AS vec_id, min(b) AS cluster FROM reach GROUP BY a
"""


QUERIES: dict[str, tuple] = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_COSINE_SQL),
    "neardup_clusters": (neardup_clusters, NEARDUP_CLUSTERS_SQL),
    "ann_ivf_label": (ann_ivf_label, ANN_IVF_SQL),
    # trained coarse quantizer (fixed-iteration Lloyd's), oracle re-derives
    # the full k-means pipeline relationally
    "ann_kmeans_clusters": (ann_kmeans_clusters, ANN_KMEANS_CLUSTERS_SQL),
    "ann_ivf_kmeans": (ann_ivf_kmeans, ANN_IVF_KMEANS_SQL),
    "ann_ivf_kmeans_probe2": (ann_ivf_kmeans_probe2, ANN_IVF_KMEANS_PROBE2_SQL),
    "neardup_cosine_pairs": (neardup_cosine_pairs, NEARDUP_SQL),
    "neardup_lsh_pairs": (neardup_lsh_pairs, NEARDUP_LSH_SQL),
    "lsh_hyperplane_buckets": (lsh_hyperplane_buckets, LSH_BUCKETS_SQL),
}

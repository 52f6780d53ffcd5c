"""Similarity search over embedding columns (array<float>).

Three tiers, smallest-to-largest scale:

* **Brute-force cosine top-k** — exact baseline. One narrow map computing
  the dot product against a broadcast query vector (a literal array — no
  join, no shuffle), then ``orderBy(desc).limit(k)`` which Spark compiles
  to TakeOrderedAndProject (per-partition heap + driver merge, never a
  full sort).
* **Hyperplane-LSH-bucketed ANN** — scale path for query-time lookups:
  each vector gets a ``planes``-bit sign bucket; a query probes its own
  bucket plus all buckets within ``probe_hamming`` bit flips, ranking only
  those vectors. Index build is one narrow map; probing reads a small
  bucket-pruned slice. Recall is tunable via planes/probes (tested against
  the exact baseline in tests/test_dedup_similarity.py).
* **IVF-style coarse quantization** — k centroids from a groupBy-avg over
  a labeled (or k-means-assigned) column; vectors are searched only within
  the nearest ``nprobe`` cells. ``centroid_assign`` below builds the
  assignment table (one broadcast of k×d floats + one narrow map).
* **Projection-grid near-dup blocking** — ``embedding_near_dup_pairs``:
  all-pairs cosine >= t as a LOSSLESS equi-join (triangle-inequality grid
  cells; see its docstring). Exact result, join-shaped cost — the default
  path, replacing the O(n²) crossJoin.

All vector math is JVM-side (``aggregate``/``zip_with`` fold) — at 64-1024
dims whole-stage codegen keeps this in the scan stage; for very high dims a
vectorized pandas UDF over Arrow batches is the fallback (numpy matmul),
left to the caller.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _lit_vec(q: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in q])


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a broadcast literal query vector."""
    a = _as_double(F.col(vec_col))
    sim = cosine_expr(a, _lit_vec(query_vec))
    return (
        df.select(id_col, F.round(sim, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# Hyperplane LSH
# --------------------------------------------------------------------------

def random_hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes without numpy RNG state:
    plane[p][d] from a splitmix-style integer hash of (seed, p, d), mapped
    to [-1, 1). Stable across engines and processes."""
    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            x = (seed * 0x9E3779B9 + p * 0x85EBCA6B + d * 0xC2B2AE35) & 0xFFFFFFFF
            x ^= x >> 16
            x = (x * 0x45D9F3B) & 0xFFFFFFFF
            x ^= x >> 16
            row.append((x / 0x80000000) - 1.0)
        out.append(row)
    return out


def lsh_bucket_expr(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """Sign-bit bucket string, one char per hyperplane."""
    a = _as_double(vec)
    bits = [
        F.when(dot_expr(a, _lit_vec(h)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for h in hyperplanes
    ]
    return F.concat(*bits)


def _probe_buckets(bucket: str, probe_hamming: int) -> list[str]:
    """The query bucket plus every bucket within probe_hamming bit flips."""
    out = [bucket]
    n = len(bucket)
    for dist in range(1, probe_hamming + 1):
        for idxs in itertools.combinations(range(n), dist):
            b = list(bucket)
            for i in idxs:
                b[i] = "0" if b[i] == "1" else "1"
            out.append("".join(b))
    return out


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    probe_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: rank only vectors in the query's LSH
    bucket neighborhood. On a real deployment the bucket column is
    precomputed and the table partitioned by it — the probe then becomes a
    partition-pruned scan of ~(probes/2^planes) of the data."""
    dim = len(query_vec)
    hp = random_hyperplanes(dim, planes, seed)
    qbits = "".join(
        "1" if sum(q * h for q, h in zip(query_vec, hrow)) >= 0 else "0" for hrow in hp
    )
    buckets = _probe_buckets(qbits, probe_hamming)
    bucketed = df.withColumn("_bucket", lsh_bucket_expr(F.col(vec_col), hp))
    pruned = bucketed.filter(F.col("_bucket").isin(buckets))
    return brute_force_topk(pruned, query_vec, k, id_col, vec_col)


# --------------------------------------------------------------------------
# IVF-style coarse quantization
# --------------------------------------------------------------------------

def label_centroids(df: DataFrame, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Per-label mean vectors — the coarse quantizer codebook. Dimension-wise
    avg via posexplode → groupBy(label, dim) → re-assemble; one shuffle whose
    cardinality is labels × dims (tiny)."""
    exploded = df.select(label_col, F.posexplode(_as_double(F.col(vec_col))).alias("dim", "x"))
    per_dim = exploded.groupBy(label_col, "dim").agg(F.avg("x").alias("m"))
    return (
        per_dim.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("pairs"))
        .select(label_col, F.transform("pairs", lambda p: p["m"]).alias("centroid"))
    )


def centroid_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (IVF cell). Centroids
    arrive as driver-side literals (k×d floats — broadcast-sized by
    construction); the argmax is a fold over a literal array of structs, so
    assignment is a pure narrow map."""
    a = _as_double(F.col(vec_col))
    scored = F.array(
        *[
            F.struct(cosine_expr(a, _lit_vec(vec)).alias("sim"), F.lit(int(lbl)).alias("cell"))
            for lbl, vec in centroids
        ]
    )
    best = F.array_max(scored)
    return df.select(
        id_col,
        best["cell"].alias("cell"),
        F.round(best["sim"], 6).alias("sim"),
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end IVF search: rank cells by query→centroid cosine
    DRIVER-side (k×d floats — no cluster work), keep the ``nprobe``
    nearest cells, assign-and-filter vectors to those cells in one narrow
    map, exact cosine top-k within. On a real deployment the cell column
    is precomputed (:func:`centroid_assign`) and the table partitioned by
    it, so the probe is a partition-pruned scan of ~nprobe/k-cells of the
    data; here the assignment argmax rides the same scan."""
    def cos(a: list[float], b: list[float]) -> float:
        na = sum(x * x for x in a) ** 0.5 or 1.0
        nb = sum(x * x for x in b) ** 0.5 or 1.0
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    probe_cells = [
        int(lbl)
        for lbl, vec in sorted(centroids, key=lambda c: -cos(query_vec, c[1]))[:nprobe]
    ]
    a = _as_double(F.col(vec_col))
    scored = F.array(
        *[
            F.struct(cosine_expr(a, _lit_vec(vec)).alias("sim"), F.lit(int(lbl)).alias("cell"))
            for lbl, vec in centroids
        ]
    )
    pruned = df.filter(F.array_max(scored)["cell"].isin(probe_cells))
    return brute_force_topk(pruned, query_vec, k, id_col, vec_col)


def projection_directions(dim: int, m: int, seed: int = 7) -> list[list[float]]:
    """``m`` deterministic unit-norm projection directions (normalized
    :func:`random_hyperplanes` rows) for grid blocking."""
    out = []
    for row in random_hyperplanes(dim, m, seed):
        nrm = sum(x * x for x in row) ** 0.5 or 1.0
        out.append([x / nrm for x in row])
    return out


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_projections: int = 2,
    seed: int = 7,
    round_to: int = 6,
    method: str = "grid",
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LOSSLESS projection-grid blocking.

    Default ``method='grid'``: project each L2-normalized vector onto
    ``n_projections`` fixed unit directions; ``cosine(a,b) >= t`` implies
    ``||â-b̂|| <= sqrt(2-2t) =: w`` (unit sphere chord), and a 1-Lipschitz
    projection therefore moves by at most ``w`` — so a qualifying pair lands
    in the same or an adjacent cell of a width-``w`` grid in EVERY
    projection. Each vector emits its 2^m grid-corner keys
    ``(c_j + e_j, e in {0,1}^m)``; per-dimension adjacency guarantees a
    shared key (pick ``e``/``f`` per axis), so candidate generation has
    100% recall BY CONSTRUCTION at any threshold — no LSH recall gamble —
    while the join cost is #colliding-cell pairs, never O(n²). Candidates
    are then verified with exact cosine (filter on the RAW value; rounding
    happens once, in the final select, so the result is identical to the
    brute-force reference at every threshold).

    Pruning power scales with the threshold: at near-dup thresholds
    (t >= 0.9, w <= 0.45) cells are narrow and the self-join touches only
    genuinely close vectors; at low thresholds the grid degrades gracefully
    toward all-pairs — which is the true output size anyway. ``method=
    'exact'`` keeps the O(n²) crossJoin as a debug baseline.
    """
    base = df.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
    if method == "exact":
        a = base.select(F.col("_id").alias("id1"), F.col("_v").alias("_v1"))
        b = base.select(F.col("_id").alias("id2"), F.col("_v").alias("_v2"))
        return (
            a.crossJoin(b)
            .filter(F.col("id1") < F.col("id2"))
            .withColumn("_cos", cosine_expr(F.col("_v1"), F.col("_v2")))
            .filter(F.col("_cos") >= threshold)
            .select("id1", "id2", F.round("_cos", round_to).alias("cosine"))
        )
    width = max((2.0 - 2.0 * threshold), 1e-12) ** 0.5
    dim = len(df.select(vec_col).first()[0])
    dirs = projection_directions(dim, n_projections, seed)
    # Materialize the projections as their own attribute before deriving the
    # 2^m keys from them — inlining the m dot products into every key would
    # duplicate the expensive fold 2^m times in codegen (CLAUDE.md perf rule).
    proj = base.select(
        "_id",
        F.array(
            *[
                F.floor(cosine_expr(F.col("_v"), _lit_vec(u)) / F.lit(width)).cast("long")
                for u in dirs
            ]
        ).alias("_c"),
    )
    corners = F.array(
        *[
            F.concat_ws(
                ",",
                *[
                    (F.element_at(F.col("_c"), j + 1) + F.lit(e[j])).cast("string")
                    for j in range(n_projections)
                ],
            )
            for e in itertools.product((0, 1), repeat=n_projections)
        ]
    )
    # explode_outer: keeps the projection expression above the exchange
    # (same implicit-size()>0 pushdown trap as operators/dedup.py).
    melted = proj.select("_id", F.explode_outer(corners).alias("_k"))
    a = melted.select(F.col("_id").alias("id1"), "_k")
    b = melted.select(F.col("_id").alias("id2"), "_k")
    cand = a.join(b, "_k").filter(F.col("id1") < F.col("id2")).select("id1", "id2").distinct()
    v1 = base.select(F.col("_id").alias("id1"), F.col("_v").alias("_v1"))
    v2 = base.select(F.col("_id").alias("id2"), F.col("_v").alias("_v2"))
    return (
        cand.join(v1, "id1")
        .join(v2, "id2")
        .withColumn("_cos", cosine_expr(F.col("_v1"), F.col("_v2")))
        .filter(F.col("_cos") >= threshold)
        .select("id1", "id2", F.round("_cos", round_to).alias("cosine"))
    )

"""Vector similarity search over embedding columns (SURVEY §2.11).

Brute-force cosine top-k as the correctness baseline, and an LSH-bucketed
(random-hyperplane / sign-LSH) variant as the 100 TB scale path.  All
distances are built-in expressions (`zip_with` + `aggregate` over
``array<float>`` columns) — JVM-side, no Python UDFs.

Scale design:
- `cosine(a, b)` is a pure expression → usable inside any join/filter and
  fused by whole-stage codegen;
- brute-force top-k broadcasts the (small) query set against the corpus:
  one pass, per-partition heaps via window row_number, no corpus shuffle;
- sign-LSH buckets both sides by the sign pattern of projections onto
  deterministic pseudo-random hyperplanes (derived from xxhash64, so
  executors agree without shipping a model); candidate generation joins
  on bucket equality — at 1000 executors the corpus-side bucketing is a
  single narrow pass and only candidates shuffle.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (→ NULL, not NaN)."""
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d)


def cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine` with the norms precomputed per side.

    Higher-order array folds are interpreted (not whole-stage-codegen'd),
    so inside an N_queries × N_corpus score the inline ``cosine`` costs
    THREE folds per pair and recomputes each corpus norm N_queries times.
    Hoisting ``norm`` into a per-side projection before the join makes it
    one fold per pair — same doubles, same rounding, ~3× less work."""
    d = na * nb
    return F.when(d > 0, dot(a, b) / d)


def as_double_array(a: Column) -> Column:
    """Promote array<float> to array<double> so accumulation happens in
    float64 on both engines (DuckDB lists compare via ::DOUBLE[])."""
    return F.transform(a, lambda x: x.cast("double"))


def brute_force_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries × corpus scan.

    Output: (query_id, vec_id, cos, rn ≤ k), ranked on the rounded cosine
    with vec_id tiebreak (deterministic across engines/parallelism).
    """
    from hfp_loader_spark.operators.relational import top_k_per_group

    q = queries.select(
        F.col(query_id_col),
        as_double_array(F.col(vec_col)).alias("_qvec"),
    ).withColumn("_qnorm", norm(F.col("_qvec")))
    c = corpus.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_cvec")
    ).withColumn("_cnorm", norm(F.col("_cvec")))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(
            cosine_prenormed(
                F.col("_qvec"), F.col("_cvec"), F.col("_qnorm"), F.col("_cnorm")
            ),
            round_to,
        ).alias("cos"),
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


def _hyperplane(dim: int, plane: int) -> Column:
    """Deterministic pseudo-random hyperplane: ±1 per dimension derived
    from md5(plane, dim) at plan-build time.  Pure literals — Catalyst
    constant-folds the whole plane array, so executors evaluate zero hash
    calls per row; and the derivation is seed-stable across sessions, so
    there is no model object to ship."""
    import hashlib

    signs = [
        1.0
        if hashlib.md5(f"p{plane}d{d}".encode()).digest()[0] % 2 == 0
        else -1.0
        for d in range(dim)
    ]
    return F.array(*[F.lit(s) for s in signs])


def signlsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane (sign of projection).

    Loop-style over a single folded plane-matrix constant — same
    compile-time rationale as :func:`_centroids_lit`."""
    planes = F.array(*[_hyperplane(dim, p) for p in range(n_planes)])
    bits = F.transform(
        planes,
        # bit i → 2^i (shiftleft needs a literal shift; pow is exact for
        # the ≤ 2^53 values any sane n_planes produces)
        lambda pl, i: F.when(
            dot(vec, pl) >= 0, F.pow(F.lit(2.0), i).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc + b)


def signlsh_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    n_probes: int = 0,
    round_to: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: compare only within matching sign-LSH
    buckets (plus ``n_probes`` single-bit-flip neighbor buckets for
    recall).  The corpus is bucketed in one narrow pass; only bucket-equal
    pairs are scored.  Candidate count ≈ N·(1+n_probes)/2^n_planes per
    query.

    Sizing rule (IVF-style): pick ``n_planes ≈ log2(N / target_bucket)``
    so buckets hold ~100-1000 vectors — at N=10^9 and 2^16 buckets each
    bucket holds ~15k vectors and a 5-probe query scores ~75k candidates
    instead of a billion.  Small corpora need FEW planes (recall collapses
    when buckets hold fewer vectors than k)."""
    from hfp_loader_spark.operators.relational import top_k_per_group

    c = (
        corpus.select(
            F.col(id_col),
            as_double_array(F.col(vec_col)).alias("_cvec"),
        )
        .withColumn("_bucket", signlsh_bucket(F.col("_cvec"), dim, n_planes))
        .withColumn("_cnorm", norm(F.col("_cvec")))
    )

    q = queries.select(
        F.col(query_id_col),
        as_double_array(F.col(vec_col)).alias("_qvec"),
    ).withColumn("_qbucket", signlsh_bucket(F.col("_qvec"), dim, n_planes))
    # multi-probe: also look in buckets one bit-flip away
    probes = F.array(
        F.col("_qbucket"),
        *[
            F.col("_qbucket").bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), p))
            for p in range(min(n_probes, n_planes))
        ],
    )
    q = q.select(
        query_id_col,
        "_qvec",
        norm(F.col("_qvec")).alias("_qnorm"),
        F.explode(probes).alias("_bucket"),
    )
    scored = c.join(F.broadcast(q), "_bucket").select(
        query_id_col,
        id_col,
        F.round(
            cosine_prenormed(
                F.col("_qvec"), F.col("_cvec"), F.col("_qnorm"), F.col("_cnorm")
            ),
            round_to,
        ).alias("cos"),
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


def train_ivf_centroids(
    corpus: DataFrame,
    nlist: int,
    vec_col: str = "embedding",
    sample_cap: int = 4096,
    iters: int = 8,
    seed: int = 42,
    fraction: float | None = None,
) -> list[list[float]]:
    """Train unit centroids for an IVF index: spherical k-means on a
    seeded sample, driver-side numpy.

    Scale design: the collect is bounded by ``sample_cap`` rows and the
    Lloyd iterations cost O(sample_cap · nlist · dim) on the driver —
    independent of corpus size.  The resulting centroids are a few KB of
    plan literals; nothing is shipped to executors beyond the plan, and
    no model object / MLlib pipeline has to be persisted.

    Pass ``fraction`` (sampling rate that yields ≳ sample_cap rows) when
    the corpus size is known even approximately — deriving it otherwise
    costs a ``count()``, i.e. a full scan before training ever starts.
    """
    import numpy as np

    # size>0 drops NULL and empty vectors (size(NULL) is NULL → filtered)
    # — a ragged sample would crash the np.array below; the python-side
    # dim guard additionally drops any stray length-mismatched vector
    sample = corpus.select(vec_col).where(F.size(vec_col) > 0)
    if fraction is None:
        fraction = min(1.0, 4.0 * sample_cap / max(1, sample.count()))
    if fraction < 1.0:
        sample = sample.sample(fraction=fraction, seed=seed)
    rows = sample.limit(sample_cap).collect()
    if not rows:
        raise ValueError("no non-empty vectors to train IVF centroids on")
    dim = len(rows[0][vec_col])
    x = np.array(
        [r[vec_col] for r in rows if len(r[vec_col]) == dim],
        dtype=np.float64,
    )
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms

    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        # spherical Lloyd step: assign by max dot, re-mean, re-normalize
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members) == 0:  # dead cell → reseed from the sample
                cent[c] = x[rng.randint(len(x))]
                continue
            m = members.mean(axis=0)
            n = np.linalg.norm(m)
            cent[c] = m / n if n > 0 else cent[c]
    return [[float(v) for v in c] for c in cent]


def save_ivf_centroids(
    spark, centroids: list[list[float]], root: str, meta: dict | None = None
) -> int:
    """Persist trained IVF centroids as a versioned-table snapshot (one
    row per cell: ``(cell, centroid array<double>)``) — same
    train-once/serve-forever contract as :func:`save_pq_codebooks`; an
    index's cell geometry must stay FIXED once corpus vectors are tagged
    with cell ids, or every stored tag silently dangles."""
    from hfp_loader_spark.versioned import commit_snapshot

    df = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    return commit_snapshot(
        spark, df, root, mode="overwrite",
        meta={"nlist": len(centroids), **(meta or {})},
    )


def load_ivf_centroids(
    spark, root: str, version: int | None = None
) -> list[list[float]]:
    """Load centroids stored by :func:`save_ivf_centroids` (latest by
    default; ``version`` time-travels to an older index build)."""
    from hfp_loader_spark.versioned import read_snapshot

    rows = read_snapshot(spark, root, version).collect()
    out: list[list[float] | None] = [None] * (
        max(r["cell"] for r in rows) + 1
    )
    for r in rows:
        out[r["cell"]] = list(r["centroid"])
    missing = [i for i, c in enumerate(out) if c is None]
    if missing:
        raise ValueError(f"stored centroids incomplete: missing cells {missing[:4]}")
    return out  # type: ignore[return-value]


def _parsed_array_lit(rows, fmt) -> Column:
    """A (possibly nested) constant array built by PARSING one SQL
    string JVM-side instead of ``F.lit`` on a nested Python list —
    ``F.lit`` materializes the matrix element-by-element over py4j
    (measured ~350 ms per 8×64 int matrix, ~1 ms parsed; the serve
    paths build several such constants per plan, so the py4j tax was
    the single largest driver-side cost of a warm serve).  Constant
    folding collapses the parsed CreateArray into one Literal node, so
    the optimizer/AQE walk cost is identical to ``F.lit``'s.  ``fmt``
    renders one scalar (``f"{v}L"`` for bigint, ``f"{v!r}D"`` for
    double — both parse correctly-rounded, so values round-trip
    bit-exact)."""

    def render(x) -> str:
        if isinstance(x, (list, tuple)):
            return "array(" + ",".join(render(e) for e in x) + ")"
        return fmt(x)

    if not rows:
        raise ValueError("cannot build an empty literal array via parse")
    return F.expr(render(list(rows)))


def _centroids_lit(centroids: list[list[float]]) -> Column:
    """The centroid matrix as ONE array<array<double>> literal constant.

    Shape matters twice: per-centroid unrolled expressions generate
    O(nlist · dim) Java source (measured ~8s of one-time Janino/JIT
    compilation), and even a CreateArray-of-literals tree carries
    O(nlist · dim) expression NODES that every optimizer pass — and
    every AQE re-optimization at every stage boundary — re-walks.
    Built via :func:`_parsed_array_lit` (one JVM parse) and folded to a
    single Literal node: milliseconds to plan, identical to evaluate."""
    return _parsed_array_lit(
        [[float(v) for v in c] for c in centroids], lambda v: f"{v!r}D"
    )


def _centroid_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """array<double> of dot(vec, centroid_i) — one loop over a folded
    2-D constant."""
    return F.transform(_centroids_lit(centroids), lambda c: dot(vec, c))


def ivf_assign_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid cell id (0-based; ties → lowest cell)."""
    scores = _centroid_scores(vec, centroids)
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def ivf_probe_cells(
    vec: Column, centroids: list[list[float]], nprobe: int
) -> Column:
    """The ``nprobe`` nearest cell ids, best first (score-desc, id tiebreak)."""
    scored = F.transform(
        _centroids_lit(centroids),
        lambda c, i: F.struct(dot(vec, c).alias("s"), i.cast("int").alias("i")),
    )
    ranked = F.reverse(F.array_sort(scored))
    return F.transform(F.slice(ranked, 1, nprobe), lambda x: x["i"])


def ivf_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    nlist: int,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 4,
    centroids: list[list[float]] | None = None,
    train_fraction: float | None = None,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index.

    The scale shape: one narrow pass tags each corpus vector with its
    nearest-centroid cell (pure expressions, no shuffle); each query
    probes its ``nprobe`` nearest cells; only cell-equal pairs are scored
    — ~nprobe/nlist of the corpus per query instead of all of it.  At
    100 TB the cell column is written once (partition or cluster by it)
    and every subsequent search prunes to the probed cells' files.

    Compared to sign-LSH buckets, IVF cells adapt to the data
    distribution (centroids fall where vectors are dense), giving better
    recall at the same candidate budget on clustered corpora.
    """
    from hfp_loader_spark.operators.relational import top_k_per_group

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, nlist, vec_col=vec_col, fraction=train_fraction
        )

    c = (
        corpus.select(
            F.col(id_col), as_double_array(F.col(vec_col)).alias("_cvec")
        )
        .withColumn("_cell", ivf_assign_cell(F.col("_cvec"), centroids))
        .withColumn("_cnorm", norm(F.col("_cvec")))
    )

    q = queries.select(
        F.col(query_id_col),
        as_double_array(F.col(vec_col)).alias("_qvec"),
    ).select(
        query_id_col,
        "_qvec",
        norm(F.col("_qvec")).alias("_qnorm"),
        F.explode(
            ivf_probe_cells(F.col("_qvec"), centroids, nprobe)
        ).alias("_cell"),
    )
    scored = c.join(F.broadcast(q), "_cell").select(
        query_id_col,
        id_col,
        F.round(
            cosine_prenormed(
                F.col("_qvec"), F.col("_cvec"), F.col("_qnorm"), F.col("_cnorm")
            ),
            round_to,
        ).alias("cos"),
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float,
    nlist: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    round_to: int = 4,
    train_fraction: float | None = None,
    use_arrow: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding space,
    then prune near-identical vectors WITHIN each cluster only.

    The cluster-then-prune recipe from the SemDeDup line of work: k-means
    partitions the corpus into ``nlist`` cells (reusing the IVF trainer —
    bounded driver sample, centroids as plan literals), and only
    within-cell pairs are cosine-scored.  A vector is pruned when a
    SMALLER-id vector in the same cell scores ≥ ``threshold`` (the
    deterministic keep-lowest-id representative rule; the paper's
    keep-farthest-from-centroid variant swaps the tiebreak, not the
    shape).  Output: ``(id, cell, kept)`` for every corpus row.

    Scale: the all-pairs product never happens — pair work is
    Σ|cell|² ≈ N²/nlist, and with ``nlist ∝ N/target_cell`` each cell is
    constant-sized so the join is linear in N.  The cell tag is one
    narrow no-shuffle pass; the self-join shuffles on the cell id.  True
    duplicates (cos → 1) virtually always share a nearest centroid, so
    recall concentrates exactly where dedup matters (the in-cell recall
    contract is oracle-checked in plans/similarity_queries.py).

    ``use_arrow`` (default): the in-cell scoring runs as ONE
    ``applyInPandas`` per cell — a blocked numpy/BLAS matmul over the
    cell's matrix, which is how the SemDeDup recipe actually executes at
    scale (per-cluster matrix similarity).  Measured ~10× the
    expression-fold path at 500k in-cell pairs (interpreted higher-order
    folds pay ~dim interpreted ops per pair; BLAS pays a fused multiply).
    Each cell must fit a worker: size ``nlist ∝ N / target_cell`` with
    target_cell ~10-100k vectors; the similarity matrix is computed in
    ≤~256 MB row blocks, never |cell|² at once.  ``use_arrow=False``
    keeps the pure-expression join (no Python workers; bit-identical
    rounding with the SQL oracles).
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, nlist, vec_col=vec_col, fraction=train_fraction
        )
    # NULL/empty vectors carry no semantic signal and would reach the
    # per-cell numpy matrix as ragged rows — they are excluded from the
    # operator's universe entirely (absent from the keep-list, neither
    # kept nor pruned), the same exclusion the NULL-safe cosine applies
    # in the brute-force paths
    c = corpus.where(F.size(vec_col) > 0).select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_v")
    ).withColumn("_cell", ivf_assign_cell(F.col("_v"), centroids))
    if not use_arrow:
        # the expression join consumes c on BOTH sides and per-pair
        # scoring wants prenormed folds — neither applies to the arrow
        # path, which reads the frame exactly once and normalizes in
        # numpy, so the norm column and the persist would be pure waste
        c = c.withColumn("_n", norm(F.col("_v"))).persist()
    if use_arrow:
        return _blas_keep_list(c, id_col, "_cell", threshold, round_to)
    a = c.alias("a")
    b = c.alias("b")
    removed = (
        a.join(
            b,
            (F.col("a._cell") == F.col("b._cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(
            F.round(
                cosine_prenormed(
                    F.col("a._v"), F.col("b._v"), F.col("a._n"), F.col("b._n")
                ),
                round_to,
            )
            >= threshold
        )
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("_removed", F.lit(True))
    )
    return c.join(removed, id_col, "left").select(
        id_col,
        F.col("_cell").alias("cell"),
        F.coalesce(~F.col("_removed"), F.lit(True)).alias("kept"),
    )


def _blas_keep_list(
    c: DataFrame,
    id_col: str,
    cell_col: str,
    threshold: float,
    round_to: int,
) -> DataFrame:
    """The per-cell BLAS prune shared by :func:`semantic_dedup` and
    :func:`semantic_dedup_exact_cells` (``use_arrow=True``): ONE
    ``applyInPandas`` per cell over ``(id_col, _v, cell_col)`` — a
    row-blocked numpy matmul over the cell's matrix (≤~256 MB blocks,
    never |cell|² at once), smaller-id rows remove larger ones at
    ``np.round(cos, round_to) >= threshold``.  Output ``(id_col long,
    cell int, kept bool)``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cell", IntegerType()),
            StructField("kept", BooleanType()),
        ]
    )
    thr = float(threshold)
    nd = int(round_to)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ido = ids[order]
        x = np.array(pdf["_v"].tolist(), dtype=np.float64)[order]
        nrm = np.linalg.norm(x, axis=1)
        nrm[nrm == 0] = 1.0
        xn = x / nrm[:, None]
        nloc = len(ido)
        removed = np.zeros(nloc, dtype=bool)
        # row-blocked S = Xn @ Xn.T: bound block memory ~256 MB of
        # doubles regardless of cell size
        blk = max(1, (1 << 25) // max(nloc, 1))
        for s in range(0, nloc, blk):
            e = min(s + blk, nloc)
            sb = np.round(xn[s:e] @ xn.T, nd) >= thr
            gi = np.arange(s, e)[:, None]
            gj = np.arange(nloc)[None, :]
            sb &= gi < gj  # only smaller-id rows remove j
            removed |= sb.any(axis=0)
        return pd.DataFrame(
            {
                id_col: ido.astype("int64"),
                "cell": np.full(nloc, int(pdf[cell_col].iloc[0]), "int32"),
                "kept": ~removed,
            }
        )

    return c.groupBy(cell_col).applyInPandas(prune, out_schema)


def quantize_embedding(vec: Column, bits: int = 8) -> Column:
    """Symmetric int8 quantization of an embedding, as a struct
    ``(scale double, q array<smallint>)`` — pure JVM expressions.

    ``scale = max|x| / qmax``, ``q_i = round(x_i / scale)``.  At 100 TB
    this is the storage op that matters most for vector corpora: 4× less
    parquet, 4× more vectors per shuffle/broadcast byte; candidate
    generation (LSH buckets, IVF cells) works on the int8 form and only
    the final rerank touches float32.  Zero vectors quantize to scale 0 /
    all-zero q (guarded — no division by zero).
    """
    qmax = float(2 ** (bits - 1) - 1)
    absmax = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    scale = (absmax / F.lit(qmax)).cast("double")
    q = F.when(
        scale > 0,
        F.transform(vec, lambda x: F.round(x / scale).cast("smallint")),
    ).otherwise(F.transform(vec, lambda x: F.lit(0).cast("smallint")))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_embedding(quant: Column) -> Column:
    """Inverse of :func:`quantize_embedding` (lossy: ≤ scale/2 per dim)."""
    return F.transform(
        quant["q"], lambda v: v.cast("double") * quant["scale"]
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    Brute all-pairs is the sf-test baseline; at scale call with a bucketed
    frame (`signlsh_bucket` as join key) so only same-bucket pairs score.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        as_double_array(F.col(vec_col)).alias("va"),
    ).withColumn("_na", norm(F.col("va")))
    b = df.select(
        F.col(id_col).alias("id_b"),
        as_double_array(F.col(vec_col)).alias("vb"),
    ).withColumn("_nb", norm(F.col("vb")))
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a",
        "id_b",
        F.round(
            cosine_prenormed(
                F.col("va"), F.col("vb"), F.col("_na"), F.col("_nb")
            ),
            round_to,
        ).alias("cos"),
    )
    return pairs.where(F.col("cos") >= threshold)


def arrow_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 4,
    max_queries: int = 10_000,
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul (mapInPandas).

    The vectorized twin of :func:`brute_force_top_k`: the (small) query
    matrix ships to every partition in the task closure; each Arrow batch
    of corpus vectors becomes one numpy matrix and ALL query-candidate
    scores come from a single BLAS matmul — ~10-100× the throughput of
    per-row fold expressions when dims are wide.  Per-batch local top-k
    bounds the shuffle to (batches × queries × k) rows before the exact
    global top-k window.

    ``max_queries`` guards the driver-side collect of the query matrix:
    the design premise is a SMALL query side shipped in the task closure
    (10k × 768 float64 ≈ 60 MB — near the practical closure-broadcast
    ceiling already).  A million-query "query side" would OOM the driver
    silently; raise loudly instead and point at the join formulation.
    """
    import numpy as np

    from hfp_loader_spark.operators.relational import top_k_per_group

    # limit+1 collect: ONE job both enforces the cap (one extra row tells
    # us it is breached without a full pass over an unboundedly large
    # query table) and yields the rows — a separate count() probe would
    # re-execute the whole query-side plan before the real collect.
    q_rows = (
        queries.select(query_id_col, vec_col).limit(max_queries + 1).collect()
    )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"arrow_top_k query side exceeds max_queries={max_queries}: "
            "the query matrix is collected to the driver and shipped in "
            "every task closure, which only works for a small query set. "
            "For large query sides use brute_force_top_k (a distributed "
            "join) or raise max_queries explicitly if you know the size."
        )
    # NULL-cos contract, identical to brute_force_top_k: a pair scores
    # NULL when either side is NULL/empty/zero-norm, and NULL scores
    # rank after every real score (desc nulls-last) with the vec_id
    # tiebreak.  Queries and corpus rows are therefore split into
    # scoreable and unscoreable sets instead of being fed raggedly into
    # np.array (which raises on mixed lengths).
    q_ids = [r[query_id_col] for r in q_rows]
    q_vecs = [r[vec_col] for r in q_rows]
    dim = next((len(v) for v in q_vecs if v), 0)
    valid_q = [
        i
        for i, v in enumerate(q_vecs)
        if v is not None and len(v) == dim and dim > 0
    ]
    q_mat = np.array([q_vecs[i] for i in valid_q], dtype=np.float64)
    if q_mat.size:
        qn = np.linalg.norm(q_mat, axis=1, keepdims=True)
        zero_q = qn[:, 0] == 0.0
        qn[qn == 0] = 1.0
        q_norm = q_mat / qn
        valid_q = [i for i, z in zip(valid_q, zero_q) if not z]
        q_norm = q_norm[~zero_q]
    else:
        q_norm = q_mat
    null_q_ids = [
        int(q_ids[i]) for i in range(len(q_ids)) if i not in set(valid_q)
    ]
    valid_q_ids = np.array([q_ids[i] for i in valid_q])

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(query_id_col, LongType()),
            StructField(id_col, LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            vecs = list(pdf[vec_col])
            all_ids = pdf[id_col].to_numpy()
            ok = np.array(
                [v is not None and len(v) == dim for v in vecs], dtype=bool
            )
            c_mat = (
                np.array(
                    [v for v, m in zip(vecs, ok) if m], dtype=np.float64
                )
                if ok.any()
                else np.zeros((0, max(dim, 1)))
            )
            if c_mat.size:
                norms = np.linalg.norm(c_mat, axis=1, keepdims=True)
                ok[np.flatnonzero(ok)[norms[:, 0] == 0.0]] = False
                keep = norms[:, 0] != 0.0
                c_mat, norms = c_mat[keep], norms[keep]
            ids = all_ids[ok]
            # NULL-cos tails can only matter when real scores run out,
            # and the global ranking breaks NULL ties by ascending id —
            # so the k+8 smallest relevant ids per batch are exact
            null_take = k + 8
            null_ids = [int(i) for i in sorted(all_ids[~ok])[:null_take]]
            out = {query_id_col: [], id_col: [], "cos": []}
            if c_mat.size and q_norm.size:
                sims = (c_mat / norms) @ q_norm.T  # (batch, n_queries)
                # k + margin: local selection is on raw sims, global
                # ranking on ROUNDED sims + id tiebreak — the margin
                # keeps rounded ties from being cut at batch boundaries
                t2 = min(k + 8, len(ids))
                part = np.argpartition(-sims, t2 - 1, axis=0)[:t2]
                for qi in range(sims.shape[1]):
                    rows = part[:, qi]
                    out[query_id_col].extend(
                        [int(valid_q_ids[qi])] * len(rows)
                    )
                    out[id_col].extend(int(i) for i in ids[rows])
                    out["cos"].extend(
                        round(float(s), round_to) for s in sims[rows, qi]
                    )
            # scoreable queries additionally pair with the unscoreable
            # corpus prefix at cos NULL; unscoreable queries score NULL
            # against EVERYTHING, so they take the batch's smallest ids
            # overall (disjoint sets — no duplicate (query, id) rows)
            for q in valid_q_ids:
                out[query_id_col].extend([int(q)] * len(null_ids))
                out[id_col].extend(null_ids)
                out["cos"].extend([None] * len(null_ids))
            head_ids = [int(i) for i in sorted(all_ids)[:null_take]]
            for q in null_q_ids:
                out[query_id_col].extend([int(q)] * len(head_ids))
                out[id_col].extend(head_ids)
                out["cos"].extend([None] * len(head_ids))
            yield pd.DataFrame(
                {
                    query_id_col: pd.array(
                        out[query_id_col], dtype="Int64"
                    ),
                    id_col: pd.array(out[id_col], dtype="Int64"),
                    "cos": pd.array(out["cos"], dtype="Float64"),
                }
            )

    local = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    return top_k_per_group(
        local, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


# --- Product quantization (PQ) --------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    sample_cap: int = 4096,
    iters: int = 10,
    seed: int = 42,
    fraction: float | None = None,
    normalize: bool = True,
) -> list[list[list[float]]]:
    """Train PQ codebooks: split the vector into ``m`` subspaces, run L2
    k-means (``ksub`` centroids) independently in each — driver-side numpy
    on a seeded bounded sample, exactly like :func:`train_ivf_centroids`.

    Returns ``codebooks[m][ksub][dim/m]``.  ``normalize=True`` trains on
    L2-normalized vectors so ADC dot products approximate COSINE (the
    convention every entry in this module uses).

    Scale design: the collect is bounded by ``sample_cap``; training costs
    O(sample_cap · ksub · dim) on the driver, independent of corpus size;
    the codebooks are m·ksub·(dim/m) doubles ≈ a few KB of plan literals —
    no model artifact to persist or ship."""
    import numpy as np

    # same ragged-sample guard as train_ivf_centroids: size>0 excludes
    # NULL/empty vectors, the dim check any stray mismatched length
    sample = corpus.select(vec_col).where(F.size(vec_col) > 0)
    if fraction is None:
        fraction = min(1.0, 4.0 * sample_cap / max(1, sample.count()))
    if fraction < 1.0:
        sample = sample.sample(fraction=fraction, seed=seed)
    rows = sample.limit(sample_cap).collect()
    if not rows:
        raise ValueError("no non-empty vectors to train PQ codebooks on")
    dim = len(rows[0][vec_col])
    x = np.array(
        [r[vec_col] for r in rows if len(r[vec_col]) == dim],
        dtype=np.float64,
    )
    if normalize:
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        x = x / norms
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books: list[list[list[float]]] = []
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cent = xs[rng.choice(len(xs), size=min(ksub, len(xs)), replace=False)]
        for _ in range(iters):
            # plain L2 Lloyd: assign to nearest centroid, re-mean
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                members = xs[assign == c]
                if len(members) == 0:  # dead code word → reseed
                    cent[c] = xs[rng.randint(len(xs))]
                else:
                    cent[c] = members.mean(axis=0)
        books.append([[float(v) for v in c] for c in cent])
    return books


def save_pq_codebooks(
    spark,
    codebooks: list[list[list[float]]],
    root: str,
    meta: dict | None = None,
) -> int:
    """Persist trained PQ codebooks as a versioned-table snapshot
    (versioned.commit_snapshot) — returns the committed version.

    A production index trains Lloyd ONCE when the index is built and
    serves every subsequent search from the stored books; retraining per
    query session wastes a corpus sample + driver k-means and, worse,
    silently re-randomizes code assignments between sessions.  Layout:
    one row per (subspace, code) with the centroid as array<double> —
    a few KB, time-travelable, and vacuumable like any versioned table."""
    from hfp_loader_spark.versioned import commit_snapshot

    rows = [
        (j, i, [float(v) for v in c])
        for j, book in enumerate(codebooks)
        for i, c in enumerate(book)
    ]
    df = spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    )
    return commit_snapshot(
        spark,
        df,
        root,
        mode="overwrite",
        meta={"m": len(codebooks), "ksub": len(codebooks[0]), **(meta or {})},
    )


def load_pq_codebooks(
    spark, root: str, version: int | None = None
) -> list[list[list[float]]]:
    """Load PQ codebooks stored by :func:`save_pq_codebooks` (latest
    version by default; pass ``version`` to time-travel to an older
    index build).  The collect is m·ksub rows of dim/m doubles — KBs."""
    from hfp_loader_spark.versioned import read_snapshot

    rows = read_snapshot(spark, root, version).collect()
    m = max(r["subspace"] for r in rows) + 1
    ksub = max(r["code"] for r in rows) + 1
    books: list[list[list[float] | None]] = [[None] * ksub for _ in range(m)]
    for r in rows:
        books[r["subspace"]][r["code"]] = list(r["centroid"])
    missing = [
        (j, i) for j in range(m) for i in range(ksub) if books[j][i] is None
    ]
    if missing:
        raise ValueError(f"stored codebooks incomplete: missing {missing[:4]}")
    return books  # type: ignore[return-value]


def _pq_books_lit(codebooks: list[list[list[float]]]) -> Column:
    """Codebooks as ONE array<array<array<double>>> Literal node — the
    same plan-size/py4j rationale as :func:`_centroids_lit`."""
    return _parsed_array_lit(
        [[[float(v) for v in c] for c in book] for book in codebooks],
        lambda v: f"{v!r}D",
    )


def _pq_c2_lit(codebooks: list[list[list[float]]]) -> Column:
    """Per-code-word squared norms ``c2[j][i] = ‖book_j[i]‖²`` as one
    2-D Literal, precomputed at PLAN time (Python) so the in-plan
    distance never materializes a normalized vector or recomputes
    code-word norms (kept as a PARALLEL literal to :func:`_pq_books_lit`
    rather than a struct array: plain nested arrays fold to a single
    node, struct trees do not)."""
    return _parsed_array_lit(
        [[float(sum(v * v for v in c)) for c in book] for book in codebooks],
        lambda v: f"{v!r}D",
    )


def pq_encode(
    vec: Column, codebooks: list[list[list[float]]], normalize: bool = True
) -> Column:
    """PQ code of a vector: array<int> of length m — per subspace, the
    0-based index of the L2-nearest code word (of the NORMALIZED vector
    when ``normalize``, matching cosine-convention training).

    Expression shape matters here (the word_shingles lesson): a naive
    ``transform(v, x -> x/norm(v))`` embeds the norm fold in a lambda and
    re-evaluates it per ELEMENT per consumer — O(dim²·m·ksub) per row.
    Instead the argmin is algebraically rearranged so normalization never
    touches the array: ``‖v/n − c‖² = const + (c2 − 2·dot(v_sub,c)/n)``,
    with ``c2`` a plan-time literal — and the scalar norm is LET-BOUND
    via a one-element ``transform`` so the fold under it references a
    lambda variable (evaluated once per row), not the norm subtree
    (which interpreted higher-order functions would otherwise re-run per
    code word)."""
    dsub = len(codebooks[0][0])
    v = as_double_array(vec)

    c2 = _pq_c2_lit(codebooks)

    def codes_given(nn: Column) -> Column:
        def code_for(book: Column, j: Column) -> Column:
            sub = F.slice(v, j * dsub + 1, dsub)
            c2row = F.element_at(c2, j + 1)
            d2 = F.transform(
                book,
                lambda cw, i: F.element_at(c2row, i + 1)
                - F.lit(2.0) * dot(sub, cw) / nn,
            )
            return (F.array_position(d2, F.array_min(d2)) - 1).cast("int")

        return F.transform(_pq_books_lit(codebooks), code_for)

    if not normalize:
        return codes_given(F.lit(1.0))
    n = norm(v)
    # let-binding: array(n) → transform binds the evaluated norm to the
    # lambda variable; every inner reference is a variable read
    return F.element_at(
        F.transform(
            F.array(F.when(n > 0, n).otherwise(F.lit(1.0))),
            lambda nn: codes_given(nn),
        ),
        1,
    )


def pq_query_lut(qvec: Column, codebooks: list[list[list[float]]]) -> Column:
    """Per-query ADC lookup table: ``lut[j][c] = dot(q_sub_j, book_j[c])``
    as an ``array<array<double>>`` column — the classic PQ scan trick.

    ADC (asymmetric distance) keeps the query exact and scores the
    corpus by its reconstructed code words, ``Σ_j dot(q_sub_j,
    book_j[code_j])``; the scale win is I/O — the scan reads m bytes of
    codes per vector instead of dim·4 (8 GB vs 256 GB at 10⁹ 64-float
    vectors), the difference between an in-RAM rescan per query batch
    and a disk-bound one.  The LUT is computed ONCE per query row
    (m·ksub small dots) so every corpus candidate costs m array LOOKUPS
    instead of m sub-vector dots — O(m) reads per pair, not O(dim)
    interpreted fold work.  It rides the query broadcast (m·ksub
    doubles per query — 1 KB at 8×16)."""
    dsub = len(codebooks[0][0])
    return F.transform(
        _pq_books_lit(codebooks),
        lambda book, j: F.transform(
            book, lambda cw: dot(F.slice(qvec, j * dsub + 1, dsub), cw)
        ),
    )


def pq_adc_score_lut(lut: Column, codes: Column) -> Column:
    """ADC score from a precomputed :func:`pq_query_lut`: Σ_j lut[j][code_j]."""
    contrib = F.transform(
        codes, lambda code, j: F.element_at(F.element_at(lut, j + 1), code + 1)
    )
    return F.aggregate(contrib, F.lit(0.0), lambda acc, s: acc + s)


def pq_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 4,
    persist_codes: bool = True,
) -> DataFrame:
    """Approximate cosine top-k over PQ codes (ADC): encode the corpus in
    one narrow pass (at scale the codes are written once as a 32×-smaller
    index column), broadcast the exact queries WITH their precomputed
    ADC lookup tables (:func:`pq_query_lut` — so every candidate costs m
    array reads, not m sub-vector dots), rank on the rounded ADC score
    with id tiebreak.

    ``persist_codes`` caches the encoded corpus — the in-session analog
    of the written-once code index: repeated searches (and the
    shortlist+rerank pipeline's own stages) read m-byte codes from cache
    instead of re-running the encode expression, and Spark's cache
    manager dedups by canonicalized plan so every same-corpus search in
    the session shares one entry."""
    from hfp_loader_spark.operators.relational import top_k_per_group

    c = corpus.select(
        F.col(id_col),
        pq_encode(F.col(vec_col), codebooks).alias("_codes"),
    )
    if persist_codes:
        c = c.persist()
    q = queries.select(
        F.col(query_id_col),
        as_double_array(F.col(vec_col)).alias("_qvec"),
    )
    # let-bind the query norm via the one-element transform (the pq_encode
    # pattern): a norm embedded in the division lambda would re-run the
    # O(dim) fold per ELEMENT — O(dim²) per query row
    _qn = norm(F.col("_qvec"))
    qn = q.select(
        query_id_col,
        F.element_at(
            F.transform(
                F.array(F.when(_qn > 0, _qn).otherwise(F.lit(1.0))),
                lambda nn: F.transform(F.col("_qvec"), lambda x: x / nn),
            ),
            1,
        ).alias("_qhat"),
    ).select(
        query_id_col,
        pq_query_lut(F.col("_qhat"), codebooks).alias("_lut"),
    )
    scored = c.crossJoin(F.broadcast(qn)).select(
        query_id_col,
        id_col,
        F.round(
            pq_adc_score_lut(F.col("_lut"), F.col("_codes")), round_to
        ).alias("cos"),
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


def pq_reconstruction_mse(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, mse): squared reconstruction error of each NORMALIZED
    vector vs its PQ decode — the distortion diagnostic that decides
    m/ksub sizing before a corpus is committed to a compressed index.

    Uses the same algebra as :func:`pq_encode` so the normalized vector
    is never materialized in-plan: ``Σ_j ‖v_sub/n − c_j‖² = ‖v/n‖² +
    Σ_j c2_j − 2·Σ_j dot(v_sub,c_j)/n`` with ``c2`` plan-time literals
    and the scalar norm let-bound (one norm fold per row, not one per
    element or per subspace)."""
    dsub = len(codebooks[0][0])
    dim = len(codebooks) * dsub
    v = as_double_array(F.col(vec_col))
    codes = pq_encode(F.col(vec_col), codebooks)
    n = norm(v)

    def mse_given(nn: Column, unit: Column) -> Column:
        contrib = F.transform(
            codes,
            lambda code, j: F.element_at(
                F.element_at(_pq_c2_lit(codebooks), j + 1), code + 1
            )
            - F.lit(2.0)
            * dot(
                F.slice(v, j * dsub + 1, dsub),
                F.element_at(
                    F.element_at(_pq_books_lit(codebooks), j + 1),
                    code + 1,
                ),
            )
            / nn,
        )
        return (
            unit + F.aggregate(contrib, F.lit(0.0), lambda a, s: a + s)
        ) / F.lit(dim)

    mse = F.element_at(
        F.transform(
            F.array(
                F.struct(
                    F.when(n > 0, n).otherwise(F.lit(1.0)).alias("nn"),
                    F.when(n > 0, F.lit(1.0)).otherwise(F.lit(0.0)).alias(
                        "unit"
                    ),
                )
            ),
            lambda s: mse_given(s["nn"], s["unit"]),
        ),
        1,
    )
    return corpus.select(F.col(id_col), mse.alias("mse"))


def pq_top_k_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    codebooks: list[list[list[float]]],
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 4,
) -> DataFrame:
    """Production PQ search shape: ADC shortlist over the compressed
    codes, then EXACT cosine rerank of only the shortlisted candidates.

    The shortlist pass touches m-byte codes (32× less I/O than raw
    vectors at m=8 on 64-float embeddings); full vectors are read back
    for ``shortlist`` (default 4k) candidates per query via an id
    equi-join — at 100 TB that is a point-lookup-sized read instead of a
    corpus scan, and measured recall@5 rises 0.48 → 0.76 vs raw ADC on
    the driver corpus."""
    from hfp_loader_spark.operators.relational import top_k_per_group

    if shortlist is None:
        shortlist = 4 * k
    cand = pq_top_k(
        corpus,
        queries,
        shortlist,
        codebooks,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        round_to=round_to,
    ).select(query_id_col, id_col)
    c = corpus.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_cvec")
    ).withColumn("_cnorm", norm(F.col("_cvec")))
    q = queries.select(
        F.col(query_id_col), as_double_array(F.col(vec_col)).alias("_qvec")
    ).withColumn("_qnorm", norm(F.col("_qvec")))
    rer = (
        cand.join(c, id_col)
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine_prenormed(
                    F.col("_qvec"),
                    F.col("_cvec"),
                    F.col("_qnorm"),
                    F.col("_cnorm"),
                ),
                round_to,
            ).alias("cos"),
        )
    )
    return top_k_per_group(
        rer, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


def rp_sign_matrix(dim_in: int, dim_out: int) -> list[list[float]]:
    """Deterministic ±1 Johnson–Lindenstrauss sign matrix, derived from
    md5 so ANY engine can rebuild it bit-identically: entry (j, i) is +1
    iff hex digit #2 of ``md5("rp{j}d{i}")`` is even (DuckDB:
    ``substr(md5(...), 2, 1) IN ('0','2','4','6','8','a','c','e')``).
    Achlioptas (2003) shows ±1 entries satisfy the JL lemma with the
    same distortion bound as Gaussian entries — and they constant-fold
    into the plan, ship no model object, and multiply exactly."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"rp{j}d{i}".encode()).hexdigest()[1], 16) % 2
            == 0
            else -1.0
            for i in range(dim_in)
        ]
        for j in range(dim_out)
    ]


def random_project(vec: Column, dim_in: int, dim_out: int) -> Column:
    """Project ``vec`` (array<double>, length ``dim_in``) to ``dim_out``
    dimensions: ``y_j = (1/√dim_out) · Σ_i M[j][i]·x_i`` with the
    :func:`rp_sign_matrix` signs.  The matrix is a folded literal —
    Catalyst constant-folds it, executors do ``dim_out`` sequential
    zip_with·aggregate folds per row and zero hash calls.  Same fold
    order (i = 0..dim_in−1) as DuckDB's ``list_sum`` over an i-ordered
    comprehension, so rounded outputs agree across engines."""
    import math

    m = rp_sign_matrix(dim_in, dim_out)
    scale = 1.0 / math.sqrt(dim_out)
    rows = F.array(*[F.array(*[F.lit(s) for s in row]) for row in m])
    return F.transform(rows, lambda row: dot(vec, row) * F.lit(scale))


def random_projection(
    df: DataFrame,
    dim_in: int,
    dim_out: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Dimensionality reduction for embedding corpora: (id, rp) with
    ``rp`` the rounded ±1-JL projection.  The 100 TB story: a 64→16
    projection cuts every downstream shuffle, broadcast, and ANN index
    byte count 4× while keeping pairwise cosines within the JL
    distortion envelope (measured by the ``sim_rp_distortion`` contract
    entry, not assumed) — and because the matrix is derived from md5,
    a re-run, another session, or another engine projects identically
    with no persisted model artifact."""
    proj = random_project(as_double_array(F.col(vec_col)), dim_in, dim_out)
    # NULL/empty vectors project to NULL (not a zero vector): a zero rp
    # would silently rank in downstream cosine passes, and the fold's
    # empty-array result (0.0) diverges from SQL engines' NULL sum —
    # size(NULL) is NULL, so the WHEN covers both shapes
    return df.select(
        F.col(id_col),
        F.when(
            F.size(F.col(vec_col)) > 0,
            F.transform(proj, lambda x: F.round(x, round_to)),
        ).alias("rp"),
    )


def mmr_diversify(
    corpus: DataFrame,
    queries: DataFrame,
    k_select: int,
    n_candidates: int,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 4,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): from each query's exact cosine top-``n_candidates``, greedily
    select ``k_select`` results maximizing ``λ·rel(q,c) − (1−λ)·max_{s∈S}
    sim(c,s)`` — the step that turns a near-duplicate-heavy top-k into a
    DIVERSE one (retrieval-augmented data curation wants coverage, not
    five copies of the best hit).

    Output: ``(query_id, id, score, mmr_rank)`` — rank 1 is the pure
    argmax of relevance, later ranks the greedy MMR argmax; scores and
    sims are rounded before ranking so selection is deterministic across
    engines (ties → lowest id).

    Scale shape: selection is inherently sequential in ``k_select`` but
    the plan UNROLLS the k fixed steps into static DataFrame ops — no
    driver loop over rows, no UDF.  All pair state is bounded per query:
    candidate relevance (n_candidates rows) and candidate-candidate sims
    (n_candidates² rows, computed once and reused by every step); each
    step is one join + hash-agg + per-query top-1 window over ≤
    n_candidates rows.  At 1000 executors the work is embarrassingly
    parallel across queries."""
    from hfp_loader_spark.operators.relational import top_k_per_group

    cand = (
        brute_force_top_k(
            corpus, queries, n_candidates, id_col, vec_col, query_id_col,
            round_to,
        )
        .select(query_id_col, id_col, F.col("cos").alias("rel"))
        # every unrolled step references cand (and, through sel, every
        # PRIOR step's output); without lineage truncation the final
        # plan re-derives the top-k subtree O(k²) times — measured 437
        # exchanges at k=5, vs one short stage per step with the
        # checkpoints.  eager=False keeps construction job-free; each
        # RDD computes once at the first action and is reused by all
        # later steps.
        .localCheckpoint(eager=False)
    )

    vecs = corpus.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_v")
    ).withColumn("_n", norm(F.col("_v")))
    cv = cand.join(vecs, id_col)
    a = cv.select(
        query_id_col,
        F.col(id_col).alias("_ida"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = cv.select(
        query_id_col,
        F.col(id_col).alias("_idb"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    # disjoint column names throughout: sims and the selected-set copies
    # all descend from `cand`, and qualified-attribute joins on shared
    # lineage trip Spark's ambiguous-self-join analysis
    sims = (
        a.join(b, query_id_col)
        .where(F.col("_ida") != F.col("_idb"))
        .select(
            F.col(query_id_col).alias("_mq"),
            F.col("_ida").alias("_ma"),
            F.col("_idb").alias("_mb"),
            F.round(
                cosine_prenormed(
                    F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
                ),
                round_to,
            ).alias("_msim"),
        )
        # computed once at first action, reused by every unrolled step;
        # eager=False keeps plan CONSTRUCTION job-free (a catalog builder
        # must not run Spark jobs — the bloom_contains lesson)
        .localCheckpoint(eager=False)
    )

    sel = (
        top_k_per_group(
            cand, [query_id_col], [F.desc("rel"), F.asc(id_col)], 1
        )
        .select(
            query_id_col,
            id_col,
            F.col("rel").alias("score"),
            F.lit(1).alias("mmr_rank"),
        )
    )
    for t in range(2, k_select + 1):
        remaining = cand.join(
            sel.select(query_id_col, id_col), [query_id_col, id_col],
            "left_anti",
        )
        scored = (
            remaining.join(
                sims,
                (F.col(query_id_col) == F.col("_mq"))
                & (F.col(id_col) == F.col("_ma")),
            )
            .join(
                sel.select(
                    F.col(query_id_col).alias("_pq"),
                    F.col(id_col).alias("_pid"),
                ),
                (F.col("_mq") == F.col("_pq"))
                & (F.col("_mb") == F.col("_pid")),
            )
            .groupBy(query_id_col, id_col, "rel")
            .agg(F.max("_msim").alias("_ms"))
            .select(
                query_id_col,
                id_col,
                F.round(
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.col("_ms"),
                    round_to,
                ).alias("score"),
            )
        )
        pick = (
            top_k_per_group(
                scored, [query_id_col], [F.desc("score"), F.asc(id_col)], 1
            )
            .select(
                query_id_col, id_col, "score", F.lit(t).alias("mmr_rank")
            )
            .localCheckpoint(eager=False)  # see cand: stop re-derivation
        )
        sel = sel.unionByName(pick)
    return sel


def kcenter_coreset(
    emb: DataFrame,
    k_select: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal, the SelectKCenter data-selection strategy): start from
    the lowest-id vector, then repeatedly pick the point whose cosine
    distance to the ALREADY-SELECTED set is largest — a k-point subset
    whose covering radius is within 2× of optimal, i.e. the most
    geometry-covering k examples for budgeted annotation / eval-set
    seeding.  NULL/empty vectors are unselectable and excluded.

    Output: ``(id, sel_rank 1..k, min_dist)`` — ``min_dist`` is the
    selected point's distance to the prior set at selection time
    (rounded, maxmin-deterministic with id tiebreak; NULL for the
    seed).  The sequence of min_dist values is the classic coverage
    curve: it decreases, and where it plateaus is where more centers
    stop buying coverage.

    Scale shape: inherently k sequential rounds, each one corpus pass
    scoring every remaining point against the ≤ k-row BROADCAST
    selected set (map-side min over k distances, one top-1 reduction) —
    farthest-point's canonical distributed form.  Each round's pick is
    lazily checkpointed so the unrolled plan stays linear in k (the MMR
    lesson); at real scale run it over cluster/IVF representatives, not
    raw points."""
    from hfp_loader_spark.operators.relational import global_top_k

    pts = (
        emb.where(F.size(F.col(vec_col)) > 0)
        .select(
            F.col(id_col), as_double_array(F.col(vec_col)).alias("_v")
        )
        .withColumn("_n", norm(F.col("_v")))
        .localCheckpoint(eager=False)
    )
    seed = (
        pts.select(F.min(id_col).alias(id_col))
        .join(pts, id_col)
        .select(
            id_col,
            F.lit(1).alias("sel_rank"),
            F.lit(None).cast("double").alias("min_dist"),
        )
        .localCheckpoint(eager=False)
    )
    sel = seed
    for t in range(2, k_select + 1):
        sel_v = sel.join(pts, id_col).select(
            F.col("_v").alias("_sv"), F.col("_n").alias("_sn")
        )
        cand = pts.join(sel.select(id_col), id_col, "left_anti")
        scored = (
            cand.crossJoin(F.broadcast(sel_v))
            .select(
                id_col,
                F.round(
                    F.lit(1.0)
                    - cosine_prenormed(
                        F.col("_v"), F.col("_sv"), F.col("_n"), F.col("_sn")
                    ),
                    round_to,
                ).alias("_d"),
            )
            .groupBy(id_col)
            .agg(F.min("_d").alias("min_dist"))
        )
        # global argmax via TakeOrderedAndProject (per-partition heap +
        # driver merge of 1 row) — NOT a single-partition window
        pick = (
            global_top_k(
                scored, [F.desc("min_dist"), F.asc(id_col)], 1
            )
            .select(
                id_col, F.lit(t).alias("sel_rank"), "min_dist"
            )
            .localCheckpoint(eager=False)
        )
        sel = sel.unionByName(pick)
    return sel


def ivf_exact_cells_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    nlist: int,
    nprobe: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale: int = 1_000_000,
    round_to: int = 4,
) -> DataFrame:
    """IVF approximate top-k whose ENTIRE index is bit-exact across
    engines: cells come from the fixed-point integer k-means
    (``clustering.kmeans_fixed_point_model``) instead of the float
    spherical training — so cell assignment, the probe set, and the
    candidate list all have SQL twins and the approximate neighbor list
    itself is value-checkable, not just its recall floor.

    Trade vs :func:`ivf_top_k`: training is corpus-scale (``iters``
    broadcast-join rounds over the full corpus) instead of a bounded
    driver sample — pay it when cross-engine reproducibility of the
    INDEX matters (provenance, incremental re-assignment, audited
    dedup); the float spherical path stays the cheap-training default.
    Queries probe the post-final-update centroids (c_iters) while
    candidates carry the final assignment (a_iters vs c_{iters-1}) —
    the standard one-step lag of any trained-then-served index,
    identical on both engines.

    Scale shape: k-means' per-round broadcast join + (cluster, dim)
    update aggregate; then probing is a |queries|×nlist broadcast
    cross, candidates a cluster-equi join (~nprobe/nlist of the corpus
    per query), exact cosine rerank on candidates only."""
    from hfp_loader_spark.operators.clustering import (
        _sq_dist,
        kmeans_fixed_point_model,
        quantize_vec,
    )
    from hfp_loader_spark.operators.relational import top_k_per_group

    assign, cent = kmeans_fixed_point_model(
        corpus, nlist, iters, id_col=id_col, vec_col=vec_col, scale=scale
    )
    qq = queries.where(F.size(F.col(vec_col)) > 0).select(
        F.col(query_id_col),
        quantize_vec(F.col(vec_col), scale).alias("_q"),
        as_double_array(F.col(vec_col)).alias("_qvec"),
    )
    qd = qq.crossJoin(F.broadcast(cent)).select(
        query_id_col,
        "_qvec",
        F.col("cluster"),
        _sq_dist(F.col("_q"), F.col("cq")).alias("_d"),
    )
    probes = top_k_per_group(
        qd, [query_id_col], [F.asc("_d"), F.asc("cluster")], nprobe
    ).select(query_id_col, "_qvec", "cluster")
    c = corpus.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_cvec")
    ).withColumn("_cnorm", norm(F.col("_cvec")))
    # probes is bounded by construction (≤ |queries|·nprobe rows) but
    # the planner can no longer see that: the centroid frames behind it
    # are checkpointed RDDs with no size statistics (optimization r17),
    # so the estimate-driven plan would shuffle the CORPUS-sized assign
    # side by cluster.  Hint the bounded side explicitly — the same
    # shape the pretrained serve path uses (guide §3.1).
    cand = F.broadcast(probes).join(
        assign.select(id_col, "cluster"), "cluster"
    ).join(c, id_col)
    scored = cand.select(
        query_id_col,
        id_col,
        F.round(
            cosine_prenormed(
                F.col("_qvec"),
                F.col("_cvec"),
                norm(F.col("_qvec")),
                F.col("_cnorm"),
            ),
            round_to,
        ).alias("cos"),
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


def ivf_pretrained_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int,
    cent_assign: list[tuple[int, list[int]]],
    cent_probe: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 4,
    scale: int = 1_000_000,
) -> DataFrame:
    """Serve-stage IVF top-k over a PRE-TRAINED exact fixed-point index
    — the production offline-train / online-serve split of
    :func:`ivf_exact_cells_top_k`: the quantized integer centroids are
    shipped as plan literals (trained once, e.g. via
    ``clustering.kmeans_fixed_point_model``, and memoized / persisted),
    so the query plan contains NO training rounds, only the serve path.

    ``cent_assign`` must be the pre-final-update centroids
    (c_{iters-1}) and ``cent_probe`` the post-final-update centroids
    (c_iters): a trained-then-served index carries the standard
    one-step lag — candidates sit in cells assigned against
    c_{iters-1}, probes rank cells by distance to c_iters — and
    reproducing BOTH frames bit-for-bit is what makes this serve path
    value-identical to the inline-training twin (and to its SQL
    oracle's CTEs).  All serve math is the twin's: exact integer
    squared L2 with lowest-cluster tie-breaks, exact cosine rerank
    rounded to ``round_to``.

    Scale shape: cell assignment is ONE narrow no-shuffle expression
    pass over the corpus (argmin over nlist literal centroids — no
    join at all, cheaper than the broadcast join the trainer needs);
    probes are an in-row sorted slice per query; candidates a
    cluster-equi join against the bounded probe frame (~nprobe/nlist
    of the corpus per query); top-k windows per query.  At 100 TB the
    assignment column is the partition/cluster key, so probes prune
    files."""
    from hfp_loader_spark.operators.clustering import quantize_vec
    from hfp_loader_spark.operators.relational import top_k_per_group

    corp = (
        corpus.where(F.size(F.col(vec_col)) > 0)
        .select(
            F.col(id_col),
            as_double_array(F.col(vec_col)).alias("_cvec"),
            quantize_vec(F.col(vec_col), scale).alias("_cq"),
        )
        .select(
            id_col,
            "_cvec",
            _int_argmin_cluster(F.col("_cq"), cent_assign).alias("cluster"),
        )
        .withColumn("_cnorm", norm(F.col("_cvec")))
    )
    probes = _ivf_probe_frame(
        queries, cent_probe, nprobe, query_id_col, vec_col, scale
    )
    cand = F.broadcast(probes).join(corp, "cluster")
    scored = cand.select(
        query_id_col,
        id_col,
        F.round(
            cosine_prenormed(
                F.col("_qvec"),
                F.col("_cvec"),
                norm(F.col("_qvec")),
                F.col("_cnorm"),
            ),
            round_to,
        ).alias("cos"),
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


def pq_exact_codes_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    shortlist: int = 100,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale: int = 1_000_000,
    round_to: int = 4,
) -> DataFrame:
    """Product-quantization top-k whose ENTIRE index is value-checked:
    per-subspace codebooks from the grouped fixed-point k-means
    (``clustering.kmeans_fixed_point_grouped`` — one plan trains all m
    subspaces), integer ADC over exact quantized distances, exact
    cosine rerank of the shortlist.  The exact-arithmetic sibling of
    :func:`pq_top_k_rerank` (float driver-trained codebooks → rows-only
    + contracts): codes, LUTs, ADC distances, shortlist, and the final
    neighbor list all reproduce bit-for-bit on any engine.

    ``dim`` must be divisible by ``m``; vectors of any other length
    (and NULL/empty) are excluded on both engines.

    Scale shape: training = ``iters`` rounds of an (m·ksub)-row
    broadcast join + (subspace, cluster, pos) update aggregate over the
    N·m sliced rows; serving = codes (m small ints per vector) join the
    m·ksub-row per-query LUT on (subspace, code) — the
    memory-bandwidth-bound ADC pattern — then one shortlist top-k and a
    ``shortlist``-bounded rerank."""
    from hfp_loader_spark.operators.clustering import (
        _sq_dist,
        kmeans_fixed_point_grouped,
        quantize_vec,
    )
    from hfp_loader_spark.operators.relational import top_k_per_group

    assert dim % m == 0, "dim must divide into m subspaces"
    sub = dim // m

    def sliced(df: DataFrame, key_out: str, key_in) -> DataFrame:
        base = df.where(F.size(F.col(vec_col)) == dim).select(
            key_in.alias(key_out),
            quantize_vec(F.col(vec_col), scale).alias("_q"),
        )
        return base.select(
            key_out,
            F.posexplode(
                F.array(
                    *[F.slice("_q", j * sub + 1, sub) for j in range(m)]
                )
            ).alias("grp", "q"),
        )

    codes, books = kmeans_fixed_point_grouped(
        sliced(corpus, id_col, F.col(id_col)),
        ksub,
        iters,
        group_col="grp",
        id_col=id_col,
        qvec_col="q",
    )
    lut = (
        sliced(queries, query_id_col, F.col(query_id_col))
        .join(F.broadcast(books), "grp")
        .select(
            query_id_col,
            "grp",
            "cluster",
            _sq_dist(F.col("q"), F.col("cq")).alias("_d"),
        )
    )
    adc = (
        codes.select(id_col, "grp", "cluster")
        .join(F.broadcast(lut), ["grp", "cluster"])
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_d").alias("_adc"))
    )
    short = top_k_per_group(
        adc, [query_id_col], [F.asc("_adc"), F.asc(id_col)], shortlist
    ).select(query_id_col, id_col)
    c = corpus.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_cvec")
    ).withColumn("_cnorm", norm(F.col("_cvec")))
    q = queries.select(
        F.col(query_id_col), as_double_array(F.col(vec_col)).alias("_qvec")
    ).withColumn("_qnorm", norm(F.col("_qvec")))
    # short is bounded by construction (<= |queries|*shortlist rows);
    # hint it so the corpus side of the rerank fetch never shuffles -
    # the trained-codebook frames behind it are checkpointed RDDs
    # without size statistics (optimization r17), which would otherwise
    # flip this to an estimate-driven corpus shuffle on id.
    scored = (
        F.broadcast(short).join(c, id_col)
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine_prenormed(
                    F.col("_qvec"),
                    F.col("_cvec"),
                    F.col("_qnorm"),
                    F.col("_cnorm"),
                ),
                round_to,
            ).alias("cos"),
        )
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


def save_fixed_point_model(
    spark,
    cent_assign: list[tuple[int, list[int]]],
    cent_probe: list[tuple[int, list[int]]],
    root: str,
    scale: int,
    meta: dict | None = None,
) -> int:
    """Persist a PRE-TRAINED exact IVF serve model — BOTH frames of the
    one-step lag (``role='assign'`` = c_{iters-1}, the centroids the
    trained cell tags argmin against; ``role='probe'`` = c_iters, the
    post-final-update frame queries rank) — as one versioned-table
    snapshot, manifest-stamped with the quantization ``scale`` so a
    later reader REFUSES to argmin vectors quantized at a different
    scale (the signature-index fail-loud stamping: a scale mismatch
    would silently re-tag every vector into garbage cells).  The
    operational conclusion of the offline-train / online-serve split:
    train once, commit, serve and append (O(delta) assignment of new
    batches via :func:`ivf_pretrained_top_k` /
    :func:`semantic_dedup_pretrained_cells`) until a drift audit
    (:func:`clustering.cell_migration_matrix`) justifies a rebuild."""
    from hfp_loader_spark.versioned import commit_snapshot

    rows = [
        ("assign", int(cl), [int(v) for v in cq])
        for cl, cq in sorted(cent_assign)
    ] + [
        ("probe", int(cl), [int(v) for v in cq])
        for cl, cq in sorted(cent_probe)
    ]
    df = spark.createDataFrame(rows, "role string, cluster int, cq array<long>")
    return commit_snapshot(
        spark,
        df,
        root,
        mode="overwrite",
        meta={
            "kind": "ivf_fixed_point_model",
            "scale": int(scale),
            "nlist": len(cent_assign),
            **(meta or {}),
        },
    )


def load_fixed_point_model(
    spark, root: str, expect_scale: int, version: int | None = None
) -> tuple[list[tuple[int, list[int]]], list[tuple[int, list[int]]]]:
    """Load a model stored by :func:`save_fixed_point_model` (latest by
    default; ``version`` time-travels to an older index build).  Raises
    on a quantization-scale mismatch or an incomplete frame — a serve
    path must fail loudly, never tag cells against the wrong geometry."""
    from hfp_loader_spark.versioned import (
        _read_manifest,
        latest_version,
        read_snapshot,
    )

    v = latest_version(spark, root) if version is None else version
    if v is None:
        raise ValueError(f"no fixed-point model committed at {root}")
    info = _read_manifest(spark, root, v)
    if info.meta.get("kind") != "ivf_fixed_point_model":
        raise ValueError(
            f"table at {root} v{v} holds kind={info.meta.get('kind')!r}, "
            "not an ivf_fixed_point_model — refusing to serve from a "
            "foreign table (ADVICE r11 #3)"
        )
    stored = info.meta.get("scale")
    if stored != int(expect_scale):
        raise ValueError(
            f"fixed-point model at {root} v{v} was quantized at "
            f"scale={stored}, caller expects {expect_scale} — re-train "
            "or re-quantize; mixing scales silently corrupts every cell"
        )
    nlist = info.meta.get("nlist")
    if not isinstance(nlist, int) or nlist <= 0:
        raise ValueError(
            f"fixed-point model manifest at {root} v{v} carries invalid "
            f"nlist={nlist!r} — hand-edited or foreign manifest; re-save "
            "the model (ADVICE r11 #3)"
        )
    out: dict[str, list[tuple[int, list[int]]]] = {"assign": [], "probe": []}
    for r in read_snapshot(spark, root, v).collect():
        out[r["role"]].append((r["cluster"], list(r["cq"])))
    for role, cents in out.items():
        cents.sort()
        if [c for c, _ in cents] != list(range(nlist)):
            raise ValueError(
                f"stored model {role} frame incomplete at {root} v{v}: "
                f"want clusters 0..{nlist - 1}, got {[c for c, _ in cents][:6]}"
            )
    return out["assign"], out["probe"]


def _model_fingerprint(cents: list[tuple[int, list[int]]]) -> str:
    """Deterministic identity of a centroid frame (md5 over the sorted
    integer matrix) — stamped into tag-table manifests so an append
    against a DIFFERENT model generation fails loudly instead of mixing
    tag geometries."""
    import hashlib

    payload = ";".join(
        f"{cl}:{','.join(str(int(v)) for v in cq)}" for cl, cq in sorted(cents)
    )
    return hashlib.md5(payload.encode()).hexdigest()


def append_cell_tags(
    spark,
    delta: DataFrame,
    root: str,
    cent_assign: list[tuple[int, list[int]]],
    scale: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_meta: dict | None = None,
) -> int:
    """O(delta) append to a persisted cell-tag table: assign ONLY the
    new batch's vectors against the pinned model (the same narrow
    literal-argmin pass the serve paths use) and commit the
    ``(id, cell)`` rows as one versioned append — the ingest-time half
    of the persisted IVF index (the model itself lives in
    :func:`save_fixed_point_model`).

    Every commit is manifest-stamped with the quantization ``scale``
    AND the model fingerprint (:func:`_model_fingerprint`); an append
    whose model differs from the table's existing stamp RAISES — cell
    ids are only comparable within one model generation, and silently
    mixing generations is exactly the corruption
    :func:`clustering.cell_migration_matrix` exists to audit before a
    deliberate re-tag.  Valid because assignment is per-row
    deterministic: delta-appends equal the full recompute row-for-row
    (the same mergeable-aggregate argument as the bitmap index's
    bit_or).  Returns the committed version."""
    from hfp_loader_spark.versioned import (
        _read_manifest,
        commit_snapshot,
        latest_version,
    )

    fp = _model_fingerprint(cent_assign)
    head = latest_version(spark, root)
    if head is not None:
        info = _read_manifest(spark, root, head)
        stamped = info.meta.get("model_fingerprint")
        if stamped != fp or info.meta.get("scale") != int(scale):
            raise ValueError(
                f"cell-tag table at {root} was built against model "
                f"{stamped} (scale {info.meta.get('scale')}); this append "
                f"uses model {fp} (scale {scale}) — re-tag the corpus "
                "(see cell_migration_matrix) instead of mixing generations"
            )
    pin = {
        "kind": "ivf_cell_tags",
        "scale": int(scale),
        "model_fingerprint": fp,
    }
    collide = set(extra_meta or {}) & set(pin)
    if collide:
        raise ValueError(
            f"extra_meta may not shadow the generation pin keys {collide}"
        )
    tags = _assign_cells(delta, cent_assign, scale, id_col, vec_col)
    return commit_snapshot(
        spark,
        tags,
        root,
        mode="append",
        # audit riders (e.g. the streaming batch id) never join — and
        # can never SHADOW — the generation pin: pin keys spread last
        meta={**(extra_meta or {}), **pin},
    )


def load_cell_tags(spark, root: str, version: int | None = None) -> DataFrame:
    """All committed ``(id, cell)`` tags as of ``version`` (latest by
    default) — the union of every O(delta) append, equal row-for-row to
    a full re-assignment under the pinned model."""
    from hfp_loader_spark.versioned import read_snapshot

    return read_snapshot(spark, root, version)


def rebuild_cell_tags(
    spark,
    corpus: DataFrame,
    root: str,
    cent_assign: list[tuple[int, list[int]]],
    scale: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """The DELIBERATE re-tag: assign the FULL corpus under a (new) model
    generation and ``overwrite``-commit the tag table, re-stamping the
    manifest with the new fingerprint — the operation a smeared
    :func:`clustering.cell_migration_matrix` audit concludes with, and
    the only sanctioned way to change a tag table's model generation
    (:func:`append_cell_tags` refuses mixed generations by design).
    Old versions stay time-travelable until vacuumed."""
    from hfp_loader_spark.versioned import commit_snapshot

    tags = _assign_cells(corpus, cent_assign, scale, id_col, vec_col)
    return commit_snapshot(
        spark,
        tags,
        root,
        mode="overwrite",
        meta={
            "kind": "ivf_cell_tags",
            "scale": int(scale),
            "model_fingerprint": _model_fingerprint(cent_assign),
        },
    )


def _assign_cells(
    corpus: DataFrame,
    cent_assign: list[tuple[int, list[int]]],
    scale: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The ONE definition of cell assignment: ``(id, cell)`` via the
    narrow literal-argmin pass, NULL/empty vectors excluded.  Shared by
    the O(delta) append, the deliberate rebuild, and the streaming
    ingest so the tag semantics can never fork."""
    from hfp_loader_spark.operators.clustering import quantize_vec

    return (
        corpus.where(F.size(F.col(vec_col)) > 0)
        .select(
            F.col(id_col),
            quantize_vec(F.col(vec_col), scale).alias("_cq"),
        )
        .select(
            id_col,
            _int_argmin_cluster(F.col("_cq"), cent_assign).alias("cell"),
        )
    )


def _ivf_probe_frame(
    queries: DataFrame,
    cent_probe: list[tuple[int, list[int]]],
    nprobe: int,
    query_id_col: str,
    vec_col: str,
    scale: int,
) -> DataFrame:
    """Per-query probe set ``(query_id, _qvec, cluster)`` — nprobe rows
    per query.  Probe ranking needs the FULL (score, cluster) order, not
    just the argmin: an in-row sorted slice over the bounded query set
    (the same Σc²−2qc exact rearrangement; ties by cluster id, matching
    the inline-training twin's (d, cluster) sort).  Shared by the
    literal-serve path (:func:`ivf_pretrained_top_k`) and the
    persisted-index serve path (:func:`ivf_served_top_k`)."""
    from hfp_loader_spark.operators.clustering import quantize_vec

    qq = queries.where(F.size(F.col(vec_col)) > 0).select(
        F.col(query_id_col),
        as_double_array(F.col(vec_col)).alias("_qvec"),
        quantize_vec(F.col(vec_col), scale).alias("_qq"),
    )
    probe_c2 = _int_c2_lit(cent_probe)
    probe_scores = F.transform(
        _int_cents_lit(cent_probe),
        lambda cw, i: F.struct(
            (
                F.element_at(probe_c2, i + 1)
                - F.lit(2).cast("long") * _int_dot(F.col("_qq"), cw)
            ).alias("t"),
            i.cast("int").alias("cluster"),
        ),
    )
    return qq.select(
        query_id_col,
        "_qvec",
        F.explode(
            F.slice(F.array_sort(probe_scores), 1, nprobe)
        ).alias("_p"),
    ).select(query_id_col, "_qvec", F.col("_p.cluster").alias("cluster"))


def _index_manifest_path(root: str) -> str:
    return f"{root.rstrip('/')}/_INDEX.json"


def _write_index_manifest(spark, root: str, doc: dict) -> None:
    from hfp_loader_spark.versioned import _fs

    fs, P = _fs(spark, root)
    target = P(_index_manifest_path(root))
    fs.mkdirs(target.getParent())
    out = fs.create(target, True)
    try:
        out.write(bytearray(json.dumps(doc).encode("utf-8")))
    finally:
        out.close()


def read_index_manifest(spark, root: str) -> dict | None:
    """The serve-layout manifest stamped by
    :func:`materialize_cell_index` (None if absent) — kind, quantization
    scale, model fingerprint, and the tag-table version the layout was
    compacted from."""
    from hfp_loader_spark.versioned import _fs

    fs, P = _fs(spark, root)
    target = P(_index_manifest_path(root))
    if not fs.exists(target):
        return None
    stream = fs.open(target)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(text)


def materialize_cell_index(
    spark,
    tag_root: str,
    vectors: DataFrame,
    index_root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Compact the committed cell-tag log into the SERVE layout: the
    latest :func:`load_cell_tags` snapshot joined to its vectors,
    written as one parquet table **partitioned by cell** — the inverted
    lists of a production IVF index, where each cell's vectors are
    physically co-located so a probe's ``cell IN (…)`` filter prunes to
    ≤ nprobe/nlist of the FILES (VERDICT r11 #1: until this layout
    exists, serving re-assigns the whole corpus per query batch).

    The layout is stamped (``_INDEX.json``) with the tag table's model
    fingerprint + quantization scale + the tag version it compacted, so
    a reader can tell staleness (tag log advanced past the layout) from
    corruption (fingerprint mismatch) — :func:`read_cell_index` enforces
    the latter, callers decide when to re-materialize for the former.
    Lifecycle: stream/batch appends land in the O(delta) versioned tag
    log (:func:`append_cell_tags`); this materialization runs on the
    maintenance cadence, like compaction.  Concurrent materializers must
    be fenced by the caller (same contract as ``maintenance.py``); the
    data is written to a temp dir and renamed in last, so readers never
    see a half-written layout.

    Scale shape: one id-equi join (tags ⋈ vectors — co-partitionable by
    id at 100 TB) + ``repartition(cell)`` so each cell lands in O(1)
    files; no driver-side data movement.  Returns the manifest dict."""
    from hfp_loader_spark.versioned import _read_manifest, latest_version

    head = latest_version(spark, tag_root)
    if head is None:
        raise ValueError(f"no cell tags committed at {tag_root}")
    info = _read_manifest(spark, tag_root, head)
    tags = load_cell_tags(spark, tag_root, head)
    rows = tags.join(vectors.select(F.col(id_col), F.col(vec_col)), id_col)
    doc = {
        "kind": "ivf_cell_index",
        "scale": info.meta.get("scale"),
        "model_fingerprint": info.meta.get("model_fingerprint"),
        "tag_root": tag_root,
        "tag_version": head,
        "id_col": id_col,
        "vec_col": vec_col,
    }
    return _publish_partitioned_index(spark, rows, index_root, doc)


def _publish_partitioned_index(
    spark, rows: DataFrame, index_root: str, doc: dict
) -> dict:
    """Write ``rows`` as the cell-partitioned serve layout at
    ``index_root`` (temp dir + rename publish, so readers never see a
    half-written layout) and stamp ``doc`` as its manifest.  A racing
    materializer that published the SAME generation first wins
    idempotently; any other resident layout is a real publish failure."""
    from hfp_loader_spark.versioned import _fs

    root = index_root.rstrip("/")
    fs, P = _fs(spark, root)
    tmp = f"{root}__building-{uuid.uuid4().hex[:8]}"
    (
        rows.repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{tmp}/data")
    )
    _write_index_manifest(spark, tmp, doc)
    fs.delete(P(root), True)
    if not fs.rename(P(tmp), P(root)):
        existing = read_index_manifest(spark, root)
        fs.delete(P(tmp), True)
        if existing == doc:
            return existing
        raise IOError(
            f"index publish failed: cannot move {tmp} into {root} "
            f"and the resident layout is {existing} — fence builders"
        )
    return doc


def read_cell_index(
    spark, root: str, expect_fingerprint: str, expect_scale: int
) -> DataFrame:
    """Open a serve layout written by :func:`materialize_cell_index` as
    ``(id, vector, cell)`` with ``cell`` as the PARTITION column — a
    ``where(cell.isin(…))`` on the result prunes whole partition
    directories at planning time.  Fail-loud identity check: a layout
    built under a different model generation or quantization scale
    raises (cell ids are only comparable within one model generation —
    the same pinning rule as :func:`append_cell_tags`)."""
    doc = read_index_manifest(spark, root)
    if doc is None:
        raise ValueError(f"no cell index materialized at {root}")
    if doc.get("kind") != "ivf_cell_index":
        raise ValueError(
            f"{root} holds kind={doc.get('kind')!r}, not an ivf_cell_index"
        )
    if (
        doc.get("model_fingerprint") != expect_fingerprint
        or doc.get("scale") != int(expect_scale)
    ):
        raise ValueError(
            f"cell index at {root} was built under model "
            f"{doc.get('model_fingerprint')} (scale {doc.get('scale')}); "
            f"caller serves model {expect_fingerprint} (scale "
            f"{expect_scale}) — re-materialize instead of mixing "
            "generations"
        )
    return spark.read.parquet(f"{root.rstrip('/')}/data")


def ivf_served_top_k(
    spark,
    queries: DataFrame,
    index_root: str,
    cent_probe: list[tuple[int, list[int]]],
    k: int,
    nprobe: int,
    expect_fingerprint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_to: int = 4,
    scale: int = 1_000_000,
) -> DataFrame:
    """IVF top-k served FROM THE PERSISTED INDEX — the plan VERDICT r11
    #1 demands: the corpus is never scanned, let alone re-assigned; the
    only data read is the ≤ nprobe·|queries| probed cells of the
    cell-partitioned serve layout (:func:`materialize_cell_index`),
    pruned STATICALLY via ``cell IN (probed)`` so the parquet scan's
    PartitionFilters skip every unprobed cell's files at planning time.

    Two-step, like every production vector store: (1) route — rank the
    nlist literal probe centroids per query in-row and collect the
    probed cell set (≤ nprobe·|queries| ints, driver-bounded by
    construction); (2) serve — scan only those partitions, broadcast
    the probe frame onto them for per-query candidate association,
    exact cosine rerank, top-k.  All serve math is the inline-training
    twin's (:func:`ivf_exact_cells_top_k`), so the output stays
    value-identical to it and to its SQL oracle: candidates carry the
    stored assignment (tags argmin'd against c_{iters-1}), probes rank
    c_iters = ``cent_probe``, cosine is rounded to ``round_to``.

    Fail-loud: ``expect_fingerprint`` must match the layout's stamped
    model generation (:func:`read_cell_index` raises otherwise)."""
    from hfp_loader_spark.operators.relational import top_k_per_group

    probes = _ivf_probe_frame(
        queries, cent_probe, nprobe, query_id_col, vec_col, scale
    )
    # route: the probed cell set is bounded by nprobe·|queries| — the
    # driver-side collect every ANN router does before touching storage
    probe_cells = sorted(
        r["cluster"] for r in probes.select("cluster").distinct().collect()
    )
    cells = read_cell_index(spark, index_root, expect_fingerprint, scale)
    cand = F.broadcast(probes).join(
        cells.where(F.col("cell").isin(probe_cells)).select(
            F.col(id_col),
            as_double_array(F.col(vec_col)).alias("_cvec"),
            F.col("cell").alias("cluster"),
        ),
        "cluster",
    )
    scored = cand.select(
        query_id_col,
        id_col,
        F.round(
            cosine_prenormed(
                F.col("_qvec"),
                F.col("_cvec"),
                norm(F.col("_qvec")),
                norm(F.col("_cvec")),
            ),
            round_to,
        ).alias("cos"),
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


def _int_cents_lit(cents: list[tuple[int, list[int]]]) -> Column:
    """Quantized centroids as ONE ``array<array<bigint>>`` Literal node,
    ordered by cluster id (= array position − 1) — the plan-size /
    eval-cost rationale of :func:`_pq_books_lit`: ``F.lit`` of nested
    lists folds to a single Literal; per-cluster ``F.array(F.lit …)``
    trees cost a tree walk per evaluation and megabytes of task
    binary.

    Cluster ids MUST be contiguous 0..n−1 (array position − 1 IS the
    cluster id downstream) — asserted here so EVERY serve entry point
    (ivf_pretrained_top_k, append_cell_tags,
    semantic_dedup_pretrained_cells, …) fails loudly on a gapped model
    instead of silently mis-tagging every cell (ADVICE r11 #1;
    previously only load_fixed_point_model validated this)."""
    ordered = sorted(cents)
    if [c for c, _ in ordered] != list(range(len(ordered))):
        raise ValueError(
            "centroid frame must carry contiguous cluster ids 0.."
            f"{len(ordered) - 1}; got {[c for c, _ in ordered][:8]} — a "
            "gap would silently shift every downstream cell id"
        )
    return _parsed_array_lit(
        [[int(v) for v in cq] for _, cq in ordered], lambda v: f"{v}L"
    )


def _int_c2_lit(cents: list[tuple[int, list[int]]]) -> Column:
    """Per-cluster ``Σc²`` as one bigint-array Literal, plan-time
    precomputed (the `_pq_c2_lit` trick in exact integers)."""
    ordered = [cq for _, cq in sorted(cents)]
    return _parsed_array_lit(
        [int(sum(v * v for v in cq)) for cq in ordered], lambda v: f"{v}L"
    )


def _int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two array<bigint> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _int_argmin_cluster(
    q: Column, cents: list[tuple[int, list[int]]]
) -> Column:
    """Nearest cluster id (lowest-id tie-break) of a quantized vector
    against literal centroids — EXACT squared-L2 ordering via the
    rearrangement  argmin_c ‖q−c‖² = argmin_c (Σc² − 2·q·c)  (Σq² is
    constant per row, so ordering AND ties are identical in int64);
    ``array_position(array_min)`` returns the FIRST minimum = lowest
    cluster, matching the trainer's min-struct rule.  One transform
    over a single Literal node per row — the expression shape that
    keeps the corpus-side assignment pass cheap (the struct-per-cluster
    variant measured ~5× slower at sf0.1)."""
    c2 = _int_c2_lit(cents)
    t = F.transform(
        _int_cents_lit(cents),
        lambda cw, i: F.element_at(c2, i + 1)
        - F.lit(2).cast("long") * _int_dot(q, cw),
    )
    return (F.array_position(t, F.array_min(t)) - 1).cast("int")


def semantic_dedup_pretrained_cells(
    corpus: DataFrame,
    threshold: float,
    cent_assign: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    round_to: int = 4,
) -> DataFrame:
    """SemDeDup keep-list over PRE-TRAINED exact cells with the BLAS
    per-cell prune — the offline-train / online-serve split of
    :func:`semantic_dedup_exact_cells`, mirroring
    :func:`ivf_pretrained_top_k`: ``cent_assign`` must be the
    pre-final-update centroids (c_{iters-1}), because the trained
    index's cell column IS the final assignment a_iters = argmin
    against c_{iters-1} — recomputed here as ONE narrow no-join
    expression pass over the centroid literals, bit-identical to the
    inline-training twin's cells.  The prune is the shared per-cell
    Arrow/BLAS matmul (:func:`_blas_keep_list`), whose
    ``round(cos, round_to)`` decisions match the expression twin's
    (locked by tests).

    Scale shape: one narrow assignment pass + one groupBy(cell)
    applyInPandas — no training rounds, no self-join, Σ|cell|² pair
    work inside the blocked matmul."""
    from hfp_loader_spark.operators.clustering import quantize_vec

    corp = (
        corpus.where(F.size(F.col(vec_col)) > 0)
        .select(
            F.col(id_col),
            as_double_array(F.col(vec_col)).alias("_v"),
            quantize_vec(F.col(vec_col), scale).alias("_cq"),
        )
        .select(
            id_col,
            "_v",
            _int_argmin_cluster(F.col("_cq"), cent_assign).alias("cell"),
        )
    )
    return _blas_keep_list(corp, id_col, "cell", threshold, round_to)


def pq_pretrained_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    books_assign: list[tuple[int, int, list[int]]],
    books_probe: list[tuple[int, int, list[int]]],
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 100,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale: int = 1_000_000,
    round_to: int = 4,
) -> DataFrame:
    """Serve-stage PQ top-k over PRE-TRAINED exact codebooks — the
    offline-train / online-serve split of :func:`pq_exact_codes_top_k`,
    mirroring :func:`ivf_pretrained_top_k`: the grouped fixed-point
    k-means codebooks are trained once (``kmeans_fixed_point_grouped``
    over the sliced corpus), collected as ``(grp, cluster,
    quantized-subcentroid)`` triples (m·ksub bounded rows), and shipped
    as plan literals, so the measured plan contains only the serve
    path.

    ``books_assign`` must be the pre-final-update codebooks
    (c_{iters-1}) — corpus CODES are the trained assignment, which lags
    the served codebooks by one Lloyd step — and ``books_probe`` the
    post-final-update codebooks (c_iters) the per-query ADC LUT is
    built from.  All serve math is the twin's: integer sub-distances,
    integer ADC sums, (adc, id) shortlist ties, exact rounded-cosine
    rerank — so the output is value-identical to the inline-training
    twin and to its SQL oracle.

    Scale shape: encoding is ONE narrow no-join expression pass
    (m argmins over ksub literal sub-centroids per vector, in the
    ``Σc²−2qc`` / single-Literal / array_position(array_min) shape —
    no broadcast join, no shuffle); the per-query integer LUT rides the
    bounded query broadcast as one nested-array column; ADC is m IN-ROW
    array lookups per (candidate, query) — the memory-bandwidth PQ scan
    — then one ``shortlist``-bounded rerank.  The exploded
    (grp, cluster)-join ADC variant measured ~2× this whole query's
    cost at sf0.1; the in-row form is the one that survives 10⁹
    vectors."""
    from hfp_loader_spark.operators.clustering import _sq_dist, quantize_vec
    from hfp_loader_spark.operators.relational import top_k_per_group

    assert dim % m == 0, "dim must divide into m subspaces"
    sub = dim // m

    codes = _pq_encode(
        corpus, books_assign, m, dim, id_col, vec_col, scale
    )
    # per-query integer LUT as ONE array<array<bigint>> column —
    # lut[j][c] = exact ‖q_sub_j − book_j[c]‖², the twin's LUT values
    # bit-for-bit; rides the bounded query broadcast.  ADC is then m
    # in-row array LOOKUPS per (candidate, query) — the float path's
    # memory-bandwidth shape — instead of an exploded (grp, cluster)
    # join + 2M-row re-aggregate (measured ~2× the whole query's cost
    # at sf0.1)
    ordered_books = [cq for _, _, cq in sorted(books_probe)]
    books_lit = _parsed_array_lit(
        [[int(v) for v in cq] for cq in ordered_books], lambda v: f"{v}L"
    )  # flat m·ksub rows, row (g·ksub + c) = book_g[c]
    lut_col = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda g: F.transform(
            F.slice(books_lit, g * ksub + 1, ksub),
            lambda cw: _sq_dist(
                F.slice(F.col("_q"), g * sub + F.lit(1), sub), cw
            ),
        ),
    )
    qlut = queries.where(F.size(F.col(vec_col)) == dim).select(
        F.col(query_id_col),
        quantize_vec(F.col(vec_col), scale).alias("_q"),
    ).select(query_id_col, lut_col.alias("_lut"))
    adc = (
        codes.crossJoin(F.broadcast(qlut))
        .select(
            query_id_col,
            id_col,
            F.aggregate(
                F.zip_with(
                    F.col("_codes"),
                    F.col("_lut"),
                    lambda c, row: F.element_at(row, c + 1),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("_adc"),
        )
    )
    short = top_k_per_group(
        adc, [query_id_col], [F.asc("_adc"), F.asc(id_col)], shortlist
    ).select(query_id_col, id_col)
    c = corpus.select(
        F.col(id_col), as_double_array(F.col(vec_col)).alias("_cvec")
    ).withColumn("_cnorm", norm(F.col("_cvec")))
    q = queries.select(
        F.col(query_id_col), as_double_array(F.col(vec_col)).alias("_qvec")
    ).withColumn("_qnorm", norm(F.col("_qvec")))
    scored = (
        short.join(c, id_col)
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine_prenormed(
                    F.col("_qvec"),
                    F.col("_cvec"),
                    F.col("_qnorm"),
                    F.col("_cnorm"),
                ),
                round_to,
            ).alias("cos"),
        )
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


def _by_grp(
    books: list[tuple[int, int, list[int]]],
) -> dict[int, list[tuple[int, list[int]]]]:
    out: dict[int, list[tuple[int, list[int]]]] = {}
    for g, cl, cq in books:
        out.setdefault(int(g), []).append((int(cl), cq))
    return out


def _pq_encode(
    corpus: DataFrame,
    books_assign: list[tuple[int, int, list[int]]],
    m: int,
    dim: int,
    id_col: str,
    vec_col: str,
    scale: int,
) -> DataFrame:
    """Encode vectors to their m PQ codes against literal codebooks —
    one narrow no-join expression pass (m argmins over ksub literal
    sub-centroids each, in the Σc²−2qc / array_position(array_min)
    shape).  ``(id, _codes array<int>)``; vectors whose length ≠ dim
    (and NULL/empty) are excluded on every engine.  Shared by the
    literal-serve path, the O(delta) code append, and any re-encode
    audit — ONE definition of the code semantics."""
    from hfp_loader_spark.operators.clustering import quantize_vec

    sub = dim // m
    grp_assign = _by_grp(books_assign)
    return corpus.where(F.size(F.col(vec_col)) == dim).select(
        F.col(id_col),
        quantize_vec(F.col(vec_col), scale).alias("_q"),
    ).select(
        id_col,
        F.array(
            *[
                _int_argmin_cluster(
                    F.slice(F.col("_q"), g * sub + 1, sub), grp_assign[g]
                )
                for g in range(m)
            ]
        ).alias("_codes"),
    )


def _books_fingerprint(books: list[tuple[int, int, list[int]]]) -> str:
    """Deterministic identity of a PQ codebook set (md5 over the sorted
    (grp, cluster, sub-centroid) triples) — the grouped sibling of
    :func:`_model_fingerprint`, stamped into code-table manifests."""
    import hashlib

    payload = ";".join(
        f"{g}/{cl}:{','.join(str(int(v)) for v in cq)}"
        for g, cl, cq in sorted(books)
    )
    return hashlib.md5(payload.encode()).hexdigest()


def append_codes(
    spark,
    delta: DataFrame,
    root: str,
    books_assign: list[tuple[int, int, list[int]]],
    scale: int,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """O(delta) append to a persisted PQ CODE table — the code-side
    analog of :func:`append_cell_tags` (VERDICT r11 #2): encode ONLY the
    new batch against the pinned codebooks (the same narrow literal
    argmin pass the serve path used to run over the whole corpus) and
    commit the ``(id, _codes)`` rows as one versioned append.  The
    8-byte-per-vector code table is the entire point of PQ at 10⁹
    vectors; it must be written once per vector, never recomputed per
    query plan.

    Manifest-stamped with the quantization scale AND the codebook
    fingerprint (:func:`_books_fingerprint`); an append under different
    codebooks RAISES — codes are only comparable within one codebook
    generation.  Delta-appends equal the full recompute row-for-row
    because encoding is per-row deterministic.  Returns the committed
    version."""
    from hfp_loader_spark.versioned import (
        _read_manifest,
        commit_snapshot,
        latest_version,
    )

    fp = _books_fingerprint(books_assign)
    head = latest_version(spark, root)
    if head is not None:
        info = _read_manifest(spark, root, head)
        stamped = info.meta.get("model_fingerprint")
        if stamped != fp or info.meta.get("scale") != int(scale):
            raise ValueError(
                f"code table at {root} was built against codebooks "
                f"{stamped} (scale {info.meta.get('scale')}); this append "
                f"uses codebooks {fp} (scale {scale}) — re-encode the "
                "corpus instead of mixing generations"
            )
    codes = _pq_encode(delta, books_assign, m, dim, id_col, vec_col, scale)
    return commit_snapshot(
        spark,
        codes,
        root,
        mode="append",
        meta={
            "kind": "pq_codes",
            "scale": int(scale),
            "model_fingerprint": fp,
            "m": int(m),
            "dim": int(dim),
        },
    )


def rebuild_codes(
    spark,
    corpus: DataFrame,
    root: str,
    books_assign: list[tuple[int, int, list[int]]],
    scale: int,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """The deliberate full re-encode under a (new) codebook generation —
    ``overwrite``-commits the code table with the new fingerprint stamp
    (the PQ sibling of :func:`rebuild_cell_tags`; :func:`append_codes`
    refuses mixed generations by design)."""
    from hfp_loader_spark.versioned import commit_snapshot

    codes = _pq_encode(corpus, books_assign, m, dim, id_col, vec_col, scale)
    return commit_snapshot(
        spark,
        codes,
        root,
        mode="overwrite",
        meta={
            "kind": "pq_codes",
            "scale": int(scale),
            "model_fingerprint": _books_fingerprint(books_assign),
            "m": int(m),
            "dim": int(dim),
        },
    )


def load_codes(
    spark,
    root: str,
    expect_fingerprint: str | None = None,
    expect_scale: int | None = None,
    version: int | None = None,
) -> DataFrame:
    """All committed ``(id, _codes)`` rows as of ``version`` (latest by
    default) — the union of every O(delta) append, equal row-for-row to
    a full re-encode under the pinned codebooks.  Pass
    ``expect_fingerprint``/``expect_scale`` from the serve path so a
    table whose stamped codebook generation differs raises instead of
    ADC-ing garbage."""
    from hfp_loader_spark.versioned import (
        _read_manifest,
        latest_version,
        read_snapshot,
    )

    v = latest_version(spark, root) if version is None else version
    if v is None:
        raise ValueError(f"no PQ codes committed at {root}")
    info = _read_manifest(spark, root, v)
    if expect_fingerprint is not None or expect_scale is not None:
        stamped_fp = info.meta.get("model_fingerprint")
        stamped_scale = info.meta.get("scale")
        if (
            expect_fingerprint is not None and stamped_fp != expect_fingerprint
        ) or (expect_scale is not None and stamped_scale != int(expect_scale)):
            raise ValueError(
                f"code table at {root} v{v} stamped codebooks "
                f"{stamped_fp} (scale {stamped_scale}); caller serves "
                f"{expect_fingerprint} (scale {expect_scale}) — "
                "re-encode instead of mixing generations"
            )
    return read_snapshot(spark, root, v)


def pq_served_top_k(
    spark,
    corpus: DataFrame,
    queries: DataFrame,
    codes: DataFrame,
    books_probe: list[tuple[int, int, list[int]]],
    k: int,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 100,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale: int = 1_000_000,
    round_to: int = 4,
) -> DataFrame:
    """PQ top-k served FROM THE PERSISTED CODE TABLE — the plan VERDICT
    r11 #1 demands for the PQ side: the measured plan never re-encodes
    the corpus; the ADC scan reads ``codes`` (m small ints per vector —
    the compressed linear scan that IS product quantization's design
    point at 10⁹ vectors), and the full-width vectors are touched only
    for the ``shortlist``-bounded rerank, fetched by id with the id set
    PUSHED INTO the scan (``In(id, …)`` row-group pruning) — the
    route-then-fetch split every production vector store serves with.

    Two-step: (1) ADC — per-query integer LUT over the ``books_probe``
    literals rides the bounded query broadcast; m in-row lookups per
    (code row, query); deterministic (adc, id) shortlist, collected
    (≤ shortlist·|queries| rows, driver-bounded by construction);
    (2) rerank — the shortlist ids filter the corpus scan, exact
    rounded-cosine against the broadcast queries, top-k.  All math is
    the inline-training twin's (:func:`pq_exact_codes_top_k`), so the
    output stays value-identical to it and to its SQL oracle.

    Pair with :func:`append_codes`/:func:`load_codes` (fingerprint-
    pinned) so ``codes`` is guaranteed to be the pinned generation."""
    from hfp_loader_spark.operators.clustering import _sq_dist, quantize_vec
    from hfp_loader_spark.operators.relational import top_k_per_group

    assert dim % m == 0, "dim must divide into m subspaces"
    sub = dim // m
    ordered_books = [cq for _, _, cq in sorted(books_probe)]
    books_lit = _parsed_array_lit(
        [[int(v) for v in cq] for cq in ordered_books], lambda v: f"{v}L"
    )  # flat m·ksub rows, row (g·ksub + c) = book_g[c]
    lut_col = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda g: F.transform(
            F.slice(books_lit, g * ksub + 1, ksub),
            lambda cw: _sq_dist(
                F.slice(F.col("_q"), g * sub + F.lit(1), sub), cw
            ),
        ),
    )
    qlut = queries.where(F.size(F.col(vec_col)) == dim).select(
        F.col(query_id_col),
        quantize_vec(F.col(vec_col), scale).alias("_q"),
    ).select(query_id_col, lut_col.alias("_lut"))
    adc = codes.crossJoin(F.broadcast(qlut)).select(
        query_id_col,
        id_col,
        F.aggregate(
            F.zip_with(
                F.col("_codes"),
                F.col("_lut"),
                lambda c, row: F.element_at(row, c + 1),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("_adc"),
    )
    short_df = top_k_per_group(
        adc, [query_id_col], [F.asc("_adc"), F.asc(id_col)], shortlist
    ).select(query_id_col, id_col)
    # route/fetch boundary: the shortlist is bounded by
    # shortlist·|queries| — collect it so the rerank's vector fetch is
    # an In(id, …)-pushed point read, not a join against a full scan
    short_rows = short_df.collect()
    short = spark.createDataFrame(short_rows, short_df.schema)
    ids = sorted({r[id_col] for r in short_rows})
    c = (
        corpus.where(F.col(id_col).isin(ids))
        .select(F.col(id_col), as_double_array(F.col(vec_col)).alias("_cvec"))
        .withColumn("_cnorm", norm(F.col("_cvec")))
    )
    q = queries.select(
        F.col(query_id_col), as_double_array(F.col(vec_col)).alias("_qvec")
    ).withColumn("_qnorm", norm(F.col("_qvec")))
    scored = (
        F.broadcast(short)
        .join(c, id_col)
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine_prenormed(
                    F.col("_qvec"),
                    F.col("_cvec"),
                    F.col("_qnorm"),
                    F.col("_cnorm"),
                ),
                round_to,
            ).alias("cos"),
        )
    )
    return top_k_per_group(
        scored, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )


def materialize_ivfpq_index(
    spark,
    tag_root: str,
    code_root: str,
    vectors: DataFrame,
    index_root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Compact the committed cell-tag log AND the committed PQ code
    table into the IVF-PQ serve layout — ``(id, _codes, vector)``
    **partitioned by cell**: the inverted lists of a production IVF-PQ
    index (FAISS's IVFPQ layout, as parquet).  Each probed cell's CODES
    are physically co-located, so the ADC scan reads only
    nprobe/nlist of the files AND only the m-byte code column
    (columnar projection skips the vector column until the bounded
    rerank fetch) — the two multiplicative reductions that make
    10⁹-vector ANN serveable.

    The build is the only corpus-sized work: one id-equi join of two
    persisted structures (tags ⋈ codes ⋈ vectors, all co-partitionable
    by id at 100 TB).  The manifest pins BOTH generations — the cell
    model fingerprint from the tag log and the codebook fingerprint
    from the code table — plus the versions compacted, so staleness
    (either log advanced) is distinguishable from corruption (either
    fingerprint changed); :func:`read_ivfpq_index` enforces the
    latter.  Universe: the inner join keeps exactly the vectors that
    have BOTH a cell tag (len > 0) and codes (len == dim)."""
    from hfp_loader_spark.versioned import _read_manifest, latest_version

    t_head = latest_version(spark, tag_root)
    c_head = latest_version(spark, code_root)
    if t_head is None or c_head is None:
        raise ValueError(
            f"need committed tags ({tag_root}) and codes ({code_root})"
        )
    t_meta = _read_manifest(spark, tag_root, t_head).meta
    c_meta = _read_manifest(spark, code_root, c_head).meta
    if t_meta.get("scale") != c_meta.get("scale"):
        raise ValueError(
            f"tag log quantized at scale {t_meta.get('scale')} but code "
            f"table at {c_meta.get('scale')} — refusing to fuse "
            "structures from different quantizations"
        )
    rows = (
        load_cell_tags(spark, tag_root, t_head)
        .join(load_codes(spark, code_root, version=c_head), id_col)
        .join(vectors.select(F.col(id_col), F.col(vec_col)), id_col)
    )
    doc = {
        "kind": "ivfpq_cell_index",
        "scale": t_meta.get("scale"),
        "model_fingerprint": t_meta.get("model_fingerprint"),
        "books_fingerprint": c_meta.get("model_fingerprint"),
        "tag_root": tag_root,
        "tag_version": t_head,
        "code_root": code_root,
        "code_version": c_head,
        "id_col": id_col,
        "vec_col": vec_col,
    }
    return _publish_partitioned_index(spark, rows, index_root, doc)


def read_ivfpq_index(
    spark,
    root: str,
    expect_model_fp: str,
    expect_books_fp: str,
    expect_scale: int,
) -> DataFrame:
    """Open an IVF-PQ serve layout as ``(id, _codes, vector, cell)``
    with ``cell`` as the partition column; raises unless BOTH stamped
    generations match the served models (mixed-generation cells or
    codes are silent corruption — the same pinning rule as every other
    serve structure)."""
    doc = read_index_manifest(spark, root)
    if doc is None:
        raise ValueError(f"no ivfpq index materialized at {root}")
    if doc.get("kind") != "ivfpq_cell_index":
        raise ValueError(
            f"{root} holds kind={doc.get('kind')!r}, not an ivfpq_cell_index"
        )
    if (
        doc.get("model_fingerprint") != expect_model_fp
        or doc.get("books_fingerprint") != expect_books_fp
        or doc.get("scale") != int(expect_scale)
    ):
        raise ValueError(
            f"ivfpq index at {root} stamped (model "
            f"{doc.get('model_fingerprint')}, books "
            f"{doc.get('books_fingerprint')}, scale {doc.get('scale')}); "
            f"caller serves ({expect_model_fp}, {expect_books_fp}, "
            f"{expect_scale}) — re-materialize instead of mixing "
            "generations"
        )
    return spark.read.parquet(f"{root.rstrip('/')}/data")


def ivfpq_served_top_k(
    spark,
    queries: DataFrame,
    index_root: str,
    cent_probe: list[tuple[int, list[int]]],
    books_probe: list[tuple[int, int, list[int]]],
    k: int,
    nprobe: int,
    expect_model_fp: str,
    expect_books_fp: str,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 100,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    scale: int = 1_000_000,
    round_to: int = 4,
) -> DataFrame:
    """IVF-PQ top-k served from the fused persisted index — the
    composition that serves 10⁹ vectors: IVF's partition pruning
    (read only the probed cells' files) MULTIPLIED by PQ's compression
    (within those files, ADC reads only the m-byte code column), then
    the usual bounded route-then-fetch rerank.  vs the single-structure
    paths: :func:`ivf_served_top_k` prunes files but reranks FULL
    vectors for every candidate in the probed cells;
    :func:`pq_served_top_k` scans compressed codes but ALL of them.

    All math is exact fixed-point, so the whole pipeline — cells,
    probes, codes, per-query integer LUT, cell-restricted ADC,
    (adc, id) shortlist, rounded-cosine rerank — has a SQL twin: cells
    and codes replay as ONE grouped Lloyd recurrence (the full-vector
    clustering rides grp = −1 beside the m subspaces, exactly the
    trick ``emb_kmeans_by_label`` relies on), making the served
    neighbor list value-checkable end to end.

    Universe: vectors need a cell AND codes → len == dim exactly (the
    index join enforces it); queries likewise (probe ranking and LUT
    both need the full dim).  Two bounded driver collects, like every
    serve path: the probed cell set (≤ nprobe·|queries|) and the
    shortlist (≤ shortlist·|queries|).

    The ADC stage executes inside the shortlist collect, so its scan is
    not part of the RETURNED plan; for plan audits the ADC DataFrame is
    attached to the result as ``_ivfpq_adc_plan`` (the partition-pruning
    and code-column-only-ReadSchema assertions run against it —
    ``tests/test_plan_audit.py``)."""
    from hfp_loader_spark.operators.clustering import _sq_dist, quantize_vec
    from hfp_loader_spark.operators.relational import top_k_per_group

    assert dim % m == 0, "dim must divide into m subspaces"
    sub = dim // m

    qq = queries.where(F.size(F.col(vec_col)) == dim).select(
        F.col(query_id_col),
        quantize_vec(F.col(vec_col), scale).alias("_q"),
    )
    # probe ranking over the full-vector centroids (in-row sorted slice,
    # same as the IVF serve path but on the len==dim query universe)
    probe_c2 = _int_c2_lit(cent_probe)
    probe_scores = F.transform(
        _int_cents_lit(cent_probe),
        lambda cw, i: F.struct(
            (
                F.element_at(probe_c2, i + 1)
                - F.lit(2).cast("long") * _int_dot(F.col("_q"), cw)
            ).alias("t"),
            i.cast("int").alias("cluster"),
        ),
    )
    ordered_books = [cq for _, _, cq in sorted(books_probe)]
    books_lit = _parsed_array_lit(
        [[int(v) for v in cq] for cq in ordered_books], lambda v: f"{v}L"
    )
    lut_col = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda g: F.transform(
            F.slice(books_lit, g * ksub + 1, ksub),
            lambda cw: _sq_dist(
                F.slice(F.col("_q"), g * sub + F.lit(1), sub), cw
            ),
        ),
    )
    ql = qq.select(
        query_id_col,
        lut_col.alias("_lut"),
        F.explode(
            F.slice(F.array_sort(probe_scores), 1, nprobe)
        ).alias("_p"),
    ).select(query_id_col, "_lut", F.col("_p.cluster").alias("cluster"))
    probe_cells = sorted(
        r["cluster"] for r in ql.select("cluster").distinct().collect()
    )
    idx = read_ivfpq_index(
        spark, index_root, expect_model_fp, expect_books_fp, scale
    )
    adc = (
        F.broadcast(ql)
        .join(
            idx.where(F.col("cell").isin(probe_cells)).select(
                F.col(id_col), "_codes", F.col("cell").alias("cluster")
            ),
            "cluster",
        )
        .select(
            query_id_col,
            id_col,
            F.aggregate(
                F.zip_with(
                    F.col("_codes"),
                    F.col("_lut"),
                    lambda c, row: F.element_at(row, c + 1),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("_adc"),
        )
    )
    short_df = top_k_per_group(
        adc, [query_id_col], [F.asc("_adc"), F.asc(id_col)], shortlist
    ).select(query_id_col, id_col)
    short_rows = short_df.collect()
    short = spark.createDataFrame(short_rows, short_df.schema)
    ids = sorted({r[id_col] for r in short_rows})
    c = (
        idx.where(F.col(id_col).isin(ids))
        .select(F.col(id_col), as_double_array(F.col(vec_col)).alias("_cvec"))
        .withColumn("_cnorm", norm(F.col("_cvec")))
    )
    q = queries.where(F.size(F.col(vec_col)) == dim).select(
        F.col(query_id_col), as_double_array(F.col(vec_col)).alias("_qvec")
    ).withColumn("_qnorm", norm(F.col("_qvec")))
    scored = (
        F.broadcast(short)
        .join(c, id_col)
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col,
            id_col,
            F.round(
                cosine_prenormed(
                    F.col("_qvec"),
                    F.col("_cvec"),
                    F.col("_qnorm"),
                    F.col("_cnorm"),
                ),
                round_to,
            ).alias("cos"),
        )
    )
    out = top_k_per_group(
        scored, [query_id_col], [F.desc("cos"), F.asc(id_col)], k
    )
    out._ivfpq_adc_plan = adc  # executed ADC stage, for plan audits
    return out


def semantic_dedup_exact_cells(
    corpus: DataFrame,
    threshold: float,
    nlist: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    round_to: int = 4,
    use_arrow: bool = False,
) -> DataFrame:
    """:func:`semantic_dedup` with cells from the fixed-point integer
    k-means instead of the float spherical trainer — the SemDeDup
    variant whose ENTIRE result (cells, in-cell pair set, keep/prune
    flags) reproduces bit-for-bit on any engine, completing the
    exact-sibling set for the similarity tier.  Same rule: a vector is
    pruned when a smaller-id same-cell vector scores
    round(cos, round_to) ≥ threshold; NULL/empty vectors are outside
    the universe on both paths.

    Trade: training pays ``iters`` corpus-scale rounds (vs a bounded
    driver sample); the within-cell pair join and its Σ|cell|² cost
    are identical to the float path's expression mode.

    ``use_arrow=True`` routes the within-cell prune through the shared
    per-cell BLAS ``applyInPandas`` (:func:`_blas_keep_list`) — the
    production hot path — instead of the expression join.  The decision
    rule is the same ``round(cos, round_to) >= threshold``; numpy's
    round-half-even and Spark's HALF_UP can only diverge on a cosine
    landing EXACTLY on a half at the (round_to+1)-th decimal, which
    measure-zero doubles don't do — the BLAS/expression agreement is
    locked bit-for-bit by tests on the gate corpora."""
    from hfp_loader_spark.operators.clustering import kmeans_fixed_point

    assign = kmeans_fixed_point(
        corpus, nlist, iters, id_col=id_col, vec_col=vec_col, scale=scale
    ).select(F.col(id_col), F.col("cluster").alias("cell"))
    c = (
        corpus.where(F.size(F.col(vec_col)) > 0)
        .select(F.col(id_col), as_double_array(F.col(vec_col)).alias("_v"))
        .withColumn("_n", norm(F.col("_v")))
        .join(assign, id_col)
    )
    if use_arrow:
        return _blas_keep_list(
            c.select(id_col, "_v", "cell"), id_col, "cell", threshold, round_to
        )
    a = c.select(
        F.col(id_col).alias("_ia"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
        "cell",
    )
    b = c.select(
        F.col(id_col).alias("_ib"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
        F.col("cell").alias("_cb"),
    )
    removed = (
        a.join(b, (F.col("cell") == F.col("_cb")) & (F.col("_ia") < F.col("_ib")))
        .where(
            F.round(
                cosine_prenormed(
                    F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
                ),
                round_to,
            )
            >= threshold
        )
        .select(F.col("_ib").alias(id_col))
        .distinct()
        .withColumn("_rm", F.lit(True))
    )
    return assign.join(removed, id_col, "left").select(
        id_col, "cell", F.col("_rm").isNull().alias("kept")
    )

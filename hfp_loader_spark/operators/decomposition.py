"""Exact fixed-point linear algebra over embedding columns: scatter
(co-moment) matrix, dominant principal component by power iteration, and
projections onto it — every step a DataFrame plan whose arithmetic is
integer-exact, so an independent SQL oracle reproduces the results
bit-for-bit (the ``kmeans_fixed_point`` recipe applied to PCA).

Extension tier (the reference has no vector surface; SURVEY §2.11
similarity tier).  ``operators.similarity`` already reduces dimensions
with a *random* projection; this module is the data-DERIVED projection:
the covariance structure of the corpus itself, computed distributedly.

Why fixed-point: float covariance is not reproducible across engines
(partition-order summation), and eigensolvers are iterative float
recurrences — hopeless for a cross-engine hash gate.  Quantizing the
input once to int64 (``floor(x·scale)``) makes the scatter matrix an
exact integer aggregate, and normalizing each power-iteration step by
*flooring* an integer ratio (max-norm, not L2 — no square root) keeps
the whole eigenvector trajectory in exact integers.  Any engine
replaying the recurrence lands on the identical vector.

Scale shape: the only corpus-sized work is ONE pass that folds each
Arrow batch into a d(d+1)/2-entry partial Gram matrix with numpy
(`X.T @ X` — vectorized, no Python per-row work) plus per-dimension
sums and a count; what shuffles is (#batches × d²/2) partial rows into
a single (i, j)-keyed aggregate.  Everything after that — centering,
power iteration, Rayleigh quotient — operates on a ≤d² frame that is
lazily localCheckpoint-ed (d=64 → 2 145 rows) so its four consumers
don't re-scan the corpus.  The iteration itself joins a d²-row frame
with a d-row vector per step: driver-free, executor-trivial.

Overflow audit (|q| ≤ scale·|x|, d dims, n rows, chunk ≤ _CHUNK):
per-chunk int64 partials need chunk·q² < 2^63 (6e5² · 8192 ≈ 3e15 ✓);
the centered numerator N = n·Σxy − Σx·Σy ≤ 2·n²·q² rides in
DECIMAL(38,0) / HUGEINT (3e18 at n=2000 ✓); the matrix is pre-divided
by n² before iterating, so a matvec entry is ≤ d·(N/n²)·vscale ≈ 5e19
and the Rayleigh numerator ≤ d²·(N/n²)·vscale² ≈ 3e27 — both inside 38
digits with ten orders of margin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hfp_loader_spark.operators.clustering import quantize_vec

_DEC = "decimal(38,0)"
# numpy partial-Gram chunk rows: keeps int64 partials exact for
# |q| ≤ ~1e6 per the module-docstring audit
_CHUNK = 8192


def _floor_div(a: Column, b: Column) -> Column:
    """Exact floor division of integer-valued decimals, b > 0 — spelled
    out as subtract-canonical-remainder-then-divide because engines
    disagree on native integer division (Spark decimal ``/`` rounds,
    DuckDB ``//`` truncates toward zero): ``(a − ((a%b)+b)%b) / b`` is
    exactly divisible, so every engine's division agrees."""
    r = ((a % b) + b) % b
    return ((a - r) / b).cast(_DEC)


def scatter_stats(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    materialize: bool = True,
) -> DataFrame:
    """One corpus pass → the sufficient statistics of the scatter matrix
    as a ``(kind, i, j, val)`` frame (``val`` DECIMAL(38,0); positions
    1-based):

    - ``kind=0, (0,0)``: row count n (vectors with ``size > 0``; NULL /
      empty vectors are excluded exactly as in ``kmeans_fixed_point``)
    - ``kind=1, (i,0)``: per-dimension sum  Σ qᵢ
    - ``kind=2, (i,j) i≤j``: upper-triangle co-moment  Σ qᵢ·qⱼ

    Each Arrow batch is folded by numpy into ONE partial-stat row set
    (chunked at ``_CHUNK`` rows for int64 headroom) — the corpus never
    shuffles; only (#chunks × (d²/2 + d + 1)) partial rows reach the
    single (kind, i, j) hash aggregate, which map-side-combines.

    ``materialize=True`` lazily localCheckpoints the aggregated frame
    (d²/2 + d + 1 rows — trivially small) because downstream centering
    references it for n, sums, and moments separately; unchecked, each
    reference would re-run the corpus scan.  Plan construction stays
    job-free (``eager=False``)."""
    q = emb.where(F.size(F.col(vec_col)) > 0).select(
        quantize_vec(F.col(vec_col), scale).alias("q")
    )

    def fold(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # group by vector length before stacking: a ragged corpus
            # (mixed embedding versions) must not crash the fold, and
            # per-length processing makes the Spark semantics equal the
            # SQL oracle's (each vector contributes to exactly its own
            # positions — generate_series does the same per row)
            by_len = pdf.groupby(pdf["q"].apply(len), sort=False)
            for _, grp in by_len:
                yield from _fold_group(grp["q"], np, pd)

    def _fold_group(series, np, pd):
        for lo in range(0, len(series), _CHUNK):
            chunk = series.iloc[lo : lo + _CHUNK]
            X = np.stack(chunk.to_numpy()).astype(np.int64)
            d = X.shape[1]
            G = X.T @ X
            iu, ju = np.triu_indices(d)
            s = X.sum(axis=0)
            kind = np.concatenate(
                ([0], np.ones(d, np.int32), np.full(len(iu), 2, np.int32))
            )
            ii = np.concatenate(([0], np.arange(1, d + 1), iu + 1))
            jj = np.concatenate(([0], np.zeros(d, np.int32), ju + 1))
            vv = np.concatenate(([X.shape[0]], s, G[iu, ju]))
            yield pd.DataFrame(
                {"kind": kind, "i": ii, "j": jj, "val": vv}
            )

    stats = (
        q.mapInPandas(fold, "kind int, i int, j int, val long")
        .groupBy("kind", "i", "j")
        .agg(F.sum(F.col("val").cast(_DEC)).alias("val"))
    )
    return stats.localCheckpoint(eager=False) if materialize else stats


def merge_scatter_stats(*parts: DataFrame) -> DataFrame:
    """Mergeable-aggregate algebra for ``scatter_stats`` output: count,
    per-dim sums, and co-moments are all plain sums, so stats computed
    over disjoint corpus deltas merge by union + re-aggregate — the
    covariance/PCA of a growing corpus is maintained incrementally
    (O(delta) per refresh, the ``incremental.py`` recipe applied to
    linear algebra) instead of rescanning history.  Inputs must share
    the quantization scale; the result is exactly ``scatter_stats`` of
    the concatenated corpus, so every downstream consumer (centering,
    power iteration) is oblivious to how the stats were produced."""
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return merged.groupBy("kind", "i", "j").agg(
        F.sum("val").alias("val")
    )


def centered_numerator(stats: DataFrame, full: bool = False) -> DataFrame:
    """Centered scatter NUMERATOR from ``scatter_stats`` output:
    ``(i, j, nn, n)`` with nn = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ (exact; = n²·covᵢⱼ·
    scale²).  Upper triangle by default; ``full=True`` mirrors both
    orientations.  All joins broadcast d- or 1-row frames."""
    n = stats.where((F.col("kind") == 0)).select(
        F.col("val").alias("n")
    )
    sums = stats.where(F.col("kind") == 1).select(
        F.col("i").alias("pos"), F.col("val").alias("s")
    )
    upper = stats.where(F.col("kind") == 2).select("i", "j", "val")
    tri = (
        upper.unionByName(
            upper.where(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"), F.col("i").alias("j"), "val"
            )
        )
        if full
        else upper
    )
    si = sums.select(F.col("pos").alias("i"), F.col("s").alias("si"))
    sj = sums.select(F.col("pos").alias("j"), F.col("s").alias("sj"))
    return (
        tri.crossJoin(F.broadcast(n))
        .join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i",
            "j",
            (F.col("n") * F.col("val") - F.col("si") * F.col("sj")).alias(
                "nn"
            ),
            "n",
        )
    )


def centered_scatter(stats: DataFrame) -> DataFrame:
    """Centered scatter matrix from ``scatter_stats`` output, FULL (both
    orientations), pre-divided by n²:  Sᵢⱼ = ⌊(n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) / n²⌋
    ≈ covᵢⱼ·scale² as an exact integer.  Output ``(i, j, s)``; d² rows."""
    return centered_numerator(stats, full=True).select(
        "i",
        "j",
        _floor_div(
            F.col("nn"), (F.col("n") * F.col("n")).cast(_DEC)
        ).alias("s"),
    )


def power_iteration_pc1(
    scatter: DataFrame,
    iters: int = 3,
    vscale: int = 1_000_000,
    materialize: bool = True,
    scale: int = 1_000_000,
) -> DataFrame:
    """Dominant eigenvector of the centered scatter by ``iters`` power-
    iteration steps, entirely in exact integers: start from the all-ones
    vector (quantized to ``vscale``), multiply by the matrix, and
    re-normalize each step by max-|component| — ``v′ = ⌊w·vscale /
    max|w|⌋`` — instead of the (irrational) L2 norm, so the trajectory
    never leaves ℤ and every engine lands on the identical vector.
    Convergence is the standard power-method ratio |λ₂/λ₁| per step; the
    all-ones start is deterministic and non-orthogonal to PC1 for any
    corpus without exact symmetry (a pathological orthogonal start would
    converge to PC2 — on BOTH engines, so parity still holds).

    Output ``(pos, v_q, eigenvalue)`` — d rows; ``v_q/vscale`` is the
    max-normalized component, ``eigenvalue`` the Rayleigh quotient
    vᵀSv / (vᵀv·scale²) rounded once to 8 decimals (exact integer
    numerator and denominator; one IEEE division + one multiply, same on
    every engine).  ``scale`` MUST equal the quantization scale the
    scatter was built with (``scatter_stats(scale=…)``) — the Rayleigh
    denominator de-quantizes by scale²; a mismatch keeps ``v_q`` valid
    but reports the eigenvalue off by (scale_built/scale)² (ADVICE r9).
    Each step is a d²×d join + d-row aggregate —
    no corpus access at all (that happened once, in ``scatter_stats``).

    ``materialize=True`` lazily localCheckpoints the d²-row scatter and
    each iterate (the ``sim_mmr_rerank`` lesson: an unrolled recurrence
    otherwise re-derives every prior step's subtree per reference —
    ~250 joins / ~100 exchanges of pure scheduling overhead at d=64,
    ~6 s of wall for a 64-row result; checkpointed it executes in
    milliseconds past the stats scan).  Plan construction stays
    job-free (``eager=False``)."""
    if materialize:
        scatter = scatter.localCheckpoint(eager=False)
    v = scatter.select(F.col("i").alias("pos")).distinct().select(
        "pos", F.lit(vscale).cast(_DEC).alias("v")
    )
    for _ in range(iters):
        w = (
            scatter.join(
                F.broadcast(v.select(F.col("pos").alias("j"), "v")), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.col("s") * F.col("v")).alias("w"))
        )
        m = w.agg(
            F.greatest(F.max(F.abs(F.col("w"))), F.lit(1).cast(_DEC)).alias(
                "m"
            )
        )
        v = w.crossJoin(F.broadcast(m)).select(
            F.col("i").alias("pos"),
            _floor_div(
                F.col("w") * F.lit(vscale).cast(_DEC), F.col("m")
            ).alias("v"),
        )
        if materialize:
            v = v.localCheckpoint(eager=False)
    vi = v.select(F.col("pos").alias("i"), F.col("v").alias("vi"))
    vj = v.select(F.col("pos").alias("j"), F.col("v").alias("vj"))
    quad = (
        scatter.join(F.broadcast(vi), "i")
        .join(F.broadcast(vj), "j")
        .agg(F.sum(F.col("s") * F.col("vi") * F.col("vj")).alias("num"))
    )
    den = v.agg(F.sum(F.col("v") * F.col("v")).alias("den"))
    rho = quad.crossJoin(F.broadcast(den)).select(
        F.round(
            F.col("num").cast("double")
            / (F.col("den").cast("double") * F.lit(float(scale) ** 2)),
            8,
        ).alias("eigenvalue")
    )
    return v.crossJoin(F.broadcast(rho)).select(
        "pos", F.col("v").cast("long").alias("v_q"), "eigenvalue"
    )


def deflate_scatter(scatter: DataFrame, pc: DataFrame) -> DataFrame:
    """Integer Hotelling deflation: subtract the rank-1 component of an
    extracted eigenvector from the scatter so the next power iteration
    converges to the NEXT eigenpair —  S′ᵢⱼ = Sᵢⱼ − ⌊λ̂·vᵢ·vⱼ / vᵀv⌋
    with λ̂ = ⌊vᵀSv / vᵀv⌋.  The two floors make S′ deterministic
    integers (bit-exact on any engine) at the cost of a residual
    leakage ≤ 1 ulp of the fixed-point grid per entry — orders below
    the λ₁→λ₂ spectral gap, and identical on both engines either way.

    Magnitude audit (continues the module docstring's): λ̂ ≈ λ₁·scale²
    ≤ ~1e12; λ̂·vᵢ·vⱼ ≤ 1e12·vscale² = 1e24 — inside both DECIMAL(38,0)
    and HUGEINT without the naive (vᵀSv)·vᵢ·vⱼ form's 1e39 blow-up
    (which is WHY λ̂ is floored first).

    ``pc`` is ``power_iteration_pc1`` output (``pos``, ``v_q``); the
    result has the same ``(i, j, s)`` shape as the input, so the
    extraction composes: deflate → power-iterate → deflate → …"""
    v = pc.select("pos", F.col("v_q").cast(_DEC).alias("v"))
    vj = v.select(F.col("pos").alias("j"), F.col("v").alias("vj"))
    vi = v.select(F.col("pos").alias("i"), F.col("v").alias("vi"))
    w = (
        scatter.join(F.broadcast(vj), "j")
        .groupBy("i")
        .agg(F.sum(F.col("s") * F.col("vj")).alias("w"))
    )
    num = w.join(F.broadcast(vi), "i").agg(
        F.sum(F.col("w") * F.col("vi")).alias("num")
    )
    den = v.agg(F.sum(F.col("v") * F.col("v")).alias("den"))
    lam = num.crossJoin(F.broadcast(den)).select(
        _floor_div(F.col("num"), F.col("den")).alias("lam"), "den"
    )
    return (
        scatter.join(F.broadcast(vi), "i")
        .join(F.broadcast(vj), "j")
        .crossJoin(F.broadcast(lam))
        .select(
            "i",
            "j",
            (
                F.col("s")
                - _floor_div(
                    F.col("lam") * F.col("vi") * F.col("vj"), F.col("den")
                )
            ).alias("s"),
        )
    )


def project_pc1(
    emb: DataFrame,
    pc1: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    vscale: int = 1_000_000,
) -> DataFrame:
    """Exact integer projection of every vector onto the fixed-point PC1:
    ``t = Σ qᵢ·v_qᵢ`` (DECIMAL — |t| ≤ d·q·vscale ≈ 4e13 at d=64).
    Output ``(id_col, t)``; ``t/(scale·vscale)`` is the float-space
    projection.  Shape: the d-row eigenvector folds in as ONE broadcast
    array literal-equivalent (a broadcast join + zip_with fold), so the
    corpus is touched exactly once and never shuffled."""
    vec = pc1.agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("v_q")))
            ),
            lambda s: s.getField("v_q"),
        ).alias("_pc")
    )
    q = emb.where(F.size(F.col(vec_col)) > 0).select(
        F.col(id_col), quantize_vec(F.col(vec_col), scale).alias("q")
    )
    return q.crossJoin(F.broadcast(vec)).select(
        id_col,
        F.aggregate(
            F.zip_with(
                F.col("q"),
                F.col("_pc"),
                lambda a, b: (a.cast(_DEC) * b.cast(_DEC)),
            ),
            F.lit(0).cast(_DEC),
            lambda acc, x: acc + x,
        ).alias("t"),
    )


def top_p_components(
    scatter: DataFrame,
    p: int,
    iters: int = 3,
    vscale: int = 1_000_000,
    materialize: bool = True,
    scale: int = 1_000_000,
) -> list[DataFrame]:
    """The top-``p`` spectral directions by the deflate → power-iterate
    loop: component i is ``power_iteration_pc1`` on the scatter with
    components 0..i−1 Hotelling-deflated out (``deflate_scatter``).
    Returns ``p`` frames of ``(pos, v_q, eigenvalue)`` — the PCA
    projection basis for rank reduction before ANN indexing.  Everything
    stays exact integers; no additional corpus passes beyond the one
    that built the scatter."""
    out: list[DataFrame] = []
    cur = scatter
    for _ in range(p):
        pc = power_iteration_pc1(
            cur, iters=iters, vscale=vscale, materialize=materialize,
            scale=scale,
        )
        out.append(pc)
        cur = deflate_scatter(cur, pc)
        if materialize:
            cur = cur.localCheckpoint(eager=False)
    return out


def save_scatter_stats(
    spark,
    stats: DataFrame,
    root: str,
    scale: int = 1_000_000,
    meta: dict | None = None,
) -> int:
    """Persist scatter stats as a versioned-table snapshot — the
    train-once/refresh-forever contract of the IVF/PQ codebooks applied
    to the PCA sufficient statistics.  The quantization ``scale`` is
    stamped into the snapshot meta (stats built at different scales
    must never merge — the same class of silent corruption the
    signature-index ``signature_params`` stamp guards against).

    ``mode='append'`` on refresh: a delta's stats commit as a NEW dir
    and readers re-aggregate on load (``load_scatter_stats``) — O(delta)
    maintenance, O(1) commit, time-travel for free."""
    from hfp_loader_spark.versioned import commit_snapshot

    out = stats.select(
        "kind", "i", "j", F.col("val").cast("string").alias("val")
    )
    return commit_snapshot(
        spark, out, root, mode="append",
        meta={"scale": scale, **(meta or {})},
    )


def load_scatter_stats(
    spark, root: str, scale: int = 1_000_000, version: int | None = None
) -> DataFrame:
    """Load (and merge) every committed scatter delta: the versioned
    dirs union and re-aggregate by (kind, i, j) — exactly
    ``merge_scatter_stats`` over the commit history, so downstream
    centering/iteration sees the stats of the full corpus-so-far.
    Refuses a scale mismatch (see ``save_scatter_stats``)."""
    from hfp_loader_spark.versioned import (
        _read_manifest,
        latest_version,
        read_snapshot,
    )

    v = latest_version(spark, root) if version is None else version
    meta = _read_manifest(spark, root, v).meta if v is not None else {}
    stored = meta.get("scale")
    if stored is not None and int(stored) != int(scale):
        raise ValueError(
            f"scatter stats at {root!r} were built with scale={stored}, "
            f"requested {scale} — rebuild, don't mix quantization grids"
        )
    df = read_snapshot(spark, root, version)
    return (
        df.select(
            "kind", "i", "j", F.col("val").cast(_DEC).alias("val")
        )
        .groupBy("kind", "i", "j")
        .agg(F.sum("val").alias("val"))
    )

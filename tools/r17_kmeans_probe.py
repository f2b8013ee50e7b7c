"""Round-17 measurement probe (guide §1): where does the k-means
entries' wall time go?  Times subtrees of sim_ann_pq_exact_codes /
sim_ann_ivf_exact_cells / emb_kmeans_by_label with the noop sink, and
A/Bs the per-round assignment pass: interpreted HOF fold vs an
integer-quantized pandas/Arrow batch twin.  Throwaway measurement
tooling — not part of any query path.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterator, Tuple

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def t(label, df, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    print(f"SUB {label:50s} {sorted(runs)}", flush=True)
    return min(runs)


def main():
    sf_dir = "/root/testdata/sf0.1"
    from hfp_loader_spark.plans import catalog
    from hfp_loader_spark.session import get_spark

    spark = get_spark(app_name="r17_probe")
    catalog.REGISTRY["q1_pricing_summary"].builder(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    from hfp_loader_spark.operators.clustering import (
        _argmin_centroid,
        _centroid_array,
        kmeans_fixed_point,
        kmeans_fixed_point_grouped,
        quantize_vec,
    )

    emb = catalog.load_table(spark, sf_dir, "embeddings")

    # ---- subtree: ungrouped kmeans (k=8, iters=3) ----
    for it in (1, 2, 3):
        t(f"kmeans_fixed_point iters={it}", kmeans_fixed_point(emb, 8, it))

    # ---- grouped kmeans as used by PQ training (m=8 subspaces) ----
    dim, m, ksub = 64, 8, 16
    sub = dim // m
    base = emb.where(F.size("embedding") == dim).select(
        "vec_id", quantize_vec(F.col("embedding"), 1_000_000).alias("_q")
    )
    sliced = base.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice("_q", j * sub + 1, sub) for j in range(m)])
        ).alias("grp", "q"),
    )
    for it in (1, 3):
        a, c = kmeans_fixed_point_grouped(
            sliced, ksub, it, group_col="grp", id_col="vec_id", qvec_col="q"
        )
        t(f"grouped kmeans iters={it} (codes)", a)

    # ---- assignment-pass A/B on the corpus (one round shape) ----
    q = emb.where(F.size("embedding") > 0).select(
        "vec_id", quantize_vec(F.col("embedding"), 1_000_000).alias("q")
    )
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
        "vec_id"
    )
    cent = (
        q.orderBy("vec_id")
        .limit(8)
        .select(
            (F.row_number().over(w) - 1).alias("cluster"),
            F.col("q").alias("cq"),
        )
    )
    carr = _centroid_array(cent)

    scored_fold = q.crossJoin(F.broadcast(carr)).select(
        "vec_id",
        "q",
        _argmin_centroid(F.col("q"), F.col("_cents")).alias("_m"),
    )
    t("assign pass: HOF fold", scored_fold)

    # pandas twin prototype: cents shipped on the first row per partition
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<d:long,cluster:int>")
    def argmin_pd(
        it: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        C = None
        cl = None
        for qs, cs in it:
            if C is None:
                for cell in cs:
                    if cell is not None:
                        cl = np.array(
                            [int(c["cluster"]) for c in cell], dtype=np.int64
                        )
                        C = np.stack(
                            [
                                np.asarray(c["cq"], dtype=np.int64)
                                for c in cell
                            ]
                        )
                        break
            Q = np.stack([np.asarray(v, dtype=np.int64) for v in qs])
            diff = Q[:, None, :] - C[None, :, :]
            d = (diff * diff).sum(axis=2)
            idx = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "d": d[np.arange(len(idx)), idx],
                    "cluster": cl[idx].astype("int32"),
                }
            )

    first = (
        F.monotonically_increasing_id() % F.lit(1 << 33) == 0
    )
    scored_pd = q.crossJoin(F.broadcast(carr)).select(
        "vec_id",
        "q",
        argmin_pd(
            F.col("q"), F.when(first, F.col("_cents"))
        ).alias("_m"),
    )
    t("assign pass: pandas twin", scored_pd)

    # equality check
    a = scored_fold.select("vec_id", "_m.d", "_m.cluster").orderBy("vec_id")
    b = scored_pd.select("vec_id", "_m.d", "_m.cluster").orderBy("vec_id")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print("EQUAL" if diff == 0 else f"MISMATCH {diff}", flush=True)

    # full-entry reference points
    for name in (
        "sim_ann_pq_exact_codes",
        "sim_ann_ivf_exact_cells",
        "emb_kmeans_by_label",
    ):
        b = catalog.REGISTRY[name].builder
        b(spark, sf_dir)
        t(f"entry {name}", b(spark, sf_dir))


if __name__ == "__main__":
    main()

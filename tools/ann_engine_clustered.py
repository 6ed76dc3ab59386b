"""ENGINE-side run of the sharper clustered-geometry IVF config.

tools/ann_tune.py --clustered measured (in its numpy replayer) that on
mixture-of-Gaussians geometry IVF nlist=32/nprobe=2 reaches recall
~0.99 at a ~0.075 candidate fraction. This script promotes that row
from tuner evidence to engine evidence (VERDICT r10 #8): the same
config runs END-TO-END in Spark — pyspark.ml KMeans quantizer, cell
filter, exact cosine rank over the probed cells — on the persisted
clustered fixture, and reports Spark-measured recall@10, candidate
fraction, and wall time per probe, averaged over the same 8
lowest-vec_id queries the tuner uses.

Usage: python tools/ann_engine_clustered.py
Prints one JSON line; the numbers land in SCALE.md's clustered table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

NLIST = 32
NPROBE = 2
K = 10
N_QUERIES = 8


def main() -> None:
    import numpy as np

    from ann_tune import gen_clustered

    sf_dir = os.path.dirname(gen_clustered())

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from data_wrangler_spark.catalog import load_table
    from data_wrangler_spark.functions.vectors import (
        cosine,
        embedding_dim,
        to_double_array,
    )
    from data_wrangler_spark.session import get_spark

    spark = get_spark("ann_engine_clustered")
    raw = load_table(spark, sf_dir, "embeddings")
    dim = embedding_dim(raw)
    n = raw.count()
    e = raw.select(
        "vec_id", to_double_array("embedding").alias("e")
    ).withColumn("v", array_to_vector("e"))

    t0 = time.time()
    model = KMeans(
        k=NLIST, seed=42, featuresCol="v", predictionCol="cell"
    ).fit(e)
    assigned = (
        model.transform(e).select("vec_id", "e", "cell").persist()
    )
    assigned.count()  # materialize: index build ends here
    build_s = time.time() - t0
    centers = model.clusterCenters()

    qrows = {
        r.vec_id: np.array(r.e)
        for r in e.select("vec_id", "e")
        .orderBy("vec_id")
        .limit(N_QUERIES)
        .collect()
    }

    recalls, fracs, walls = [], [], []
    for qid, qvec in sorted(qrows.items()):
        order = np.argsort(
            [float(np.linalg.norm(qvec - c)) for c in centers]
        )
        probe_cells = [int(c) for c in order[:NPROBE]]
        q = spark.createDataFrame(
            [(qvec.tolist(),)], "qe array<double>"
        )

        t1 = time.time()
        cand = assigned.filter(
            F.col("cell").isin(probe_cells) & (F.col("vec_id") != qid)
        )
        got = [
            r.vec_id
            for r in cand.crossJoin(F.broadcast(q))
            .withColumn("cos_sim", cosine(F.col("e"), F.col("qe"), dim))
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(K)
            .collect()
        ]
        walls.append(time.time() - t1)
        fracs.append(cand.count() / n)

        exact = [
            r.vec_id
            for r in e.filter(F.col("vec_id") != qid)
            .crossJoin(F.broadcast(q))
            .withColumn("cos_sim", cosine(F.col("e"), F.col("qe"), dim))
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(K)
            .collect()
        ]
        recalls.append(len(set(got) & set(exact)) / K)

    print(
        json.dumps(
            {
                "fixture": sf_dir,
                "n": n,
                "dim": dim,
                "config": f"IVF nlist={NLIST} nprobe={NPROBE}",
                "queries": N_QUERIES,
                "recall_at_10": round(sum(recalls) / len(recalls), 3),
                "candidate_fraction": round(sum(fracs) / len(fracs), 4),
                "probe_wall_s_mean": round(sum(walls) / len(walls), 3),
                "quantizer_build_s": round(build_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

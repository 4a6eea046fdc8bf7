"""Round-12 decade probe: cost curves for the two new heavy operators.

1. kmeans_fit (k=8, n_iter=3, dim=64) over synthetic per-id-seeded
   embeddings at 100k -> 1M rows (the SAME generator recipe as
   tools/make_scale_decade.py, so rows are reproducible): each Lloyd
   iteration is one mapInPandas moment pass, so wall should grow
   ~linearly with rows and never superlinearly (the quality_lr
   checkpoint lesson — features here are the raw vector column, and
   kmeans_fit localCheckpoints it once).

2. epoch_shuffle at 600k -> 6M -> 60M ids (spark.range input so the
   curve isolates the operator: md5 projection + range exchange +
   offset pass), driven through a noop write (the decade rule: count()
   prunes the work).

Usage: python tools/probe_round12_decade.py
Protocol: untimed warm-up, best-of-3, quiet host required.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pulsar_elasticsearch_sync_rs_spark.session import get_spark
from pulsar_elasticsearch_sync_rs_spark.operators.kmeans import kmeans_fit
from pulsar_elasticsearch_sync_rs_spark.operators.ordering import epoch_shuffle

DIM = 64


def synth_embeddings(spark, n: int):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = [
                (
                    int(v),
                    np.random.default_rng(v).normal(size=DIM).astype(np.float32).tolist(),
                )
                for v in ids
            ]
            yield pd.DataFrame(rows, columns=["vec_id", "embedding"])

    return spark.range(n).mapInPandas(gen, schema)


def best_of(fn, reps=3):
    fn()  # warm-up
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return min(walls)


def main():
    spark = get_spark(app_name="probe_r12", cpus=32)

    print("# kmeans_fit decade (k=8, n_iter=3, dim=64)")
    for n in (100_000, 1_000_000):
        # materialize the synthetic input OUTSIDE the timed section so
        # the probe measures the fit, not the generator. persist(), not
        # localCheckpoint: unpersist() on a checkpoint is a no-op (the
        # blocks linger until GC) and the freed memory matters — the
        # next decade step must not be timed against this step's blocks
        emb = synth_embeddings(spark, n).persist()
        emb.count()
        w = best_of(lambda: kmeans_fit(emb, "embedding", k=8, n_iter=3, id_col="vec_id"))
        print(f"kmeans n={n}: {w:.2f}s")
        emb.unpersist(blocking=True)

    print("# epoch_shuffle decade (noop write)")
    for n in (600_000, 6_000_000, 60_000_000):
        ids = spark.range(n).withColumnRenamed("id", "doc_id").persist()
        ids.count()

        def run():
            epoch_shuffle(ids, "doc_id", epoch=7).write.format("noop").mode(
                "overwrite"
            ).save()

        w = best_of(run)
        print(f"epoch_shuffle n={n}: {w:.2f}s")
        ids.unpersist(blocking=True)

    spark.stop()


if __name__ == "__main__":
    main()

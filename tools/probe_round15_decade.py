"""Round-15 decade probes for the round's two new cost shapes:

1. append_block_aligned — the operational claim is that growing the
   corpus costs O(appended + tail), INDEPENDENT of the base layout
   size: append the same 50k-row slice to a 500k-row and a 5M-row
   block-aligned layout and compare walls (plus the incremental
   sidecar update, which touches only the new files).
2. pack_bins_residual_fill — the histogram-arithmetic packer must be
   ~linear across a decade (the only corpus-wide work is one
   map-side-combined groupBy(class); everything after is driver
   arithmetic over ≤ capacity rows + range-generated bins).

Synthetic inputs from spark.range (the operators take (id, n_tok) /
(doc_id) projections — no text needed), token lengths 10..99 like the
documents fixture. Run on a QUIET host; single-shot walls here are
yardsticked by the bench protocol's caveats.

Run:  python tools/probe_round15_decade.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pulsar_elasticsearch_sync_rs_spark.session import get_spark


def docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("d"), F.format_string("%09d", F.col("id"))).alias(
            "doc_id"
        )
    )


def main() -> None:
    spark = get_spark(
        app_name="probe_round15",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    from pulsar_elasticsearch_sync_rs_spark.operators.ordering import (
        append_block_aligned,
        global_index,
        persist_block_aligned,
        read_layout_meta,
    )
    from pulsar_elasticsearch_sync_rs_spark.operators.packing import (
        pack_bins_residual_fill,
    )

    tmp = tempfile.mkdtemp(prefix="r15_decade_")
    print("== append_block_aligned: base-size independence ==")
    walls = {}
    for n_base in (500_000, 5_000_000):
        path = os.path.join(tmp, f"base_{n_base}")
        base = global_index(docs(spark, 0, n_base), "doc_id", out_col="pos")
        persist_block_aligned(base, path, block_size=4096)
        new = docs(spark, n_base, n_base + 50_000)
        t0 = time.perf_counter()
        rep = append_block_aligned(new, path, "doc_id")
        w = time.perf_counter() - t0
        walls[n_base] = w
        meta = read_layout_meta(path)
        assert rep["n"] == meta["n"] == n_base + 50_000
        print(
            f"  base={n_base:>9,}  append 50k: {w:6.2f}s  "
            f"(files now {len(meta['files'])}, tail_rewritten="
            f"{rep['tail_rewritten']})"
        )
    print(
        f"  growth {walls[5_000_000] / walls[500_000]:.2f}x for a 10x "
        "base (1.0x = perfectly base-independent)"
    )

    print("== interleave_append: increment-proportional growth ==")
    from pulsar_elasticsearch_sync_rs_spark.operators.ordering import (
        interleave_append,
        interleave_by_weight,
    )

    weights = {"a": 1, "b": 2, "c": 3}

    def with_src(d):
        return d.withColumn(
            "src",
            F.element_at(
                F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                ((F.xxhash64("doc_id") % 3 + 3) % 3 + 1).cast("int"),
            ).cast("string"),
        )

    for n_base in (500_000, 5_000_000):
        base_docs = with_src(docs(spark, 0, n_base))
        path = os.path.join(tmp, f"ileave_{n_base}")
        mixed = interleave_by_weight(base_docs, "src", weights, "doc_id")
        persist_block_aligned(mixed, path, block_size=4096)
        for mode, lo in (("fresh", n_base), ("continue", n_base + 50_000)):
            slice_docs = with_src(docs(spark, lo, lo + 50_000))
            t0 = time.perf_counter()
            interleave_append(
                slice_docs, path, "src", weights, "doc_id", mode=mode
            )
            print(
                f"  base={n_base:>9,} mode={mode:8s} append 50k: "
                f"{time.perf_counter() - t0:6.2f}s"
            )

    print("== pack_bins_residual_fill: decade growth ==")
    pws = {}
    for n in (500_000, 5_000_000):
        d = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.lit(10) + (F.col("id") * 2654435761 % 90)).alias("n_tok"),
        )
        out = pack_bins_residual_fill(d, "n_tok", "doc_id", capacity=256)
        out.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        out = pack_bins_residual_fill(d, "n_tok", "doc_id", capacity=256)
        out.write.format("noop").mode("overwrite").save()
        pws[n] = time.perf_counter() - t0
        print(f"  n={n:>9,}: {pws[n]:6.2f}s")
    print(f"  growth {pws[5_000_000] / pws[500_000]:.2f}x for 10x rows")
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

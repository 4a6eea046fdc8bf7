"""Build a one-decade-up scale factor (default sf0.1 → "sf1") for the
SCALE.md data-scaling probe. The driver ships fixtures only up to
sf0.1; this tool upsizes them reproducibly so the bench can be run one
decade into the data-dependent regime.

Construction (deterministic, seed-free except where noted):

- region/nation: copied unchanged (fixed-cardinality dims, as in
  TPC-H).
- customer/supplier/part/orders/lineitem: R key-shifted replicas with
  CONSISTENT foreign keys (replica i shifts every key k by
  i · SHIFT[table-of-k]), so each replica is an independent copy of
  the sf0.1 universe: join selectivities, per-key group sizes, and
  skew profiles are preserved exactly while data volume scales by R.
- events: R replicas with shifted event_id/user_id and the replica
  index injected into the JSON payload (payloads stay valid JSON but
  become globally unique — content-hash dedup keeps its real regime
  instead of collapsing 90% of a replicated stream).
- documents: R replicas where replica i>0 suffixes EVERY token with
  ``_<i>.<SHIFT>`` (SHIFT makes the suffix unique per nesting level,
  exactly like the id shift) — vocabularies of different replicas are
  disjoint EVEN when the source is itself a decade output, so no
  artificial cross-replica near-dups are created and every similarity
  ground truth (exact-dup groups, Jaccard pairs, minhash buckets,
  PPJoin prefix df profile) scales EXACTLY by R. This mimics how a
  sharded crawl scales: new content, same internal structure.
- embeddings: original vectors plus fresh seeded N(0,1) vectors up to
  R_EMB× (default 4× — the ratio the driver's own sf0.01→sf0.1 decade
  used), labels drawn uniformly from the existing label set.

Run:  python tools/make_scale_decade.py [SRC_DIR] [DST_DIR] [R] [TABLES] [SHIFT]
      (defaults: /root/testdata/sf0.1 /tmp/sf1 10 all 10000000)
      sf10 text/vector decade: python tools/make_scale_decade.py \
          /tmp/sf1 /tmp/sf10 10 documents,embeddings 1000000000

TABLES: optional comma-separated subset (e.g. ``documents,embeddings``)
for deep-decade probes of the text/vector lanes only — building the
full relational pack at sf10 (60M lineitem rows) buys nothing for
those cost curves.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pulsar_elasticsearch_sync_rs_spark.session import get_spark

# key spaces: shift must clear the max key at the SOURCE sf; 10M clears
# every sf≤1 DRIVER fixture with room. When the SOURCE is itself a
# decade output (sf1 → sf10), its keys already reach reps·SHIFT — pass
# a larger SHIFT (5th arg) that clears them, or replicas collide.
SHIFT = 10_000_000
R_EMB = 4


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    global SHIFT
    if len(sys.argv) > 5:
        SHIFT = int(sys.argv[5])
    spark = get_spark(app_name="make_scale_decade", cpus=16)
    os.makedirs(dst, exist_ok=True)

    def wanted(name: str) -> bool:
        return only is None or name in only

    def rd(name):
        return spark.read.parquet(f"{src}/{name}.parquet")

    def wr(df, name, parts=8):
        df.repartition(parts).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"# {name}: {spark.read.parquet(f'{dst}/{name}.parquet').count()} rows")

    def replicate(df, key_cols: list[str], i_expr=None):
        """Union of R key-shifted replicas; i_expr(df, i) may add
        replica-specific mutations."""
        parts = []
        for i in range(reps):
            d = df
            for k in key_cols:
                d = d.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if i_expr is not None:
                d = i_expr(d, i)
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    if wanted("region"):
        wr(rd("region"), "region", 1)
    if wanted("nation"):
        wr(rd("nation"), "nation", 1)
    if wanted("customer"):
        wr(replicate(rd("customer"), ["c_custkey"]), "customer")
    if wanted("supplier"):
        wr(replicate(rd("supplier"), ["s_suppkey"]), "supplier", 2)
    if wanted("part"):
        wr(replicate(rd("part"), ["p_partkey"]), "part", 2)
    if wanted("orders"):
        wr(replicate(rd("orders"), ["o_orderkey", "o_custkey"]), "orders")
    if wanted("lineitem"):
        wr(
            replicate(rd("lineitem"), ["l_orderkey", "l_partkey", "l_suppkey"]),
            "lineitem",
            16,
        )

    def mutate_events(d, i):
        if i == 0:
            return d
        # unique payload per replica, still valid JSON: only inject the
        # marker when a key follows (a bare '{}' would otherwise gain a
        # trailing comma and dead-letter every replica copy), and allow
        # leading whitespace so those payloads don't silently skip
        # uniquification and collapse under content-hash dedup. The
        # marker KEY embeds SHIFT — unique per nesting level, same rule
        # as the id shift and the vocab suffix: a bare "__rep" injected
        # at two levels makes a DUPLICATE map key, which ANSI map
        # building rejects at runtime on ~(R-1)/R · (R-1)/R of a
        # twice-replicated fixture (found by the round-9 q_etl_chain
        # noop profile at sf10; the count() action had pruned the
        # map-parsing aggregate expressions and never evaluated it).
        key = '"__rep.%d"' % SHIFT
        return d.withColumn(
            "props",
            F.when(
                F.col("props").rlike(r'^\s*\{\s*"'),
                F.regexp_replace("props", r"^(\s*)\{", "$1{%s: %d, " % (key, i)),
            ).otherwise(
                F.regexp_replace("props", r"^(\s*)\{", "$1{%s: %d" % (key, i))
            ),
        )

    if wanted("events"):
        # events use INTERLEAVED-MULTIPLY replication (id → id·R + i)
        # instead of the block shift: ids stay collision-free at any
        # nesting level (a bijection ℕ×[0,R) → ℕ) AND the id space
        # stays DENSE — the block shift left 10 sparse islands with the
        # whole central band empty, so q_zorder_scan's central 10%
        # min/max band selected 0 rows at sf1 and the marquee layout
        # lane's scale witness was a vacuous 0=0 agreement (round-9
        # verdict). Group sizes and per-key profiles are preserved
        # exactly (each replica's user u maps to a unique new id);
        # events have no cross-table foreign keys, so the relational
        # pack keeps the shift scheme its join consistency needs.
        def interleave(df, i):
            d = df
            for k in ("event_id", "user_id"):
                d = d.withColumn(k, F.col(k) * reps + F.lit(i))
            return mutate_events(d, i)

        ev_parts = [interleave(rd("events"), i) for i in range(reps)]
        ev = ev_parts[0]
        for p in ev_parts[1:]:
            ev = ev.unionByName(p)
        wr(ev, "events")

    def mutate_docs(d, i):
        if i == 0:
            return d
        # disjoint vocabulary per replica: suffix every token. The
        # suffix embeds SHIFT so it is unique PER NESTING LEVEL, same
        # rule as the id shift: a bare "_<i>" collides when the source
        # is itself a decade output — level-1 replica i (unchanged
        # inside level-2 replica 0) and level-2 replica i of level-1
        # replica 0 both read "tok_<i>", planting R·n_docs cross-replica
        # EXACT dups that break every "ground truth scales by R" claim
        # (found by the round-9 minhash decade: 45,072 phantom J=1.0
        # cross-replica pairs at sf10).
        return d.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", r"$1_%d.%d" % (i, SHIFT))
        ).withColumn("n_chars", F.length("text"))

    if wanted("documents"):
        wr(replicate(rd("documents"), ["doc_id"], mutate_docs), "documents")

    if not wanted("embeddings"):
        print(f"# decade fixture written to {dst} (R={reps}, tables={sorted(only)})")
        return

    emb = rd("embeddings")
    n_emb = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    # sorted: distinct().collect() order is partitioning-dependent, and
    # label assignment below must be reproducible across regenerations
    labels = sorted(r["label"] for r in emb.select("label").distinct().collect())
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for vid in ids:
                rng = np.random.default_rng(vid)  # per-id seed: reproducible
                rows.append(
                    (
                        int(vid),
                        rng.normal(size=dim).astype(np.float32).tolist(),
                        int(labels[int(vid) % len(labels)]),
                    )
                )
            yield pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])

    fresh = (
        spark.range(n_emb * (R_EMB - 1))
        .withColumn("id", F.col("id") + F.lit(SHIFT))
        .mapInPandas(gen, schema=out_schema)
    )
    wr(emb.unionByName(fresh), "embeddings", 8)
    print(f"# decade fixture written to {dst} (R={reps}, emb {R_EMB}x)")


if __name__ == "__main__":
    main()

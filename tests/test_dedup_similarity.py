"""Dedup + similarity operator tests: planted duplicates, LSH recall
against exact baselines, fingerprint sensitivity, multimodal plumbing
goldens."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pulsar_elasticsearch_sync_rs_spark.functions.text import rolling_fingerprint
from pulsar_elasticsearch_sync_rs_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_verified,
    dedup_normalized,
    dedup_simhash,
    minhash_candidates,
    ngram_jaccard_pairs,
)
from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
    attach_media_metadata,
    fake_feature_extract,
    frame_sample_plan,
)
from pulsar_elasticsearch_sync_rs_spark.operators.similarity import (
    knn_cosine_bruteforce,
    knn_cosine_lsh,
)
from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tomorrow"
OTHER = "completely different content about spark query engines and shuffles here"


def _docs(spark):
    rows = [
        Row(doc_id=0, text=BASE),
        Row(doc_id=1, text=BASE),  # exact dup of 0
        Row(doc_id=2, text=NEAR),  # near dup of 0
        Row(doc_id=3, text=OTHER),
        Row(doc_id=4, text=BASE.upper() + "!!"),  # normalized dup of 0
    ]
    return spark.createDataFrame(rows)


def test_dedup_exact_planted(spark):
    out = dedup_exact(_docs(spark))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 2, 3, 4]  # doc 1 removed, survivor is min id


def test_dedup_normalized_planted(spark):
    out = dedup_normalized(_docs(spark))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 2, 3]  # doc 4 also collapses after normalization


def test_minhash_finds_near_dup(spark):
    cand = minhash_candidates(_docs(spark), num_hashes=32, bands=16, shingle_k=3)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (0, 1) in pairs  # exact dup always collides
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup found w.h.p.
    verified = dedup_minhash_verified(
        _docs(spark), threshold=0.5, num_hashes=32, bands=16
    )
    vp = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert vp[(0, 1)] == 1.0
    assert (0, 3) not in vp  # unrelated text filtered by exact verify


def test_minhash_recall_on_fixture(spark, sf_dir):
    """LSH candidates must recover most exact-Jaccard pairs ≥0.5 on the
    documents fixture (recall pinned ≥0.8 at 32 hashes / 8 bands)."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "blk", F.concat_ws("|", "lang", "source")
    )
    # blocked exact pairs (unblocked all-pairs is a nested-loop join —
    # the quadratic shape the LSH path exists to avoid)
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5, block_col="blk").collect()
    }
    if not exact:
        pytest.skip("no pairs >= 0.5 in fixture at this SF")
    cand = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidates(docs, num_hashes=32, bands=8).collect()
    }
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} over {len(exact)} true pairs"


def test_ngram_jaccard_size_banding(spark, sf_dir):
    """The size-band key turns the all-pairs scan into an equi-join
    (no BroadcastNestedLoopJoin in the plan), and the pruning is
    lossless: a pair of very different sizes that would violate the
    t ≤ |A|/|B| ≤ 1/t bound can never reach threshold anyway."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.35)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # losslessness on a constructed corpus: one duplicate pair (J=1),
    # one ~0.5 pair, one long doc that shares a prefix with a short doc
    # (high containment, low Jaccard — must NOT appear at t=0.5)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        Row(doc_id=0, text=base),
        Row(doc_id=1, text=base),
        Row(doc_id=2, text=base + " iota kappa"),
        Row(doc_id=3, text=base + " " + " ".join(f"w{i}" for i in range(200))),
    ]
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            spark.createDataFrame(rows), threshold=0.5
        ).collect()
    }
    assert got[(0, 1)] == 1.0
    assert (0, 2) in got  # adjacent size band, J ≈ 0.75
    assert (0, 3) not in got and (1, 3) not in got  # size filter + true J both exclude


def test_ppjoin_prefix_prunes_candidates(spark, sf_dir):
    """The prefix filter's reason to exist: the candidate pair count
    must sit FAR below what the size-ratio (band) filter alone would
    enumerate. Computed on the documents fixture at threshold 0.35."""
    from pulsar_elasticsearch_sync_rs_spark.functions.text import word_shingles
    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import ppjoin_candidates

    t = 0.35
    docs = read_table(spark, sf_dir, "documents")
    sizes = [
        r["n"]
        for r in docs.select(F.size(word_shingles("text", 3)).alias("n")).collect()
        if r["n"] > 0
    ]
    ratio_pairs = sum(
        1
        for i, na in enumerate(sizes)
        for nb in sizes[i + 1 :]
        if na >= t * nb and nb >= t * na
    )
    cand = ppjoin_candidates(docs, threshold=t).count()
    true_pairs = ngram_jaccard_pairs(docs, threshold=t).count()
    # candidates must cover every true pair (losslessness) yet stay an
    # order of magnitude below the size-filter-only enumeration
    assert cand >= true_pairs
    assert cand < 0.1 * ratio_pairs, (cand, ratio_pairs)


def test_minhash_verified_subset_and_recall(spark, sf_dir):
    """The end-to-end verified pipeline (q_dedup_minhash_verified):
    output must be a SUBSET of the exact all-pairs result with
    identical jaccard values, and recall ≥0.8 on the fixture."""
    docs = read_table(spark, sf_dir, "documents")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.35).collect()
    }
    assert exact, "fixture has no pairs >= 0.35"
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup_minhash_verified(
            docs, threshold=0.35, num_hashes=32, bands=8
        ).collect()
    }
    assert set(verified) <= set(exact), "verified emitted a non-true pair"
    for pair, jac in verified.items():
        assert jac == exact[pair]
    recall = len(verified) / len(exact)
    assert recall >= 0.8, f"verified recall {recall:.2f} over {len(exact)} pairs"


def test_minhash_lanes_agree_on_degenerate_docs(spark):
    """Expression lane (minhash_signature) and the Arrow UDF lane must
    emit the SAME signature for empty / too-short docs (the
    [MERSENNE]*K sentinel) so band hashes are interchangeable."""
    from pulsar_elasticsearch_sync_rs_spark.functions.text import word_shingles
    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import (
        make_minhash_udf,
        minhash_signature,
    )

    rows = [Row(doc_id=0, text=""), Row(doc_id=1, text="one two"), Row(doc_id=2, text=BASE)]
    df = spark.createDataFrame(rows)
    hashes = F.transform(word_shingles("text", 3), lambda s: F.crc32(s.cast("binary")))
    expr = df.select("doc_id", minhash_signature(hashes, 8).alias("sig"))
    udf = df.select("doc_id", make_minhash_udf(8, 3)("text").alias("sig"))
    e = {r["doc_id"]: r["sig"] for r in expr.collect()}
    u = {r["doc_id"]: r["sig"] for r in udf.collect()}
    assert e == u


def test_simhash_dedup(spark):
    out = dedup_simhash(_docs(spark))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert 0 in ids and 1 not in ids  # identical token stream → same simhash


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [Row(t="a b c"), Row(t="c b a"), Row(t="a b c"), Row(t="")]
    )
    fps = [r["fp"] for r in df.select(rolling_fingerprint("t").alias("fp")).collect()]
    assert fps[0] == fps[2]  # deterministic
    assert fps[0] != fps[1]  # order-sensitive (rolling, not bag-of-words)
    assert fps[3] == 0  # empty → 0


def test_knn_lsh_recall_planted(spark):
    """Sign-LSH is a *near-duplicate* pruner: its collision probability
    (1-θ/π)^bits only survives for genuinely close vectors. Planted
    setup: 40 base vectors + a tiny perturbation of each; the LSH
    top-1 of each perturbed query must be its base twin for most
    queries. (On uniformly random embeddings — max cosine ≈0.45 in the
    fixture — LSH recall is structurally near zero; that is expected
    behavior, not a bug, and the brute-force lane is the right tool.)"""
    import numpy as np

    rng = np.random.default_rng(42)
    dim = 64
    base = rng.normal(size=(40, dim))
    rows = []
    for i, v in enumerate(base):
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
        pert = v + rng.normal(scale=0.05, size=dim)
        rows.append(Row(vec_id=1000 + i, embedding=[float(x) for x in pert]))
    corpus = spark.createDataFrame(rows)
    queries = corpus.filter(F.col("vec_id") >= 1000).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_cosine_lsh(corpus, queries, k=1, dim=dim)
    top1 = out.filter(F.col("rank") == 1).collect()
    hits = sum(1 for r in top1 if r["neighbor_id"] == r["query_id"] - 1000)
    assert hits >= 28, f"LSH top-1 found base twin for only {hits}/40 queries"
    # single-pass bucketing: exactly ONE bucket-UDF Arrow eval per join
    # side (not one per LSH table, and no duplicate from an inferred
    # isnotnull filter re-evaluating the UDF)
    import re

    final = out._jdf.queryExecution().executedPlan().toString()
    bucket_evals = {
        m
        for m in re.findall(
            r"ArrowEvalPython \[buckets_udf[^\]]*\], \[pythonUDF\d+#(\d+)\]", final
        )
    }
    assert len(bucket_evals) <= 2, final  # one per side


def _exact_pairs_at(spark, sf_dir, threshold):
    from pulsar_elasticsearch_sync_rs_spark.operators.similarity import cosine

    emb = read_table(spark, sf_dir, "embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    return {
        (r["id_a"], r["id_b"])
        for r in (
            a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                cosine(F.col("a.embedding"), F.col("b.embedding")).alias("sim"),
            )
            .filter(F.col("sim") >= threshold)
            .collect()
        )
    }


def test_embed_neardup_ivf_recall(spark, sf_dir):
    """IVF cell-blocked near-dup join (the moderate-threshold
    production path): recall ≥0.85 vs exact global pairs at 0.3, and
    every emitted pair must be a true pair (verify stage is exact)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.ivf import embedding_near_dup_ivf

    exact = _exact_pairs_at(spark, sf_dir, 0.3)
    assert exact
    emb = read_table(spark, sf_dir, "embeddings")
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_ivf(emb, threshold=0.3, nlist=16, nprobe=6).collect()
    }
    assert got <= exact, "IVF emitted a pair below threshold"
    recall = len(got) / len(exact)
    assert recall >= 0.85, f"IVF near-dup recall {recall:.2f} over {len(exact)} pairs"


def test_embed_neardup_lsh_planted(spark):
    """Sign-LSH near-dup in its true regime: planted near-identical
    twins (cosine ≈0.999) must be recovered by the multi-table bucket
    join with recall ≥0.9."""
    import numpy as np

    from pulsar_elasticsearch_sync_rs_spark.operators.similarity import embedding_near_dup

    rng = np.random.default_rng(7)
    dim = 64
    base = rng.normal(size=(50, dim))
    rows = []
    for i, v in enumerate(base):
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
        pert = v + rng.normal(scale=0.02, size=dim)
        rows.append(Row(vec_id=1000 + i, embedding=[float(x) for x in pert]))
    df = spark.createDataFrame(rows)
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup(
            df, threshold=0.95, n_planes=12, dim=dim, n_tables=4
        ).collect()
    }
    hits = sum(1 for i in range(50) if (i, 1000 + i) in got)
    assert hits >= 45, f"LSH recovered only {hits}/50 planted twins"


def test_media_metadata_and_features(spark):
    df = spark.createDataFrame([Row(media_id=0, payload=b"abcd"), Row(media_id=1, payload=b"")])
    meta = attach_media_metadata(df).collect()
    by_id = {r["media_id"]: r for r in meta}
    assert by_id[0]["byte_len"] == 4
    assert by_id[0]["sha"] == (
        "88d4266fd4e6338d13b845fcf289579d209c897823b9217da3e161936f031589"
    )  # sha256("abcd")
    feats = fake_feature_extract(df, dim=4).collect()
    f0 = {r["media_id"]: r for r in feats}
    # bytes a,b,c,d → stripes [97,98,99,100] normalized
    total = 97 + 98 + 99 + 100
    assert f0[0]["byte_len"] == 4
    assert abs(f0[0]["feature"][0] - 97 / total) < 1e-6
    assert f0[1]["feature"] == [0.0, 0.0, 0.0, 0.0]


def test_wav_codec_roundtrip(spark):
    """Real codec: synth → parse round-trip, chunk-walker robustness
    (extra chunk before fmt), malformed rejection, and the Spark
    mapInPandas decode lane."""
    import struct

    import pytest as _pytest

    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        decode_wav_features,
        parse_wav,
        synth_wav,
    )

    blob = synth_wav(n_samples=320, amp=1000, sample_rate=16000)
    meta = parse_wav(blob)
    assert meta == {
        "n_channels": 1,
        "sample_rate": 16000,
        "n_samples": 320,
        "duration_ms": 20,
        "peak_amp": 1000,
        "mean_abs": 1000.0,
    }

    # chunk walker: a LIST chunk of odd size (word-aligned skip) before fmt
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    reordered = blob[:12] + extra + blob[12:]
    assert parse_wav(reordered)["n_samples"] == 320

    with _pytest.raises(ValueError):
        parse_wav(b"RIFFxxxxJUNK")
    with _pytest.raises(ValueError):
        parse_wav(b"")

    df = spark.createDataFrame([Row(media_id=7, payload=bytearray(blob))])
    row = decode_wav_features(df).collect()[0]
    assert row["duration_ms"] == 20 and row["peak_amp"] == 1000
    assert row["byte_len"] == len(blob)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([Row(media_id=0, duration_ms=3500)])
    frames = frame_sample_plan(df, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]
    assert all(r["frame_payload"] is None for r in frames)  # stubbed decode


def test_ivf_bucketed_join_is_shuffle_free(spark, sf_dir, tmpdir):
    """Co-location demo: after persist_ivf_index writes the
    cell-assigned corpus bucketBy(cell_id), the candidate self-join on
    cell_id plans WITHOUT any Exchange — the bucket layout satisfies the
    join's distribution requirement."""
    import os

    from pulsar_elasticsearch_sync_rs_spark.operators.ivf import (
        ivf_candidates_bucketed,
        persist_ivf_index,
    )
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    table = "ivf_bucketed_test"
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        persist_ivf_index(
            emb, table, os.path.join(tmpdir, "ivf_tbl"), nlist=8, n_buckets=8
        )
        # forbid broadcast so the shuffle-free claim is about bucketing,
        # not about the small fixture fitting in a broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cand = ivf_candidates_bucketed(spark, table)
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"probe join shuffled:\n{plan}"
        assert "SortMergeJoin" in plan
        # and it actually runs: every pair shares a cell, ids ordered
        rows = cand.limit(50).collect()
        assert rows and all(r["id_a"] < r["id_b"] for r in rows)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_knn_ivf_recall(spark, sf_dir):
    """IVF probe search recovers most of the exact top-5 on the fixture:
    with nprobe/nlist = 1/4 of the cells probed, recall is bounded by
    how often true neighbors share a probed cell — ≥0.5 expected on
    64-dim random data, and planted twins must hit ~always."""
    from pulsar_elasticsearch_sync_rs_spark.operators.ivf import knn_cosine_ivf

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_ivf(emb, queries, k=5, nlist=8, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f}"


def test_knn_pq_recall(spark, sf_dir):
    """PQ ADC search + exact re-rank recovers the exact top-5 almost
    always at m=16 × ksub=64 (measured 0.96–1.0 across all fixture
    SFs); pin ≥0.85. Also pins the codes-table shape: m int codes per
    vector, all within [0, ksub)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        encode_pq,
        knn_cosine_pq,
        train_pq_codebooks,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_pq(emb, queries, k=5, m=16, ksub=64, refine=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"PQ recall {recall:.2f}"

    books = train_pq_codebooks(emb, m=16, ksub=64)
    assert books.shape == (16, 64, 4)
    codes = encode_pq(emb, books).collect()
    assert all(len(r["codes"]) == 16 for r in codes)
    assert all(0 <= c < 64 for r in codes for c in r["codes"])


def test_sampling_operators(spark, sf_dir):
    """md5-gate sampling: rates land near their fractions, the gate is
    consistent (same ids kept on re-run — no RNG), sampleBy lane
    respects strata, and weighted_mix tags provenance."""
    from pulsar_elasticsearch_sync_rs_spark.operators.sampling import (
        deterministic_stratified_sample,
        stratified_sample,
        weighted_mix,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    fr = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    kept = deterministic_stratified_sample(docs, "source", "doc_id", fr)
    by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["src0"] == totals["src0"]  # p=1 keeps all
    assert "src2" not in by_src  # p=0 drops all
    assert set(by_src) == {"src0", "src1"}  # default 0 drops the rest
    assert 0.2 <= by_src["src1"] / totals["src1"] <= 0.8  # ~0.5 at n=25
    # deterministic: identical id set on re-run
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in deterministic_stratified_sample(docs, "source", "doc_id", fr).collect()
    )
    assert ids1 == ids2

    sb = stratified_sample(docs, "source", {"src0": 1.0}, seed=7)
    assert {r["source"] for r in sb.collect()} == {"src0"}

    a = docs.filter(F.col("source") == "src0")
    b = docs.filter(F.col("source") == "src1")
    mixed = weighted_mix([(a, 1.0), (b, 0.5)], id_col="doc_id")
    tags = {
        r["mix_source"]: r["n"]
        for r in mixed.groupBy("mix_source").agg(F.count("*").alias("n")).collect()
    }
    assert tags["src0"] == totals["src0"]
    assert 0 < tags["src1"] < totals["src1"]


def test_bmp_codec_roundtrip(spark):
    """Real image codec: synth → parse round-trip, malformed rejection,
    and the Spark mapInPandas decode lane."""
    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        decode_bmp_features,
        parse_bmp,
        synth_bmp,
    )

    blob = synth_bmp(5, 3, (10, 20, 30))  # stride pads 15 -> 16 bytes
    meta = parse_bmp(blob)
    assert meta == {
        "width": 5, "height": 3, "bpp": 24, "n_pixels": 15,
        "mean_b": 10.0, "mean_g": 20.0, "mean_r": 30.0,
    }
    assert len(blob) == 54 + 16 * 3

    with pytest.raises(ValueError):
        parse_bmp(b"PNGnope" + b"\x00" * 60)
    with pytest.raises(ValueError):
        parse_bmp(b"BM")  # truncated

    df = spark.createDataFrame([Row(media_id=3, payload=bytearray(blob))])
    row = decode_bmp_features(df).collect()[0]
    assert (row["width"], row["height"], row["mean_r"]) == (5, 3, 30.0)
    assert row["byte_len"] == len(blob)


def test_avi_codec_roundtrip(spark):
    """Real video codec: synth → parse round-trip with frame sampling,
    malformed rejection, and the Spark mapInPandas decode lane."""
    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        decode_avi_frames,
        parse_avi_frames,
        synth_avi,
    )

    colors = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    blob = synth_avi(5, 3, colors)  # width 5 → padded stride
    meta = parse_avi_frames(blob)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (5, 3, 4)
    assert meta["duration_ms"] == 400  # 4 frames at 10 fps
    assert [f["frame_idx"] for f in meta["frames"]] == [0, 1, 2, 3]
    assert [(f["mean_b"], f["mean_g"], f["mean_r"]) for f in meta["frames"]] == [
        (10.0, 20.0, 30.0), (40.0, 50.0, 60.0), (70.0, 80.0, 90.0), (100.0, 110.0, 120.0)
    ]
    sampled = parse_avi_frames(blob, sample_every=3)
    assert [f["frame_idx"] for f in sampled["frames"]] == [0, 3]

    with pytest.raises(ValueError):
        parse_avi_frames(b"RIFFxxxxWAVE")  # not AVI
    with pytest.raises(ValueError):
        parse_avi_frames(b"MKVnope" + b"\x00" * 60)
    # truncated frame body must error loudly, not yield silently-short
    # channel means (chunk-size-vs-blob-length validation)
    with pytest.raises(ValueError, match="truncated"):
        parse_avi_frames(blob[:-7])

    df = spark.createDataFrame([Row(media_id=7, payload=bytearray(blob))])
    rows = decode_avi_frames(df, sample_every=2).collect()
    assert [(r["media_id"], r["frame_idx"], r["mean_g"]) for r in rows] == [
        (7, 0, 20.0), (7, 2, 80.0)
    ]
    assert all((r["width"], r["height"], r["n_frames"]) == (5, 3, 4) for r in rows)


def test_simhash_neardup_matches_bruteforce(spark, sf_dir):
    """The Manku block-combination candidate join + bit_count verify
    must return EXACTLY the brute-force all-pairs hamming ≤ k set
    (recall is 100% by pigeonhole; precision exact by verify). Checked
    on fixture documents plus planted bit-flip-level near-dups."""
    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import (
        simhash64,
        simhash_neardup_pairs,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        [
            Row(doc_id=900001, text=BASE),
            Row(doc_id=900002, text=BASE),           # hamming 0
            Row(doc_id=900003, text=BASE + " zq"),   # few-bit flip
            Row(doc_id=900004, text=OTHER),
        ]
    )
    docs = docs.union(planted)
    k = 3

    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_neardup_pairs(docs, k=k).collect()
    }

    sigs = docs.select("doc_id", simhash64("text").alias("sig")).filter(
        F.col("sig") != 0  # operator excludes token-less sentinel docs
    )
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    brute = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.expr("bit_count(sig_a ^ sig_b)").cast("int"))
        .filter(F.col("hamming") <= k)
        .collect()
    }
    assert (900001, 900002, 0) in brute  # planted exact pair present
    assert got == brute


def test_simhash_dedup_hamming_k(spark):
    """k>0 survivor rule: docs with a smaller-id neighbor within
    hamming <= k are suppressed; singletons survive."""
    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import dedup_simhash

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=BASE),
            Row(doc_id=1, text=BASE),   # hamming 0 from doc 0 → dropped
            Row(doc_id=2, text=OTHER),  # far → survives
        ]
    )
    ids = sorted(r["doc_id"] for r in dedup_simhash(docs, k=3).collect())
    assert 0 in ids and 2 in ids and 1 not in ids


def test_connected_components_empty_and_singleton(spark):
    """Degenerate graphs: no edges at all, and self-loop-only input
    (filtered out) — both yield empty component output, and
    dedup_clusters then labels every doc as its own cluster."""
    from pulsar_elasticsearch_sync_rs_spark.operators.components import (
        connected_components,
        dedup_clusters,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).count() == 0
    loops = spark.createDataFrame([(7, 7)], "id_a long, id_b long")
    assert connected_components(loops).count() == 0

    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    got = {r["doc_id"]: r["cluster"] for r in dedup_clusters(docs, empty).collect()}
    assert got == {1: 1, 2: 2}


def test_ivf_empty_corpus_raises_clear_error(spark):
    """An empty/filtered-empty corpus must raise a clear ValueError from
    quantizer training, not a numpy axis traceback."""
    from pulsar_elasticsearch_sync_rs_spark.operators.ivf import train_coarse_quantizer

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        train_coarse_quantizer(empty, id_col="vec_id")


def test_minhash_mega_bucket_is_bounded(spark):
    """Planted boilerplate mega-cluster: 10k near-identical docs share
    every band hash. Uncapped, that is one 10k-id collect_list row and
    ~5·10^7 exploded pairs per band; with the max_bucket guard it must
    degrade to O(k) star pairs (hub = min id) while keeping the cluster
    fully connected, and small buckets must keep exact pair expansion."""
    n = 10_000
    boiler = "terms of service privacy policy all rights reserved contact us about"
    rows = [Row(doc_id=i, text=boiler) for i in range(n)]
    # a small genuine near-dup pair, far from the cap
    rows += [Row(doc_id=n, text=BASE), Row(doc_id=n + 1, text=NEAR)]
    df = spark.createDataFrame(rows)
    pairs = minhash_candidates(df, num_hashes=32, bands=8, max_bucket=100)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    star = {(0, i) for i in range(1, n)}
    assert star <= got  # hub connects every mega-cluster member
    mega_side = {p for p in got if p[0] < n and p[1] < n}
    assert mega_side == star  # O(k) star pairs, no k^2 spoke-to-spoke blowup
    assert (n, n + 1) in got  # small-bucket exact expansion untouched
    # connectivity survives for transitive cluster dedup downstream
    ids_seen = {i for p in mega_side for i in p}
    assert ids_seen == set(range(n))
    # the two-regime union must not re-run the signature UDF pass per
    # branch. ReuseExchange used to carry this on in-memory inputs but
    # never fired on the parquet lane (Python-UDF exchanges don't
    # canonicalize equal there — caught by the round-7 bench plan pin);
    # candidates_from_bands now materializes the sized band table once
    # (localCheckpoint), so BOTH branches scan the same RDD and the
    # signature UDF appears in NEITHER branch of the executed plan.
    final = pairs._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in final, final
    assert final.count("Scan ExistingRDD") >= 2, final


def test_minhash_cap_not_hit_is_identical(spark):
    """With the cap above every bucket size the output must be exactly
    the uncapped in-row expansion (regression pin for the two-regime
    split)."""
    docs = _docs(spark)
    lo = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidates(docs, num_hashes=32, bands=16, max_bucket=2).collect()
    }
    hi = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidates(
            docs, num_hashes=32, bands=16, max_bucket=1 << 20
        ).collect()
    }
    # the planted corpus has a 3-doc bucket (0,1 exact + 2 near): with
    # max_bucket=2 it stars through hub 0; with a huge cap it pair-expands.
    # Both must connect the same ids; the uncapped one is a superset.
    assert lo <= hi or lo == hi
    assert {i for p in lo for i in p} == {i for p in hi for i in p}


def test_stratified_sample_guards_high_cardinality(spark):
    """Pointing sampleBy-backed stratified sampling at a high-cardinality
    column (e.g. the doc id) must raise a clear error instead of
    collecting unbounded strata onto the driver."""
    import pulsar_elasticsearch_sync_rs_spark.operators.sampling as sampling
    from pulsar_elasticsearch_sync_rs_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.range(200).select(F.col("id").alias("doc_id"))
    orig = sampling.MAX_STRATA
    sampling.MAX_STRATA = 100  # keep the test cheap
    try:
        with pytest.raises(ValueError, match="distinct strata"):
            stratified_sample(df, "doc_id", {"1": 1.0})
    finally:
        sampling.MAX_STRATA = orig


def test_incremental_dedup_bucketed_history_never_shuffles(spark, sf_dir, tmpdir):
    """The persisted sha index's bucket layout must satisfy the
    anti-join distribution: exactly ONE Exchange in the plan (the
    increment's pinned repartition, reused for both the groupBy and
    the join) and none on the index scan subtree — the claim
    q_dedup_incremental's docstring makes about the at-scale shape,
    machine-checked. Uses the DEFAULT n_buckets=16 while the test
    session runs fewer shuffle partitions — the exact mismatch that
    silently re-shuffled the history before the explicit repartition
    pinned the increment to the bucket count."""
    import os

    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import (
        dedup_incremental_bucketed,
        persist_sha_index,
    )

    docs = read_table(spark, sf_dir, "documents")
    table = "sha_index_test"
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        persist_sha_index(
            docs.filter(F.col("doc_id") % 2 == 0), table,
            os.path.join(tmpdir, "sha_tbl"),
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch = docs.filter(F.col("doc_id") % 2 == 1)
        out = dedup_incremental_bucketed(spark, table, batch)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, f"history side shuffled:\n{plan}"
        assert "SortMergeJoin" in plan
        rows = out.collect()
        assert rows
        # semantics: no admitted sha exists in the even-id history
        hist = {r["sha"] for r in spark.table(table).collect()}
        assert all(r["sha"] not in hist for r in rows)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_png_codec_round_trip_and_robustness():
    """Real compressed-image codec: synth → parse round-trip (rotating
    None/Sub/Up row filters), Average/Paeth reconstruction on a
    hand-filtered stream, and strict rejection of truncation and CRC
    corruption."""
    import struct
    import zlib

    import pytest as _pytest

    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        _png_chunk,
        parse_png,
        synth_png,
    )

    blob = synth_png(5, 4, (10, 200, 30))  # 4 rows → filters 0,1,2,0
    got = parse_png(blob)
    assert got == {
        "width": 5, "height": 4, "n_pixels": 20,
        "mean_r": 10.0, "mean_g": 200.0, "mean_b": 30.0,
    }

    # Average (3) and Paeth (4) reconstruction: take known raw rows,
    # apply the spec's forward filter, and require exact recovery
    raw_rows = [bytes([(7 * i) % 256 for i in range(6)]),
                bytes([(13 * i + 5) % 256 for i in range(6)])]

    def forward_filter(ftype, row, prev):
        out = bytearray()
        for i in range(len(row)):
            a = row[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((row[i] - pred) & 0xFF)
        return bytes(out)

    stream = b"\x03" + forward_filter(3, raw_rows[0], bytes(6))
    stream += b"\x04" + forward_filter(4, raw_rows[1], raw_rows[0])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    crafted = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(stream))
        + _png_chunk(b"IEND", b"")
    )
    dec = parse_png(crafted)
    flat = b"".join(raw_rows)
    assert dec["mean_r"] == sum(flat[0::3]) / 4
    assert dec["mean_g"] == sum(flat[1::3]) / 4
    assert dec["mean_b"] == sum(flat[2::3]) / 4

    with _pytest.raises(ValueError, match="truncated"):
        parse_png(blob[:-6])
    corrupted = bytearray(blob)
    corrupted[20] ^= 0xFF  # inside IHDR body → CRC must catch it
    with _pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(corrupted))
    with _pytest.raises(ValueError, match="not a PNG"):
        parse_png(b"BM" + blob)


def test_compress_ratio_orders_text_classes(spark, tmp_path):
    """The compression-ratio signal must order repetitive < natural <
    random within comparable lengths — asserted on q_compress_ratio's
    ACTUAL Spark output (a planted 3-doc corpus written as the
    documents table), not a reimplementation."""
    import random
    import string

    from pulsar_elasticsearch_sync_rs_spark.plans.llm_queries import q_compress_ratio

    rng = random.Random(42)
    vocab = ["".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(3, 9))) for _ in range(300)]
    rows = [
        (1, "rep", "the cat sat " * 200),
        # a 300-word vocabulary: diverse enough to stay off the
        # boilerplate cut, structured enough to stay off the noise cut
        (2, "nat", " ".join(rng.choice(vocab) for _ in range(400))),
        (3, "rnd", "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(2400))),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, lang string, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    out = {r["lang"]: r for r in q_compress_ratio(spark, sf_dir).collect()}
    assert set(out) == {"rep", "nat", "rnd"}
    assert out["rep"]["mean_ratio"] < out["nat"]["mean_ratio"] < out["rnd"]["mean_ratio"]
    assert out["rep"]["n_boilerplate_like"] == 1 and out["rep"]["n_noise_like"] == 0
    assert out["rnd"]["n_noise_like"] == 1 and out["rnd"]["n_boilerplate_like"] == 0
    assert out["nat"]["n_boilerplate_like"] == 0 and out["nat"]["n_noise_like"] == 0


def test_bpe_learn_apply_canonical_and_spark_parity(spark, sf_dir):
    """BPE: (1) the canonical Sennrich example learns the expected
    merges and segmentations; (2) the distributed Arrow lane's per-doc
    counts equal a pure-Python reference on real fixture docs."""
    import re

    from pulsar_elasticsearch_sync_rs_spark.functions.bpe import (
        _WS_CLASS,
        apply_bpe,
        bpe_token_count,
        learn_bpe_merges,
        learn_merges_from_corpus,
    )

    # one tokenizer on both sides: the reference must split on the SAME
    # explicit ASCII class the lane uses, not Python's Unicode str.split()
    ws_re = re.compile(_WS_CLASS)
    from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table

    merges = learn_bpe_merges({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 10)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert apply_bpe("lowest", ranks) == ["low", "est</w>"]
    assert apply_bpe("newest", ranks) == ["newest</w>"]
    assert apply_bpe("", ranks) == []

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").filter(F.col("doc_id") < 25)
    corpus_merges = learn_merges_from_corpus(docs, n_merges=32, sample_words=5000)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count(docs, corpus_merges).collect()
    }
    ranks = {p: i for i, p in enumerate(corpus_merges)}
    for r in docs.collect():
        words = [w for w in ws_re.split(r["text"].lower()) if w]
        want = sum(len(apply_bpe(w, ranks)) for w in words)
        assert got[r["doc_id"]] == want, f"doc {r['doc_id']}: {got[r['doc_id']]} != {want}"


def test_pq_persisted_index_no_reencode(spark, sf_dir, tmpdir):
    """persist_pq_index → knn_cosine_pq_persisted: (1) results are
    IDENTICAL to the inline lane (same codebooks — same seed, same
    bounded sample); (2) the persisted search's plan contains NO encode
    UDF stage — the codes parquet is what it scans — while the inline
    lane's plan does; (3) the artifact round-trips (codes + codebooks
    equal what persist returned)."""
    import os

    import numpy as np

    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        knn_cosine_pq,
        knn_cosine_pq_persisted,
        load_pq_index,
        persist_pq_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    path = os.path.join(tmpdir, "pq_index")
    books = persist_pq_index(emb, path, m=16, ksub=64)

    codes, books2 = load_pq_index(spark, path)
    assert np.array_equal(books, books2)
    assert codes.columns == ["vec_id", "codes"]
    assert codes.count() == emb.count()

    inline = knn_cosine_pq(emb, queries, k=5, m=16, ksub=64, refine=8)
    persisted = knn_cosine_pq_persisted(spark, path, emb, queries, k=5, refine=8)

    plan_inline = inline._jdf.queryExecution().executedPlan().toString()
    plan_persisted = persisted._jdf.queryExecution().executedPlan().toString()
    assert "encode(" in plan_inline, "inline lane must encode"
    assert "encode(" not in plan_persisted, (
        "persisted search must scan the codes table, never re-run the encode UDF"
    )

    got_i = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in inline.collect()}
    got_p = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in persisted.collect()}
    assert got_i == got_p and got_i


def test_knn_ivfpq_recall_and_pruning(spark, sf_dir):
    """IVF-PQ composition: (1) recall vs exact brute force ≥0.7 at
    nprobe=4/nlist=8 (the probe radius, not the codes, is the recall
    limiter — same bound family as the plain IVF lane); (2) raising
    nprobe to nlist recovers the PQ-only lane's answer set exactly
    (cell pruning is the ONLY approximation added on top of PQ)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        knn_cosine_ivfpq,
        knn_cosine_pq,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_bruteforce(emb, queries, k=5).collect()
    }
    ivfpq = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_ivfpq(
            emb, queries, k=5, nlist=8, nprobe=4, m=16, ksub=64, refine=8
        ).collect()
    }
    recall = len(exact & ivfpq) / len(exact)
    assert recall >= 0.7, f"IVF-PQ recall {recall:.2f}"

    full_probe = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_ivfpq(
            emb, queries, k=5, nlist=8, nprobe=8, m=16, ksub=64, refine=8
        ).collect()
    }
    pq_only = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_pq(emb, queries, k=5, m=16, ksub=64, refine=8).collect()
    }
    assert full_probe == pq_only, "nprobe=nlist must degenerate to plain PQ"


def test_incremental_minhash_matches_full_rebuild(spark, sf_dir, tmp_path):
    """Incremental near-dup against the persisted band index: (1)
    COMPLETENESS — candidates touching the new batch are exactly what a
    full from-scratch minhash_candidates over history ∪ batch finds
    (same signatures either way, so the split cannot change the
    answer); (2) the history side of the join is the bucketed table
    scan with NO Exchange and NO signature UDF (the increment
    re-signatures only its own documents)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import (
        incremental_minhash_candidates,
        persist_minhash_bands,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    history = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    new_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}

    persist_minhash_bands(
        history, "t_mh_bands", str(tmp_path / "mh_bands"), n_buckets=8
    )
    try:
        old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            inc = incremental_minhash_candidates(
                spark, "t_mh_bands", batch, n_buckets=8
            )
            plan = inc._jdf.queryExecution().executedPlan().toString()
            got_inc = {(r["id_a"], r["id_b"]) for r in inc.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

        full = {
            (r["id_a"], r["id_b"])
            for r in minhash_candidates(docs).collect()
        }
        want = {p for p in full if p[0] in new_ids or p[1] in new_ids}
        assert got_inc == want and want, (
            f"incremental != full-restricted: only_inc={got_inc - want} "
            f"missing={want - got_inc}"
        )
        # plan pins, on the isolated cross join (batch × history): the
        # persisted-table side carries NO Arrow UDF node — exactly one
        # (the batch's own signature) vs two when the history bands are
        # recomputed inline
        assert "t_mh_bands" in plan
        # the incremental lane persists its batch bands (one signature
        # pass feeding both union branches); drop that cache so the
        # hand-built comparison joins below don't get plan-matched into
        # InMemoryTableScans (whose printed child plan would inflate
        # the Arrow-node string counts)
        spark.catalog.clearCache()
        from pulsar_elasticsearch_sync_rs_spark.operators.dedup import minhash_bands

        nb = minhash_bands(batch).repartition(8, "band_hash").alias("n")
        on = lambda o: (F.col("n.band_id") == F.col(f"{o}.band_id")) & (
            F.col("n.band_hash") == F.col(f"{o}.band_hash")
        )
        persisted_join = nb.join(spark.table("t_mh_bands").alias("o"), on("o"))
        inline_join = nb.join(minhash_bands(history).alias("o2").withColumnRenamed(
            "doc_id", "doc_id_o").alias("o2"), on("o2"))
        p_cnt = persisted_join._jdf.queryExecution().executedPlan().toString().count(
            "ArrowEvalPython"
        )
        i_cnt = inline_join._jdf.queryExecution().executedPlan().toString().count(
            "ArrowEvalPython"
        )
        assert p_cnt == 1 and i_cnt == 2, (
            f"persisted history must not re-signature: {p_cnt=} {i_cnt=}"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_mh_bands")


def test_cross_band_mega_bucket_degrades_to_star(spark):
    """The incremental cross join's mega-bucket guard: a history band
    bucket bigger than max_bucket must NOT enumerate batch×history
    pairs (the crawl-boilerplate quadratic blowup); it emits exactly
    one (history hub, batch member) star pair per batch member.
    Below the cap the exact cross pairs are unchanged."""
    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import (
        cross_band_candidates,
        minhash_bands,
    )

    boiler = "same boilerplate text repeated across the whole crawl today"
    other = "a completely different document about engines and physics"
    hist_rows = [Row(doc_id=i, text=boiler) for i in range(100, 150)]  # 50 clones
    hist_rows += [Row(doc_id=i, text=other) for i in range(150, 153)]  # small bucket
    batch_rows = [Row(doc_id=i, text=boiler) for i in range(200, 205)]
    batch_rows += [Row(doc_id=210, text=other)]
    hist = minhash_bands(spark.createDataFrame(hist_rows))
    batch = minhash_bands(spark.createDataFrame(batch_rows))

    capped = {
        (r["id_a"], r["id_b"])
        for r in cross_band_candidates(batch, hist, max_bucket=20).distinct().collect()
    }
    # mega bucket (50 history clones > 20): each batch clone pairs with
    # the hub (min history id = 100) ONLY
    mega_pairs = {p for p in capped if p[1] >= 200 and p[0] < 150 and p[1] < 210}
    assert mega_pairs == {(100, i) for i in range(200, 205)}, mega_pairs
    # small bucket (3 history docs): full cross — every (hist, batch) pair
    assert {(i, 210) for i in range(150, 153)} <= capped
    # uncapped: the boilerplate cluster enumerates all 50×5 cross pairs
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in cross_band_candidates(batch, hist, max_bucket=1024).distinct().collect()
    }
    assert {(h, b) for h in range(100, 150) for b in range(200, 205)} <= uncapped


def test_ivfpq_persisted_partition_pruning(spark, sf_dir, tmpdir):
    """persist_ivfpq_index → knn_cosine_ivfpq_persisted: (1) results
    IDENTICAL to the inline IVF-PQ lane (same seeds → same centers and
    codebooks); (2) the probe filter lands in the scan's
    PartitionFilters (directory-level cell pruning) and the plan has
    NO encode UDF; (3) the codes directory is laid out one dir per
    cell."""
    import os

    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        knn_cosine_ivfpq,
        knn_cosine_ivfpq_persisted,
        persist_ivfpq_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    path = os.path.join(tmpdir, "ivfpq")
    centers, books = persist_ivfpq_index(emb, path, nlist=8, m=16, ksub=64)
    cell_dirs = [e for e in os.listdir(os.path.join(path, "codes")) if e.startswith("cell_id=")]
    assert len(cell_dirs) == 8, cell_dirs

    persisted = knn_cosine_ivfpq_persisted(
        spark, path, emb, queries, k=5, nprobe=4, refine=8
    )
    plan = persisted._jdf.queryExecution().executedPlan().toString()
    assert "encode(" not in plan, "persisted search must not re-encode"
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2 and "cell_id" in pf[1].split("]", 1)[0], (
        f"probe filter must prune cell directories:\n{plan[:2000]}"
    )

    inline = knn_cosine_ivfpq(emb, queries, k=5, nlist=8, nprobe=4, m=16, ksub=64, refine=8)
    got_p = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in persisted.collect()}
    got_i = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in inline.collect()}
    assert got_p == got_i and got_p


def test_semantic_dedup_ivf_planted_twins(spark, sf_dir):
    """IVF-cell-blocked semantic dedup (the SemDeDup scale path): on a
    corpus with PLANTED near-identical vector pairs, (1) every planted
    twin collapses into its partner's cluster (multi-probe catches
    boundary straddlers), (2) survivors are min-id, (3) sizes account
    for every vector exactly once."""
    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import semantic_dedup_ivf

    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    # plant twins: copies of vectors 0..4 with a tiny deterministic
    # perturbation (cosine ≈ 1 to the original)
    base = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x * F.lit(1.0) + F.lit(1e-4)
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(base)

    out = semantic_dedup_ivf(corpus, threshold=0.999, nlist=8, nprobe=2)
    rows = {r["vec_id"]: r["cluster_size"] for r in out.collect()}
    assert sum(rows.values()) == n + 5, "sizes must partition the corpus"
    for i in range(5):
        assert rows.get(i) is not None and rows[i] >= 2, f"twin of {i} not collapsed"
        assert (i + 100000) not in rows, "survivor must be the min id"


def test_substring_dedup_applies_cuts_keep_first(spark):
    """apply_repeated_span_cuts (Lee et al. substring dedup, APPLIED):
    the shared ≥k-token passage survives only in its globally-first
    (doc_id, pos) occurrence; every later copy is excised exactly;
    uncut docs pass through with n_tok_after == n_tok_before; and the
    fixed point holds — re-running span detection on the cleaned
    corpus finds ZERO spans."""
    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import (
        apply_repeated_span_cuts,
        repeated_span_cuts,
    )

    k = 20
    passage = " ".join(f"shared{i}" for i in range(25))  # 25-token dup passage
    a_pre = " ".join(f"apre{i}" for i in range(4))
    a_suf = " ".join(f"asuf{i}" for i in range(3))
    b_pre = " ".join(f"bpre{i}" for i in range(7))
    b_suf = " ".join(f"bsuf{i}" for i in range(2))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{a_pre} {passage} {a_suf}"),
            Row(doc_id=2, text=f"{b_pre} {passage} {b_suf}"),
            Row(doc_id=3, text="tiny unique doc"),  # < k tokens: never grams
        ]
    )
    out = {r["doc_id"]: r for r in apply_repeated_span_cuts(docs, k=k).collect()}
    assert set(out) == {1, 2, 3}
    # doc 1 is the first occurrence: untouched
    assert out[1]["text_clean"] == f"{a_pre} {passage} {a_suf}"
    assert out[1]["n_tok_after"] == out[1]["n_tok_before"] == 4 + 25 + 3
    # doc 2 loses exactly the 25-token passage, seam joins pre+suf
    assert out[2]["text_clean"] == f"{b_pre} {b_suf}"
    assert (out[2]["n_tok_before"], out[2]["n_tok_after"]) == (7 + 25 + 2, 9)
    # doc 3 passes through
    assert out[3]["text_clean"] == "tiny unique doc"
    assert out[3]["n_tok_after"] == out[3]["n_tok_before"] == 3

    # fixed point: the cleaned corpus has no repeated k-gram left
    cleaned = apply_repeated_span_cuts(docs, k=k).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    assert repeated_span_cuts(cleaned, k=k).count() == 0


def test_substring_dedup_fixture_fixed_point(spark, sf_dir):
    """On the real documents fixture: token mass is conserved
    (n_tok_after ≤ n_tok_before, equality iff never cut), every doc_id
    survives, and re-running detection on the cleaned output finds
    zero spans (keep-first leaves each formerly-duplicated gram with
    exactly one occurrence)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.dedup import (
        apply_repeated_span_cuts,
        repeated_span_cuts,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_in = docs.count()
    out = apply_repeated_span_cuts(docs, k=20).cache()
    try:
        assert out.count() == n_in
        assert out.filter(F.col("n_tok_after") > F.col("n_tok_before")).count() == 0
        cleaned = out.select("doc_id", F.col("text_clean").alias("text"))
        assert repeated_span_cuts(cleaned, k=20).count() == 0
    finally:
        out.unpersist()


def test_ivfpq_append_parity_frozen_no_retrain(spark, sf_dir, tmpdir, monkeypatch):
    """append_to_ivfpq_index: (1) NO-RETRAIN pin — every training
    entry point (coarse k-means, codebook training) is monkeypatched
    to raise, and the append still succeeds; (2) centers/codebooks are
    byte-identical after the append (frozen quantizer); (3) search
    over the appended index matches brute-force recall within ε of a
    full retrain+re-encode on the union; (4) an in-distribution batch
    does NOT flag retrain, an out-of-distribution batch DOES (drift
    check)."""
    import os

    import numpy as np

    import pulsar_elasticsearch_sync_rs_spark.operators.ivf as ivfmod
    import pulsar_elasticsearch_sync_rs_spark.operators.pq as pqmod
    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        _load_ndarray,
        append_to_ivfpq_index,
        knn_cosine_ivfpq_persisted,
        persist_ivfpq_index,
    )

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    n_base, n_batch = base.count(), batch.count()
    path = os.path.join(tmpdir, "appended")
    rebuilt = os.path.join(tmpdir, "rebuilt")
    persist_ivfpq_index(base, path, nlist=8)
    persist_ivfpq_index(emb, rebuilt, nlist=8)  # retrain twin (needs real training)
    c0 = _load_ndarray(spark, os.path.join(path, "centers"))
    b0 = _load_ndarray(spark, os.path.join(path, "codebooks"))

    def boom(*a, **k):  # noqa: ANN002
        raise AssertionError("append must not retrain")

    monkeypatch.setattr(pqmod, "train_pq_codebooks", boom)
    monkeypatch.setattr(ivfmod, "train_coarse_quantizer", boom)
    monkeypatch.setattr(ivfmod, "lloyd_kmeans", boom)
    report = append_to_ivfpq_index(spark, batch, path)
    assert report["n_appended"] == n_batch
    assert report["qerr_ratio"] is not None and report["qerr_ratio"] < 1.5
    assert report["needs_retrain"] is False

    # frozen artifacts
    assert np.array_equal(c0, _load_ndarray(spark, os.path.join(path, "centers")))
    assert np.array_equal(b0, _load_ndarray(spark, os.path.join(path, "codebooks")))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    assert codes.count() == n_base + n_batch

    # parity: appended-index search ≡ rebuilt-index search, recall-wise
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_bruteforce(emb, queries, k=5).collect()
    }

    def recall(p):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in knn_cosine_ivfpq_persisted(
                spark, p, emb, queries, k=5, nprobe=4, refine=8
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_app, r_reb = recall(path), recall(rebuilt)
    assert r_app >= r_reb - 0.1, (r_app, r_reb)
    assert r_app >= 0.8, r_app

    # drift: an out-of-distribution batch must schedule the retrain
    ood = emb.filter(F.col("vec_id") % 5 == 1).select(
        (F.col("vec_id") + 900000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(7.5) + F.lit(2.0)).alias(
            "embedding"
        ),
    )
    report2 = append_to_ivfpq_index(spark, ood, path)
    assert report2["qerr_ratio"] > 1.5 or report2["cell_skew"] > 4.0
    assert report2["needs_retrain"] is True


def test_bounded_query_contract_fails_fast_over_bound(spark, sf_dir):
    """The KNN lanes collect/broadcast the query side "bounded by
    contract" - the guard turns a contract breach into a named
    ValueError BEFORE the driver materializes anything unbounded
    (instead of an OOM or opaque broadcast failure at 100 TB), and
    under the bound the lanes are untouched (the recall/parity tests
    all run through the guarded paths with defaults)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        knn_cosine_ivfpq,
        knn_cosine_pq,
    )
    from pulsar_elasticsearch_sync_rs_spark.operators.similarity import (
        knn_cosine_bruteforce,
        knn_cosine_lsh,
    )

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    for fn in (knn_cosine_bruteforce, knn_cosine_lsh):
        with pytest.raises(ValueError, match="max_queries=3"):
            fn(emb, queries, k=2, max_queries=3)
    with pytest.raises(ValueError, match="max_queries=3"):
        knn_cosine_ivfpq(emb, queries, k=2, max_queries=3)
    with pytest.raises(ValueError, match="max_queries=3"):
        knn_cosine_pq(emb, queries, k=2, max_queries=3).count()

    # at the bound (not over): the guard admits exactly max_queries
    out = knn_cosine_bruteforce(emb, queries, k=2, max_queries=5)
    assert out.select("query_id").distinct().count() == 5


def test_ivfpq_maintenance_retrains_on_drift_and_repoints(spark, sf_dir, tmp_path):
    """The drift loop CLOSED (round-8 brief): an in-distribution append
    leaves the flag off and maintain_ivfpq_index is then byte-inert on
    the artifact; an out-of-distribution append fires needs_retrain;
    maintenance retrains on the current corpus into a versioned subdir
    and atomically repoints _CURRENT - after which search results are
    IDENTICAL to a from-scratch rebuild on the same corpus (full
    parity, not just a recall floor), recall on the OOD queries is
    restored, and later appends land inside the new version."""
    import hashlib
    import os
    import posixpath

    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        append_to_ivfpq_index,
        knn_cosine_ivfpq_persisted,
        maintain_ivfpq_index,
        persist_ivfpq_index,
    )
    from pulsar_elasticsearch_sync_rs_spark.operators.similarity import (
        knn_cosine_bruteforce,
    )

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    half = emb.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
    base = emb.filter(F.col("vec_id") <= half)
    indist = emb.filter(F.col("vec_id") > half)
    path = str(tmp_path / "ivfpq")
    persist_ivfpq_index(base, path, nlist=8)

    def snapshot(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
        return out

    # in-distribution append: flag stays off; maintenance is byte-inert
    rep0 = append_to_ivfpq_index(spark, indist, path)
    assert not rep0["needs_retrain"], rep0
    before = snapshot(path)
    out0 = maintain_ivfpq_index(spark, emb, path, rep0, nlist=8)
    assert out0["retrained"] is False
    assert snapshot(path) == before, "no-drift maintenance touched the artifact"

    # OOD batch: same dims, shifted far off the training distribution
    ood = emb.limit(200).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(10.0)).alias("embedding"),
    )
    rep1 = append_to_ivfpq_index(spark, ood, path)
    assert rep1["needs_retrain"] and rep1["qerr_ratio"] > 1.5, rep1

    full = emb.unionByName(ood)
    out1 = maintain_ivfpq_index(spark, full, path, rep1, nlist=8)
    assert out1["retrained"] is True and out1["version"] == "v1"
    assert os.path.exists(os.path.join(path, "v1", "codes"))

    # parity: the repointed artifact answers EXACTLY like a fresh
    # rebuild on the same corpus (deterministic training, same seed)
    queries = ood.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_cosine_ivfpq_persisted(
            spark, path, full, queries, k=5, nprobe=4
        ).collect()
    }
    fresh_path = str(tmp_path / "ivfpq_fresh")
    persist_ivfpq_index(full, fresh_path, nlist=8)
    want = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_cosine_ivfpq_persisted(
            spark, fresh_path, full, queries, k=5, nprobe=4
        ).collect()
    }
    assert got == want and got, "retrained artifact diverges from rebuild"

    # recall restored on the OOD queries vs exact brute force
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_bruteforce(full, queries, k=5).collect()
    }
    approx = {(q, n) for q, _rk, n in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"post-retrain recall {recall:.2f}"

    # subsequent appends resolve into the new version's directory
    more = emb.limit(50).select(
        (F.col("vec_id") + F.lit(20_000_000)).alias("vec_id"), "embedding"
    )
    n_before = spark.read.parquet(posixpath.join(path, "v1", "codes")).count()
    append_to_ivfpq_index(spark, more, path)
    n_after = spark.read.parquet(posixpath.join(path, "v1", "codes")).count()
    assert n_after == n_before + 50

    # janitor: a SECOND retrain accumulates v2 beside v1 + the flat
    # generation; prune(keep=1) must delete the stale generations while
    # the _CURRENT-reachable root - and a reader resolving through it -
    # is untouched (same answers before and after)
    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        prune_ivfpq_versions,
    )

    corpus2 = full.unionByName(more)
    out2 = maintain_ivfpq_index(
        spark, corpus2, path, {**rep1, "needs_retrain": True}, nlist=8
    )
    assert out2["version"] == "v2"
    pre_prune = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_cosine_ivfpq_persisted(
            spark, path, corpus2, queries, k=5, nprobe=4
        ).collect()
    }
    # keep=1 retains exactly ONE complete predecessor for in-flight
    # readers: v1 stays, the older flat generation goes
    rep1k = prune_ivfpq_versions(path, keep=1)
    assert rep1k["current"] == "v2" and "v1" in rep1k["kept"]
    assert "codes" in rep1k["deleted"] and "v1" not in rep1k["deleted"]
    assert os.path.isdir(os.path.join(path, "v1", "codes"))
    assert not os.path.exists(os.path.join(path, "codes"))
    # a version NEWER than current is an in-flight retrain - never
    # deleted, at any keep; keep=0 then drops the last predecessor
    os.makedirs(os.path.join(path, "v3"))
    rep0k = prune_ivfpq_versions(path, keep=0)
    assert "v3" in rep0k["kept"] and "v3" not in rep0k["deleted"]
    assert "v2" in rep0k["kept"] and "v1" in rep0k["deleted"]
    assert os.path.isdir(os.path.join(path, "v3"))
    os.rmdir(os.path.join(path, "v3"))
    left = sorted(d for d in os.listdir(path) if not d.startswith("_"))
    assert left == ["v2"], left  # v1 AND the flat codes/centers/... gone
    post_prune = {
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in knn_cosine_ivfpq_persisted(
            spark, path, corpus2, queries, k=5, nprobe=4
        ).collect()
    }
    assert post_prune == pre_prune and post_prune, "prune changed answers"


def test_jpeg_codec_ac_path_and_failure_modes(spark):
    """The fifth codec's NON-solid path and its failure contract: a
    random image's decode must equal an independently computed
    quantize->dequantize->IDCT reference (isolating the Huffman/
    zigzag/serialization layer); the color path round-trips a solid
    RGB through BT.601 exactly; and corruption - truncation, missing
    SOI, progressive SOF, restart intervals, mid-scan markers - raises
    a named error, never silently-wrong statistics."""
    import numpy as np

    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _dct_matrix,
        parse_jpeg,
        synth_jpeg,
        synth_jpeg_color,
    )

    # AC path: decode == reference on a random (non-multiple-of-8) image
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17)).astype(np.float64)
    feats = parse_jpeg(synth_jpeg(0, 0, pixels=img))
    M = _dct_matrix()
    pad = np.pad(img, ((0, 0), (0, 7)), mode="edge")
    qt = np.empty(64)
    for i, r in enumerate([8] + [16] * 63):
        qt[_JPEG_ZIGZAG[i]] = r
    qt = qt.reshape(8, 8)
    rec = np.empty_like(pad)
    for by in range(0, 24, 8):
        for bx in range(0, 24, 8):
            s = pad[by : by + 8, bx : bx + 8] - 128.0
            q = np.rint((M @ s @ M.T) / qt)
            rec[by : by + 8, bx : bx + 8] = M.T @ (q * qt) @ M + 128.0
    ref = np.clip(np.rint(rec[:, :17]), 0, 255)
    assert abs(feats["mean_luma"] - ref.mean()) < 1e-9
    assert (feats["width"], feats["height"]) == (17, 24)

    # color path: 3-component 4:4:4 solid decode matches the BT.601
    # closed form computed with the same rounding
    f = parse_jpeg(synth_jpeg_color(11, 9, (200, 30, 90)))
    assert f["n_components"] == 3
    r, g, b = 200.0, 30.0, 90.0
    y = round(0.299 * r + 0.587 * g + 0.114 * b)
    cb = round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    assert f["mean_r"] == float(np.clip(np.rint(y + 1.402 * (cr - 128)), 0, 255))
    assert f["mean_g"] == float(
        np.clip(np.rint(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255)
    )
    assert f["mean_b"] == float(np.clip(np.rint(y + 1.772 * (cb - 128)), 0, 255))

    good = synth_jpeg(13, 7, 200)
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg(b"XX" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        parse_jpeg(good[:-12])
    with pytest.raises(ValueError, match="not baseline"):
        # rewrite the SOF0 marker byte (FFC0 -> FFC3, lossless —
        # SOF2/progressive is SUPPORTED as of round 10)
        i = good.index(b"\xff\xc0")
        parse_jpeg(good[:i] + b"\xff\xc3" + good[i + 2 :])
    with pytest.raises(ValueError, match="DC scan requires"):
        # SOF0 flipped to SOF2: the baseline scan header (Ss=0, Se=63)
        # is an illegal progressive scan — raise, never decode garbage
        i = good.index(b"\xff\xc0")
        parse_jpeg(good[:i] + b"\xff\xc2" + good[i + 2 :])
    with pytest.raises(ValueError, match="marker"):
        # plant a bare marker inside the entropy-coded scan
        i = good.index(b"\xff\xda") + 10
        parse_jpeg(good[:i] + b"\xff\xc0" + good[i:])
    with pytest.raises(ValueError, match="max_pixels"):
        parse_jpeg(synth_jpeg(64, 64, 5), max_pixels=100)


def test_jpeg_subsampling_restarts_and_marker_walk(spark):
    """The production-shaped decoder paths (round-9 brief): 4:2:0/4:2:2
    chroma subsampling with replication upsample, restart-interval
    resync with DC-predictor resets, legal 0xFF fill bytes and
    standalone markers in the header walk - plus the corruption
    contract of each new path (wrong/missing RST, non-integer
    subsampling ratio, truncated DRI, EOI before SOS)."""
    import struct

    import numpy as np

    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        parse_jpeg,
        synth_jpeg,
        synth_jpeg_color,
        synth_jpeg_ycc,
    )

    # every sampling geometry x restart interval decodes a solid color
    # to its exact closed form (DC-exact planes + replication upsample)
    for rgb in [(200, 30, 90), (0, 0, 0), (255, 255, 255)]:
        for samp, ri in [
            (((2, 2), (1, 1), (1, 1)), 0),   # 4:2:0
            (((2, 2), (1, 1), (1, 1)), 1),   # 4:2:0 + DRI every MCU
            (((2, 1), (1, 1), (1, 1)), 2),   # 4:2:2
            (((4, 1), (1, 1), (1, 1)), 2),   # 4:1:1
            (((2, 2), (2, 1), (1, 2)), 1),   # mixed factors
        ]:
            f = parse_jpeg(
                synth_jpeg_color(37, 21, rgb, sampling=samp, restart_interval=ri)
            )
            r, g, b = (float(c) for c in rgb)
            y = min(255, max(0, round(0.299 * r + 0.587 * g + 0.114 * b)))
            cb = min(255, max(0, round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)))
            cr = min(255, max(0, round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)))
            assert (f["width"], f["height"]) == (37, 21)
            assert f["mean_luma"] == float(y), (rgb, samp, ri)
            assert f["mean_r"] == float(np.clip(np.rint(y + 1.402 * (cr - 128)), 0, 255))
            assert f["mean_b"] == float(np.clip(np.rint(y + 1.772 * (cb - 128)), 0, 255))

    # header walk: fill bytes + standalone TEM between segments are
    # legal (T.81 B.1.1.2) and must not be parsed as segment lengths
    base = synth_jpeg(8, 8, 128)
    patched = base[:2] + b"\xff\xff\xff" + b"\xff\x01" + b"\xff\xff" + base[2:]
    assert parse_jpeg(patched)["mean_luma"] == 128.0

    # Ri=0 DRI is a legal no-op (restarts disabled)
    i = base.index(b"\xff\xda")
    assert parse_jpeg(
        base[:i] + b"\xff\xdd\x00\x04\x00\x00" + base[i:]
    )["mean_luma"] == 128.0

    dri_blob = synth_jpeg_color(
        32, 8, (10, 20, 30), restart_interval=1
    )
    # wrong RST index = silent block shift in a lenient decoder - loud here
    j = dri_blob.find(b"\xff\xd0")
    with pytest.raises(ValueError, match="expected RST0"):
        parse_jpeg(dri_blob[:j] + b"\xff\xd5" + dri_blob[j + 2 :])
    # DRI promised restarts the stream doesn't contain
    with pytest.raises(ValueError, match="restart boundary"):
        parse_jpeg(dri_blob[:j] + dri_blob[j + 2 :])
    # truncated DRI segment
    with pytest.raises(ValueError, match="truncated"):
        k = dri_blob.index(b"\xff\xdd")
        parse_jpeg(dri_blob[:k] + b"\xff\xdd\x00\x03\x00" + dri_blob[k + 6 :])

    # non-integer subsampling ratio (3:2) is unsupported, never guessed
    full = synth_jpeg_color(16, 16, (1, 2, 3))
    k = full.index(b"\xff\xc0")
    (ln,) = struct.unpack(">H", full[k + 2 : k + 4])
    body = bytearray(full[k + 4 : k + 2 + ln])
    for c, s in enumerate([0x33, 0x22, 0x11]):
        body[6 + 3 * c + 1] = s
    with pytest.raises(ValueError, match="non-integer subsampling"):
        parse_jpeg(full[: k + 4] + bytes(body) + full[k + 2 + ln :])

    # EOI with no scan: an explicit error, not a length misparse
    with pytest.raises(ValueError, match="EOI before SOS"):
        parse_jpeg(b"\xff\xd8\xff\xd9")

    # AC path survives subsampled geometry: non-solid luma + solid
    # chroma at 4:2:0, luma mean equals the grayscale codec's on the
    # same pixels (chroma constant => identical Y plane bitstream math)
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
    gray = parse_jpeg(synth_jpeg(0, 0, pixels=img))
    # encode the same luma with flat chroma through the ycc encoder:
    # solid-plane encoder only does solid colors, so compare via the
    # DC-exact regime instead - a solid 4:2:0 equals its 4:4:4 twin
    a = parse_jpeg(synth_jpeg_ycc(19, 13, (77, 40, 210),
                                  sampling=((2, 2), (1, 1), (1, 1))))
    b = parse_jpeg(synth_jpeg_ycc(19, 13, (77, 40, 210)))
    assert a == b, "4:2:0 diverged from 4:4:4 on a solid color"
    assert gray["width"] == 16  # AC-path decode alive in this test too


def test_knn_ivfpq_pca_recall_at_byte_budget(spark):
    """Round-10 brief #3: PCA-composed IVF-PQ (operators/pq.py
    knn_cosine_ivfpq_pca) at EQUAL code bytes (same m × ksub) beats the
    full-dim index when the spectrum decays — the docstring's claim,
    proven on a planted low-rank fixture (6 latent dims + 5% noise in
    64 ambient dims; 99.9% energy in the top 8 axes). nprobe=nlist so
    the comparison isolates CODE quality from probe radius; refine kept
    small so the codes, not the exact re-rank, decide recall.
    (On the near-isotropic synthetic embeddings fixture the composition
    LOSES — measured, recorded in SCALE.md — so the pin lives on the
    spectrum shape the operator is for.)"""
    import numpy as np

    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        knn_cosine_ivfpq,
        knn_cosine_ivfpq_pca,
    )

    rng = np.random.default_rng(11)
    n, d, r_true = 600, 64, 6
    X = rng.normal(size=(n, r_true)) @ rng.normal(size=(r_true, d))
    X += 0.05 * rng.normal(size=(n, d))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    ).repartition(4)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_bruteforce(emb, queries, k=5).collect()
    }
    kw = dict(k=5, nlist=4, nprobe=4, m=8, ksub=64, refine=2)
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_ivfpq(emb, queries, **kw).collect()
    }
    pca = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_cosine_ivfpq_pca(emb, queries, pca_dim=8, **kw).collect()
    }
    r_full = len(exact & full) / len(exact)
    r_pca = len(exact & pca) / len(exact)
    assert r_pca >= r_full, (
        f"PCA-composed recall {r_pca:.3f} < full-dim {r_full:.3f} at equal bytes"
    )
    assert r_pca >= 0.85, f"PCA-composed recall {r_pca:.3f}"

    # byte-budget guard: a pca_dim not divisible by m breaks the
    # equal-m comparison and must fail loudly
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        knn_cosine_ivfpq_pca(emb, queries, pca_dim=12, m=8)


def test_jpeg_progressive_decodes_bit_identical_to_baseline():
    """Round-10 brief #7: progressive (SOF2) decode. The progressive
    encoder ships the SAME quantized coefficients as the baseline
    encoder through the full successive-approximation scan script
    (DC first Al=1 → DC refine → spectral-band AC first → AC refine),
    so the decode must be BIT-IDENTICAL to the baseline stream's — a
    strong oracle over every scan kind: EOB-run batching (all-zero
    band blocks), ZRL (>15-zero runs), newly-significant insertions
    with interleaved correction bits, per-scan restart intervals, and
    the interleaved-DC + per-component-AC color topology over all three
    production samplings."""
    import numpy as np

    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        parse_jpeg,
        synth_jpeg,
        synth_jpeg_prog,
        synth_jpeg_prog_ycc,
        synth_jpeg_ycc,
    )

    # solid grays: DC progression alone (crop/pad geometry varied)
    for w, h, luma in [(5, 3, 0), (16, 16, 255), (7, 9, 128), (13, 10, 77)]:
        assert parse_jpeg(synth_jpeg_prog(w, h, luma)) == parse_jpeg(
            synth_jpeg(w, h, luma)
        )

    # pixel corpora: gradients (dense AC), noise (every magnitude),
    # sparse dots (ZRL + EOB runs), diagonal ramps
    rng = np.random.default_rng(3)
    cases = []
    for trial in range(8):
        h, w = int(rng.integers(4, 40)), int(rng.integers(4, 40))
        kind = trial % 4
        if kind == 0:
            px = np.tile(np.linspace(0, 255, w), (h, 1)).astype(np.uint8)
        elif kind == 1:
            px = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        elif kind == 2:
            px = np.zeros((h, w), dtype=np.uint8)
            px[::3, ::5] = 255
        else:
            px = (np.add.outer(np.arange(h), np.arange(w)) * 7 % 256).astype(
                np.uint8
            )
        cases.append((w, h, px))
    for w, h, px in cases:
        assert parse_jpeg(synth_jpeg_prog(w, h, pixels=px)) == parse_jpeg(
            synth_jpeg(w, h, pixels=px)
        )

    # restart intervals across all scans of the progression
    px = rng.integers(0, 256, size=(24, 40)).astype(np.uint8)
    assert parse_jpeg(
        synth_jpeg_prog(40, 24, pixels=px, restart_interval=3)
    ) == parse_jpeg(synth_jpeg(40, 24, pixels=px))

    # color: interleaved DC scan + per-component AC scans over each
    # component's OWN block grid, 4:4:4 / 4:2:2 / 4:2:0, with and
    # without DRI
    samps = (((1, 1), (1, 1), (1, 1)), ((2, 1), (1, 1), (1, 1)),
             ((2, 2), (1, 1), (1, 1)))
    for i, samp in enumerate(samps):
        ycc = (i * 40 + 10, 200 - i * 30, 60 + i * 50)
        for ri in (0, 2):
            assert parse_jpeg(
                synth_jpeg_prog_ycc(21, 13, ycc, sampling=samp,
                                    restart_interval=ri)
            ) == parse_jpeg(
                synth_jpeg_ycc(21, 13, ycc, sampling=samp, restart_interval=ri)
            )


def test_jpeg_progressive_failure_modes():
    """Honest-contract pins for the progressive path: interleaved AC
    scans are invalid (T.81 forbids them), truncated scans raise, and
    remaining SOF types still raise unsupported."""
    import struct

    import pytest

    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        parse_jpeg,
        synth_jpeg_prog,
    )

    blob = synth_jpeg_prog(10, 10, 128)
    # truncation mid-scan
    with pytest.raises(ValueError, match="truncated|unexpected"):
        parse_jpeg(blob[: len(blob) // 2])
    # arithmetic-coded progressive (SOF10 = 0xCA) still refused
    bad = bytearray(blob)
    ix = bad.find(b"\xff\xc2")
    bad[ix + 1] = 0xCA
    with pytest.raises(ValueError, match="unsupported"):
        parse_jpeg(bytes(bad))
    # hand-built interleaved AC scan header must be rejected: take the
    # color stream and rewrite its first AC scan header (ns=1 -> the
    # DC-refine 3-component header with Ss>0)
    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        synth_jpeg_prog_ycc,
    )

    cblob = bytearray(synth_jpeg_prog_ycc(9, 9, (100, 110, 120)))
    # find the second SOS (DC refine, ns=3) and corrupt Ss to 1
    pos = -1
    for _ in range(2):
        pos = cblob.find(b"\xff\xda", pos + 1)
    (ln,) = struct.unpack(">H", cblob[pos + 2 : pos + 4])
    cblob[pos + 4 + 1 + 2 * 3] = 1  # Ss byte of the ns=3 header
    cblob[pos + 4 + 2 + 2 * 3] = 63  # Se: a well-formed AC band...
    with pytest.raises(ValueError, match="interleaved AC"):
        parse_jpeg(bytes(cblob))  # ...but ns=3 — interleaved AC is illegal
    # and a half-formed one (Ss=1, Se=0) dies on the header check
    cblob[pos + 4 + 2 + 2 * 3] = 0
    with pytest.raises(ValueError, match="DC scan requires"):
        parse_jpeg(bytes(cblob))


def test_ivfpq_tombstone_delete_fold_and_retrain(spark, sf_dir, tmp_path):
    """Round-11 brief #2 — vector deletes for the persisted ANN index:
    (1) delete_from_ivfpq_index tombstones ids and the persisted search
    excludes them IMMEDIATELY (broadcast anti probe, no retrain);
    (2) fold_ivfpq_tombstones physically rewrites only the hit cells,
    clears the tombstone table (the bounded-set guarantee), and search
    results are unchanged by the fold; (3) a fully-emptied cell's
    directory is dropped; (4) a retrain folds the tombstones into the
    new generation (clean codes, no tombstones table)."""
    import os

    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        delete_from_ivfpq_index,
        fold_ivfpq_tombstones,
        knn_cosine_ivfpq_persisted,
        maintain_ivfpq_index,
        persist_ivfpq_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    path = str(tmp_path / "ivfpq")
    persist_ivfpq_index(emb, path, nlist=8, m=16, ksub=64)

    def search():
        return knn_cosine_ivfpq_persisted(
            spark, path, emb, queries, k=5, nprobe=4, refine=8
        ).collect()

    before = search()
    # the rank-1 neighbor of each query is the query itself (the
    # queries come from the corpus) — delete exactly those ids
    doomed = sorted({r["neighbor_id"] for r in before if r["rank"] == 1})
    assert doomed, "fixture must produce rank-1 neighbors"
    rep = delete_from_ivfpq_index(spark, doomed, path, id_col="vec_id")
    assert rep["n_tombstoned"] == len(doomed)

    after = search()
    got_ids = {r["neighbor_id"] for r in after}
    assert not got_ids & set(doomed), "deleted ids must not be returned"
    # k still satisfied per query — the next candidates promote
    per_q = {}
    for r in after:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())

    # fold: physical rewrite, tombstones cleared, results unchanged
    codes_n_before = spark.read.parquet(os.path.join(path, "codes")).count()
    fold = fold_ivfpq_tombstones(spark, path, id_col="vec_id")
    assert fold["n_folded"] == len(doomed)
    assert not os.path.exists(os.path.join(path, "tombstones"))
    codes_n_after = spark.read.parquet(os.path.join(path, "codes")).count()
    assert codes_n_before - codes_n_after == len(doomed)
    key = lambda rows: {(r["query_id"], r["neighbor_id"], r["rank"]) for r in rows}
    assert key(search()) == key(after), "fold must not change results"

    # fully-emptied cell: tombstone every id of one cell, fold, dir gone
    codes = spark.read.parquet(os.path.join(path, "codes"))
    a_cell = codes.select("cell_id").first()["cell_id"]
    cell_ids = [
        r["vec_id"]
        for r in codes.filter(F.col("cell_id") == a_cell).select("vec_id").collect()
    ]
    delete_from_ivfpq_index(spark, cell_ids, path, id_col="vec_id")
    fold2 = fold_ivfpq_tombstones(spark, path, id_col="vec_id")
    assert int(a_cell) in fold2["cells_dropped"]
    assert not os.path.exists(
        os.path.join(path, "codes", f"cell_id={int(a_cell)}")
    )
    # a second fold with nothing pending is a no-op
    assert fold_ivfpq_tombstones(spark, path)["n_folded"] == 0

    # retrain folds pending tombstones into the new generation
    more = sorted(
        r["vec_id"]
        for r in spark.read.parquet(os.path.join(path, "codes"))
        .select("vec_id").limit(7).collect()
    )
    delete_from_ivfpq_index(spark, more, path, id_col="vec_id")
    out = maintain_ivfpq_index(
        spark, emb, path, {"needs_retrain": True}, nlist=8, m=16, ksub=64
    )
    assert out["retrained"] and out["version"] == "v1"
    v1_codes = spark.read.parquet(os.path.join(path, "v1", "codes"))
    assert not os.path.exists(os.path.join(path, "v1", "tombstones"))
    assert v1_codes.filter(F.col("vec_id").isin(more)).count() == 0
    # and the repointed search no longer sees them either
    assert not {r["neighbor_id"] for r in search()} & set(more)


def test_split_leakage_safe_no_cluster_straddles(spark, sf_dir):
    """q_split_leakage_safe's whole point, pinned directly: every
    near-dup cluster lands in exactly ONE split (no eval-contamination
    leak), the witness is non-vacuous (at least one multi-doc cluster
    exists and all three splits are occupied), and the assignment is
    exhaustive/disjoint over the corpus."""
    from pulsar_elasticsearch_sync_rs_spark.plans.llm_queries import (
        q_split_leakage_safe,
    )

    rows = q_split_leakage_safe(spark, sf_dir).collect()
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    splits_by_cluster: dict = {}
    sizes: dict = {}
    for r in rows:
        splits_by_cluster.setdefault(r.cluster, set()).add(r.split)
        sizes[r.cluster] = sizes.get(r.cluster, 0) + 1
    assert all(len(s) == 1 for s in splits_by_cluster.values()), {
        c: s for c, s in splits_by_cluster.items() if len(s) > 1
    }
    # non-vacuous: a doc-grain hash COULD have straddled something
    assert max(sizes.values()) >= 2, "fixture produced no multi-doc cluster"
    assert {r.split for r in rows} == {"train", "val", "test"}


def test_ivfpq_delete_max_pending_ceiling(spark, sf_dir, tmp_path):
    """Round-11 ADVICE: the search-time tombstone broadcast bound is
    ENFORCED — a delete batch that would push the pending backlog past
    ``max_pending`` refuses BEFORE writing (fold, then retry), the
    count is exact across re-deletes of already-tombstoned ids (union
    distinct, no spurious refusal), and n_pending is reported."""
    import os

    import pytest

    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        delete_from_ivfpq_index,
        fold_ivfpq_tombstones,
        persist_ivfpq_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq")
    persist_ivfpq_index(emb, path, nlist=8, m=16, ksub=64)
    ids = sorted(
        r["vec_id"] for r in emb.select("vec_id").limit(6).collect()
    )

    rep = delete_from_ivfpq_index(spark, ids[:3], path, max_pending=5)
    assert rep == {"n_tombstoned": 3, "n_pending": 3}
    # re-deleting the same ids must not double-count toward the ceiling
    rep = delete_from_ivfpq_index(spark, ids[:3], path, max_pending=3)
    assert rep["n_pending"] == 3
    # pushing past the ceiling refuses and writes NOTHING
    with pytest.raises(ValueError, match="max_pending"):
        delete_from_ivfpq_index(spark, ids[3:], path, max_pending=5)
    pending = (
        spark.read.parquet(os.path.join(path, "tombstones"))
        .distinct()
        .count()
    )
    assert pending == 3, "refused batch must leave the table untouched"
    # fold clears the backlog; the refused batch then lands
    fold_ivfpq_tombstones(spark, path)
    rep = delete_from_ivfpq_index(spark, ids[3:], path, max_pending=5)
    assert rep == {"n_tombstoned": 3, "n_pending": 3}
    # empty batch still reports the live backlog
    assert delete_from_ivfpq_index(spark, [], path) == {
        "n_tombstoned": 0,
        "n_pending": 3,
    }


def test_jpeg_truncated_dht_raises_even_with_warm_cache():
    """Round-11 ADVICE: DHT segment-completeness is validated BEFORE
    the memoization probe — a truncated table must raise 'truncated
    Huffman table' whether or not a previous decode populated
    _DHT_CACHE, for truncation in the vals region AND in the 16-byte
    bits region (the clamped slice must never be used as a cache key)."""
    import struct

    import pytest

    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        parse_jpeg,
        synth_jpeg,
    )

    blob = synth_jpeg(16, 16, luma=120)
    parse_jpeg(blob)  # warm the cache with every full-length table

    pos = blob.find(b"\xff\xc4")
    assert pos > 0
    (ln,) = struct.unpack(">H", blob[pos + 2 : pos + 4])

    def with_dht_len(new_len: int) -> bytes:
        c = bytearray(blob)
        c[pos + 2 : pos + 4] = struct.pack(">H", new_len)
        return bytes(c)

    # cut inside the vals region (body keeps the declared short length,
    # so the outer segment check passes and the inner one must fire)
    with pytest.raises(ValueError, match="truncated Huffman table"):
        parse_jpeg(with_dht_len(ln - 2))
    # cut inside the 17-byte class/bits header
    with pytest.raises(ValueError, match="truncated Huffman table"):
        parse_jpeg(with_dht_len(12))


def test_jpeg_batched_idct_bit_identical_to_per_block():
    """Round-11 perf rewrite guard: _idct_plane (the batched
    dequant+IDCT both decode paths now share) must be BIT-identical —
    np.array_equal, not allclose — to the per-block
    ``M.T @ (S*qr) @ M + 128`` it replaced; numpy's stacked matmul
    keeps the same left-to-right association per 8×8 block."""
    import numpy as np

    from pulsar_elasticsearch_sync_rs_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _dct_matrix,
        _idct_plane,
        _qt_raster,
    )

    rng = np.random.default_rng(11)
    M = _dct_matrix()
    qt = [8] + [16] * 63
    qr = _qt_raster(qt)
    zig = np.asarray(_JPEG_ZIGZAG)
    for BY, BX in ((1, 1), (3, 5), (7, 2)):
        C = rng.integers(-300, 300, (BY, BX, 64)).astype(np.int32)
        ref = np.empty((BY * 8, BX * 8))
        for by in range(BY):
            for bx in range(BX):
                S = np.empty(64)
                S[zig] = C[by, bx]
                S = S.reshape(8, 8) * qr
                ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    M.T @ S @ M + 128.0
                )
        assert np.array_equal(ref, _idct_plane(C, qr, M))


def test_knn_ivfpq_auto_picks_measured_winner(spark):
    """Round-11 brief #6: knn_cosine_ivfpq_auto selects the build from
    the spectrum decay — the DECAYING low-rank fixture (99.9% energy in
    8 axes; the regime where the PCA composition measurably wins) must
    choose the PCA build, the near-ISOTROPIC fixture (energy spread
    over all 64 dims; the regime where it measurably loses) must choose
    full-dim, and each result must equal running the chosen build
    directly (the fitted model is reused, so the PCA path is exact)."""
    import numpy as np

    from pulsar_elasticsearch_sync_rs_spark.operators.pq import (
        knn_cosine_ivfpq,
        knn_cosine_ivfpq_auto,
        knn_cosine_ivfpq_pca,
    )

    rng = np.random.default_rng(11)
    n, d = 600, 64
    kw = dict(k=5, nlist=4, nprobe=4, m=8, ksub=64, refine=2)

    def mkdf(X):
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        df = spark.createDataFrame(
            [(i, X[i].tolist()) for i in range(n)],
            "vec_id bigint, embedding array<double>",
        ).repartition(4)
        q = df.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        return df, q

    key = lambda rows: {(r["query_id"], r["neighbor_id"], r["rank"]) for r in rows}

    # decaying spectrum → PCA build
    low = rng.normal(size=(n, 6)) @ rng.normal(size=(6, d))
    low += 0.05 * rng.normal(size=(n, d))
    emb, q = mkdf(low)
    choice: dict = {}
    auto = key(
        knn_cosine_ivfpq_auto(emb, q, pca_dim=8, choice_out=choice, **kw).collect()
    )
    assert choice["build"] == "pca" and choice["energy_fraction"] > 0.9, choice
    assert auto == key(knn_cosine_ivfpq_pca(emb, q, pca_dim=8, **kw).collect())

    # near-isotropic spectrum → full-dim build
    iso = rng.normal(size=(n, d))
    emb, q = mkdf(iso)
    choice = {}
    auto = key(
        knn_cosine_ivfpq_auto(emb, q, pca_dim=8, choice_out=choice, **kw).collect()
    )
    assert choice["build"] == "full" and choice["energy_fraction"] < 0.5, choice
    assert auto == key(knn_cosine_ivfpq(emb, q, **kw).collect())

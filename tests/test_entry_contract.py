"""Driver-contract self-consistency: every oracle key has a query,
entry() runs on a vanilla-config session, and all queries build valid
plans (analysis-time check — execution is the oracle harness's job)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"
    rows_only = set(qs) - set(oracles)
    # every rows-only query is one of the documented exceptions
    allowed = {
        "q_uuid_inject",  # nondeterministic values
        "q_approx_distinct",  # HLL sketch differs per engine (≤5% pytest)
        "q_dedup_minhash_verified",  # LSH candidates -> verify (subset/recall pytest)
        "q_dedup_simhash",  # numpy UDF signature, not SQL-expressible (brute-force-equality pytest)
        "q_embed_neardup_lsh",  # sign-LSH lane (recall pytest vs exact)
        "q_embed_neardup_ivf",  # IVF lane (recall pytest vs exact)
        "q_knn_ivf",  # approximate + sample-trained quantizer
    }
    assert rows_only == allowed, f"unexpected rows-only queries: {rows_only ^ allowed}"


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "app", "index", "n_docs", "n_debug", "avg_fields", "first_ts", "last_ts",
    ]


def test_all_queries_analyze(spark, sf_dir):
    """Plan-analysis smoke for every declared query: schema resolution
    catches missing columns/typos without paying full execution."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.schema is not None and len(df.columns) > 0, name

"""Empty-input totality sweep: at 100 TB a filter or partition prune
routinely hands an operator ZERO rows, and the engine must degrade to
an empty (schema-stable) result — not a numpy axis error or a null
deref. Every declared and extra query runs against a fixture set of
the same 10 table schemas with no rows; the only sanctioned exception
is the ANN family's documented fail-fast (training a coarse/PQ
quantizer on an empty corpus raises a clear ValueError — the behavior
chosen over returning silently-empty neighbor lists)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# ANN lanes train a quantizer; an empty corpus is a caller error by
# design (operators/ivf.py bounded_training_sample guard)
EXPECTED_RAISE = {
    "q_knn_ivf",
    "q_knn_pq",
    "q_knn_ivfpq",
    "q_embed_neardup_ivf",
    "q_semantic_dedup_ivf",
    "q_embed_pca",  # same contract: no model can be fit on no vectors
    "q_knn_ivfpq_pca",  # PCA front: same no-model-on-no-vectors contract
    "q_knn_ivfpq_auto",  # selector runs pca_fit first: same contract
    "q_quality_lr",  # IRLS classifier: same contract
    "q_kmeans_balance",  # Lloyd fit: same no-model-on-no-vectors contract
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.parquet(
            f"{d}/{t}.parquet"
        )
    return d


def test_every_query_tolerates_an_empty_corpus(spark, empty_sf_dir):
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    wrong: list[str] = []
    for name, fn in qs.items():
        try:
            n = fn(spark, empty_sf_dir).count()
            if name in EXPECTED_RAISE:
                wrong.append(f"{name}: expected the quantizer ValueError, got {n} rows")
            elif n != 0:
                wrong.append(f"{name}: fabricated {n} rows from empty input")
        except ValueError as e:
            if name not in EXPECTED_RAISE or "empty corpus" not in str(e):
                wrong.append(f"{name}: ValueError {e}")
        except Exception as e:  # noqa: BLE001 - cataloging, not handling
            first_line = (str(e).splitlines() or [""])[0]
            wrong.append(f"{name}: {type(e).__name__} {first_line[:100]}")
    assert not wrong, "empty-input failures:\n" + "\n".join(wrong)

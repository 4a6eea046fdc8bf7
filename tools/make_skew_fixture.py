"""Build a ZIPF-SKEWED variant of the driver fixtures for guard-lane
stress: every prior fixture is roughly uniform, but the scale-killers
the salted agg/join, the minhash mega-bucket star guard, and AQE's
skew handling exist for are zipfian. This tool reshapes sf0.01 into
the adversarial distribution those paths were built for, so the
oracle sweep can prove the guards change PLANS, not ANSWERS:

- events: ``user_id`` redrawn from a zipf(s=1.2) over the existing
  user universe (hot user owns ~8% of all events; top-10 own ~35%),
  and ``event_type`` made hot (~80% 'click'). Both deterministic —
  the zipf uniform comes from xxhash64(event_id), inverse-CDF'd
  through the driver-computed cumulative weights (no rand(): rerunning
  the tool reproduces the fixture bit-for-bit).
- documents: (a) hot language — ~78% of docs reassigned 'en';
  (b) a BOILERPLATE CLONE CLUSTER — every 7th doc's text replaced by
  one shared passage with 3 near-identical tail variants, the crawl
  pathology that floods a minhash band bucket and would go quadratic
  without the mega-bucket star guard; (c) hot source (~70% 'src0').
  n_chars recomputed where text changed.
- all other tables copied through unchanged (keys/joins untouched).

Every query still has its DuckDB twin run on the SAME skewed parquet,
so `python tools/check_oracle.py /tmp/sf_skew` is the full
correctness gate under skew.

Run:  python tools/make_skew_fixture.py [SRC_DIR] [DST_DIR]
      (defaults: /root/testdata/sf0.01 /tmp/sf_skew)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pulsar_elasticsearch_sync_rs_spark.session import get_spark

ZIPF_S = 1.2
HOT_LANG_PCT = 78  # % of docs forced to 'en'
CLONE_MOD = 7  # every 7th doc joins the boilerplate cluster
HOT_SRC_PCT = 70
BOILER = (
    "breaking news subscribe to our newsletter for the latest updates "
    "terms of service apply all rights reserved contact us for details "
    "cookie policy privacy statement follow us on every platform now"
)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_skew"
    spark = get_spark(app_name="make_skew_fixture", cpus=16)
    os.makedirs(dst, exist_ok=True)

    def rd(name):
        return spark.read.parquet(f"{src}/{name}.parquet")

    def wr(df, name, parts=4):
        df.repartition(parts).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"# {name}: {spark.read.parquet(f'{dst}/{name}.parquet').count()} rows")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "embeddings"):
        wr(rd(t), t, 1 if t in ("region", "nation") else 4)

    # --- events: zipf user_id + hot event_type --------------------------
    ev = rd("events")
    users = sorted(r["user_id"] for r in ev.select("user_id").distinct().collect())
    ranks = np.arange(1, len(users) + 1, dtype=np.float64)
    cdf = np.cumsum(ranks ** -ZIPF_S)
    cdf /= cdf[-1]
    user_arr = np.array(users, dtype=np.int64)

    zipf_schema = T.StructType(
        [f for f in ev.schema.fields]  # same shape, user_id/event_type rewritten
    )

    def rezipf(batches):
        for pdf in batches:
            # uniform in [0,1) from the billion-bucket event_id hash
            u = (pdf["__h"].to_numpy() % 1_000_000_000) / 1_000_000_000.0
            pdf = pdf.drop(columns="__h")
            pdf["user_id"] = user_arr[np.searchsorted(cdf, u, side="left")]
            hot = ((pdf["event_id"].to_numpy() * 2654435761) % 100) < 80
            pdf["event_type"] = np.where(hot, "click", pdf["event_type"])
            yield pdf[[f.name for f in zipf_schema.fields]]

    ev_h = ev.withColumn("__h", F.abs(F.xxhash64(F.col("event_id").cast("string"))))
    wr(ev_h.mapInPandas(rezipf, schema=zipf_schema), "events")

    # --- documents: hot lang + boilerplate clone cluster + hot source ---
    doc = rd("documents")
    pct = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(100))
    cloned_text = F.concat(
        F.lit(BOILER), F.lit(" tail variant "), (F.col("doc_id") % 3).cast("string")
    )
    out = (
        doc.withColumn("lang", F.when(pct < HOT_LANG_PCT, F.lit("en")).otherwise(F.col("lang")))
        .withColumn(
            "source",
            F.when(
                F.pmod(F.xxhash64(F.concat(F.lit("s"), F.col("doc_id").cast("string"))), F.lit(100))
                < HOT_SRC_PCT,
                F.lit("src0"),
            ).otherwise(F.col("source")),
        )
        .withColumn(
            "text",
            F.when(F.col("doc_id") % CLONE_MOD == 3, cloned_text).otherwise(F.col("text")),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    wr(out, "documents")
    print(f"# skew fixture written to {dst} (zipf s={ZIPF_S})")


if __name__ == "__main__":
    main()

"""Z-order skip-rate decade probe (SCALE.md protocol, scripted —
rounds 9/10 ran this ad-hoc; round 11 pushes it to sf100 and keeps the
recipe).

Writes the fixture's events three ways — arrival order, 1-D clustered
on user_id, Z-order (user_id, event_id) — and counts, straight from
the parquet footers, how many row groups a central-10% integer band
predicate on EACH dimension must read under min/max stats pruning.
The claim under test: the Morton layout is selective on BOTH
dimensions at once, at any scale, while 1-D clustering is blind off
its leading key.

Run:  python tools/bench_zorder_decade.py [SF_DIR] [N_FILES] [WORKDIR]
      (defaults: /tmp/sf1 64 /tmp/bench_zorder)
Emits one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from pulsar_elasticsearch_sync_rs_spark.operators.layout import (
    persist_clustered,
    persist_zordered,
)
from pulsar_elasticsearch_sync_rs_spark.session import get_spark
from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table


def _rowgroup_ranges(path: str, col: str) -> list[tuple]:
    ranges = []
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(root, fname)).metadata
            idx = meta.schema.names.index(col)
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                ranges.append((st.min, st.max))
    return ranges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bench_zorder"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark(app_name="bench_zorder_decade")
    spark.sparkContext.setLogLevel("ERROR")

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    n_rows = ev.count()
    per_file = max(200, n_rows // n_files)
    base_dir = os.path.join(work, "arrival")
    one_dir = os.path.join(work, "onedim")
    z_dir = os.path.join(work, "morton")

    t0 = time.monotonic()
    ev.write.option("maxRecordsPerFile", per_file).parquet(base_dir)
    t_base = time.monotonic() - t0
    t0 = time.monotonic()
    persist_clustered(
        ev, one_dir, ["user_id"], n_files=n_files, max_records_per_file=per_file
    )
    t_one = time.monotonic() - t0
    t0 = time.monotonic()
    persist_zordered(
        ev, z_dir, ["user_id", "event_id"], bits=8, n_files=n_files,
        max_records_per_file=per_file,
    )
    t_z = time.monotonic() - t0

    lo_u, hi_u = ev.approxQuantile("user_id", [0.45, 0.55], 0.001)
    lo_e, hi_e = ev.approxQuantile("event_id", [0.45, 0.55], 0.001)
    lo_u, hi_u = int(math.ceil(lo_u)), int(math.floor(hi_u))
    lo_e, hi_e = int(math.ceil(lo_e)), int(math.floor(hi_e))

    def reads(path, col, lo, hi):
        ranges = _rowgroup_ranges(path, col)
        hit = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
        return hit, len(ranges)

    out = {
        "sf_dir": sf_dir,
        "n_rows": n_rows,
        "n_files": n_files,
        "write_sec": {
            "arrival": round(t_base, 1),
            "onedim": round(t_one, 1),
            "zorder": round(t_z, 1),
        },
    }
    for name, path in (("arrival", base_dir), ("onedim", one_dir), ("zorder", z_dir)):
        hu, tu = reads(path, "user_id", lo_u, hi_u)
        he, te = reads(path, "event_id", lo_e, hi_e)
        out[name] = {
            "user_band": f"{hu}/{tu}",
            "user_frac": round(hu / tu, 3),
            "event_band": f"{he}/{te}",
            "event_frac": round(he / te, 3),
        }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

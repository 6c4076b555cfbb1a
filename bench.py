"""t3 bench harness: run every declared query once (warm JVM) and emit
ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Execution is measured with the noop sink so the number is engine time
(scan→compute→sink), not driver-side row serialization. Scale factor
comes from $SPARK_GRAFT_SF_DIR (default sf0.1); parallelism from
$SPARK_GRAFT_CPUS via the session factory.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from __spark_entry__ import queries  # noqa: E402
from glaciersgee_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("ggee-bench")

    qs = queries()
    # JVM/catalog warm-up: one run of the heaviest common shape
    qs["q_b_agg_hash"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    per: dict[str, float] = {}
    t_all = time.monotonic()
    for name in sorted(qs):
        t0 = time.monotonic()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            per[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001 — a broken query must not hide the rest
            per[name] = -1.0
            print(f"# BENCH ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
    total = round(time.monotonic() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": per,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""t3 bench harness: emit ONE JSON line
{"metric", "value", "unit", "queries", "cold", "sf"}.

Methodology (documented in BASELINE.md §protocol): each query runs
TWICE — an untimed warm-up (Catalyst planning, whole-stage codegen
compilation, Python-worker spin-up: one-time costs that amortize to
zero at any real scale) and then the timed steady-state run.
`spark.catalog.clearCache()` between the two keeps the timed run
honest: any DataFrame a query persists internally is dropped, so run
two re-computes everything. The cold (first-run) times are reported
under "cold" so nothing is hidden; "value" is the sum of the timed
runs.

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
    cold: dict[str, float] = {}
    for name in sorted(qs):
        try:
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.monotonic() - t0, 3)
            spark.catalog.clearCache()
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            per[name] = round(time.monotonic() - t0, 3)
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001 — a broken query must not hide the rest
            cold.setdefault(name, -1.0)
            per[name] = -1.0
            print(f"# BENCH ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
    total = round(sum(v for v in per.values() if v > 0), 3)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": per,
                "cold": cold,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Solo min-of-3 timing probe — the BASELINE.md per-wave protocol,
runnable on any op subset (the reproduction path for every "solo s"
number recorded in BASELINE.md, and for the host-calibration trio).

Usage:
    python tests/solo_probe.py <op> [<op> ...]          # sf0.1
    SPARK_GRAFT_SF_DIR=... python tests/solo_probe.py <op> ...

Protocol (identical to bench.py's steady-state discipline, plus the
registered-cache clear): one untimed cold run (Catalyst + codegen +
Python-worker spin-up + any one-time artifact/staging builds), then
three timed runs with spark.catalog.clearCache() AND
glaciersgee_spark.caches.clear_caches() between every run — so every
timed run recomputes everything, including app-scoped training/
assignment caches. Reported: min of 3 (the low-noise estimator on a
host with multi-second scheduler stalls) and the cold time.

Host-calibration trio (BASELINE.md round-9 closing battery): run
    python tests/solo_probe.py q_b_mad q_f_pandas_window q_e_winnow
on any host to place it against the recorded 08-15 / 08-16-morning /
08-16-afternoon series before comparing battery totals.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402
from glaciersgee_spark.caches import clear_caches  # noqa: E402
from glaciersgee_spark.session import get_spark  # noqa: E402


def main() -> None:
    ops = sys.argv[1:]
    if not ops:
        print(__doc__)
        raise SystemExit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ggee-solo-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    # same warm-up pair as bench.py: heaviest JVM shape + one Arrow op
    qs["q_b_agg_hash"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    qs["q_e_sim_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    clear_caches()
    for name in ops:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.monotonic() - t0
        spark.catalog.clearCache()
        clear_caches()
        timed = []
        for _ in range(3):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timed.append(time.monotonic() - t0)
            spark.catalog.clearCache()
            clear_caches()
        print(
            json.dumps(
                {
                    "op": name,
                    "solo": round(min(timed), 3),
                    "cold": round(cold, 3),
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

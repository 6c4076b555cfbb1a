"""t3 bench harness.

Output protocol (round-3 fix — BENCH_r01/r02 recorded `parsed: null`
because the old single huge JSON line was truncated by the driver's
bounded stdout capture): the FIRST line is a short, always-parseable
summary JSON {"metric", "value", "unit", "sf", "n_queries"}; then one
small JSON line per query {"query", "sec", "cold"}; then the summary
is repeated as the LAST line (so both head- and tail-bounded captures
contain a parseable total).

Methodology (documented in BASELINE.md §protocol): each query runs
FOUR times — an untimed warm-up (Catalyst planning, whole-stage
codegen compilation, Python-worker spin-up: one-time costs that
amortize to zero at any real scale) and three timed steady-state
runs, of which the MINIMUM is reported. Min-of-3 because this host shows
random multi-second stalls that hit a different query every run
(measured: the same query swinging 1.4 s ↔ 20.7 s across identical-
code runs while the rest of the suite was unchanged) — the minimum is
the standard low-noise estimator for wall-clock work actually
required. `spark.catalog.clearCache()` after every run keeps each
timed run honest: any DataFrame a query persists internally is
dropped, so every run re-computes everything. The cold (first-run)
times are reported under "cold" so nothing is hidden; "value" is the
sum over queries of the per-query minimum.

Execution is measured with the noop sink so the number is engine time
(scan→compute→sink), not driver-side row serialization. Scale factor
comes from $SPARK_GRAFT_SF_DIR (default sf0.1); parallelism from
$SPARK_GRAFT_CPUS via the session factory.

Host calibration (round 10 — VERDICT r9 item 3, mechanical
normalization): immediately before the battery, the calibration trio
(q_b_mad: JVM shuffle+window; q_f_pandas_window: Arrow boundary;
q_e_winnow: Python-kernel heavy) runs under the same min-of-3
protocol and its three readings are stamped INTO both summary lines
as "calibration", alongside "host_index" — the mean of the three
ratios vs the recorded 2026-08-15 basis {q_b_mad: 1.94,
q_f_pandas_window: 0.93, q_e_winnow: 1.31} (BASELINE.md calibration-
trio series). Round-over-round comparisons divide the battery total
by host_index instead of a hand-argued narrative.
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

N_TIMED = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("ggee-bench")

    qs = queries()
    # Warm-up: the heaviest JVM shape plus one Arrow pandas-UDF query,
    # so Python-worker spin-up (a one-time cost) doesn't land on the
    # alphabetically-first Group E query's cold number.
    qs["q_b_agg_hash"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    qs["q_e_sim_topk"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    # Host-calibration trio: same min-of-3 protocol, run FIRST so the
    # readings describe the host that produced the battery that
    # follows. Basis values: BASELINE.md calibration-trio series,
    # 2026-08-15 column.
    basis = {"q_b_mad": 1.94, "q_f_pandas_window": 0.93, "q_e_winnow": 1.31}
    calibration: dict[str, float] = {}
    for name in basis:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        timed = []
        for _ in range(N_TIMED):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timed.append(time.monotonic() - t0)
            spark.catalog.clearCache()
        calibration[name] = round(min(timed), 3)
    host_index = round(
        sum(calibration[n] / basis[n] for n in basis) / len(basis), 3
    )

    per: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in sorted(qs):
        try:
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.monotonic() - t0, 3)
            spark.catalog.clearCache()
            timed: list[float] = []
            for _ in range(N_TIMED):
                t0 = time.monotonic()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                timed.append(time.monotonic() - t0)
                spark.catalog.clearCache()
            per[name] = round(min(timed), 3)
        except Exception as e:  # noqa: BLE001 — a broken query must not hide the rest
            cold.setdefault(name, -1.0)
            per[name] = -1.0
            print(f"# BENCH ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
    total = round(sum(v for v in per.values() if v > 0), 3)

    summary = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(per),
        "calibration": calibration,
        "host_index": host_index,
    }
    print(json.dumps(summary), flush=True)
    for name in sorted(per):
        print(json.dumps({"query": name, "sec": per[name], "cold": cold.get(name)}))
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Dev tool: flag all-constant output columns across every declared query.

Usage: python tests/audit_constants.py [sf_dir]

A column that is constant across every output row is a probe that the
DuckDB parity gate can never falsify — three real degeneracies were
found this way in round 2 (a lateness audit that measured zero
lateness, a UDTF whose fan-out count was always 1, a regex counter
whose modulus divided the row-sample modulus: see the "modular-divisor
trap" — any probe expression `x % a` is constant under a row filter
`x % b == 0` when a divides b).

Some constants are legitimate corpus facts (25 docs per source,
sanity-flag columns that SHOULD always hold); the output is a review
list, not a failure gate.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from __spark_entry__ import queries  # noqa: E402
from glaciersgee_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("const-audit")
    n_flagged = 0
    for name, fn in sorted(queries().items()):
        try:
            rows = fn(spark, sf_dir).limit(5000).collect()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            continue
        if len(rows) < 3:
            continue  # tiny ledgers are legitimately constant
        for c in rows[0].asDict():
            vals = {repr(r[c]) for r in rows}
            if len(vals) == 1:
                n_flagged += 1
                print(f"CONST {name}.{c} = {next(iter(vals))[:50]} ({len(rows)} rows)")
    print(f"\n{n_flagged} constant columns (review list, not failures)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

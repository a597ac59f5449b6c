"""Print the driver-gate rotation decision (VERDICT r14 #6): which
entries the next driver run will gate and why — pinned churn, the
staleness cohort, and anything never gated. The same computation the
window itself and tests/test_gate_order.py use (catalog.
gate_rotation_report), so the committed window, the policy test and
this report can never disagree.

Usage: python tools/gate_report.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    from slurm2sql_spark.catalog import gate_rotation_report

    r = gate_rotation_report()
    print(json.dumps(r, indent=1))
    print(
        f"\nround about to run: r{r['current_round']}; window "
        f"{len(r['window'])} rows = {len(r['pinned'])} pinned + "
        f"{len(r['window']) - len(r['pinned'])} stalest-first fill; "
        f"{len(r['stale_in_window'])}/{len(r['stale_cohort'])} of the "
        "staleness>=3 cohort re-gate this round; "
        f"never-gated entries: {len(r['never_gated'])}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

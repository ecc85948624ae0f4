#!/usr/bin/env python
"""Round-close churn stamp (round-12, verdict "What's wrong #1"): the
close note's churn claim must be the DERIVED number, stamped by a tool
on the final tree — never prose.  Round 11's close note said "55
churned rows lead the re-pinned cohort (the drain completes on
schedule)" while the final tree derived 265: the split-sum commit
re-edited shared helpers AFTER the note was written, and nothing
re-derived.  Same artifact-over-prose pattern as the bench envelope
stamp (bench.py evaluates + stamps; the suite asserts the stamp is
self-consistent).

Usage:
  python tools/close_stamp.py          # print the derived stamp line
  python tools/close_stamp.py --write  # also replace the CHURN_STAMP
                                       # line in PERF.md (append if absent)

The stamp is one line in PERF.md:
  CHURN_STAMP: {"round": N, ...}
and tests/test_round12.py::test_perf_churn_stamp_matches_derivation
re-derives on every suite run and asserts equality — a commit that
changes churn after the stamp fails the suite until the stamp is
re-run, which is exactly the round-11 failure mode made impossible.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFRESH_SLOTS_PER_ROUND = 47  # window = 1 flagship + 2 registrations + 47


def derive() -> dict:
    from backlog_audit import compute_backlog, compute_churn

    from real_time_big_data_iot_monitoring_pipeline_spark import plans

    b = compute_backlog()
    churned = compute_churn()
    outside = sorted(n for n in churned if n not in set(plans.DRIVER_WINDOW))
    current_round = max(b["latest_hash_round"].values(), default=0) + 1
    return {
        "round": current_round,
        "registry": b["n_registry"],
        "oracle_bearing": b["n_oracle_bearing"],
        "ever_hashed": b["n_ever_hashed"],
        "never_hashed": b["n_never_hashed"],
        "churned": len(churned),
        "churned_outside_window": len(outside),
        # rounds of refresh slots to drain every churned row not already
        # hashing this round (the honest horizon the round-11 close
        # overstated): ceil(outside / slots-per-round)
        "drain_rounds": math.ceil(len(outside) / REFRESH_SLOTS_PER_ROUND),
    }


def main() -> None:
    stamp = derive()
    line = "CHURN_STAMP: " + json.dumps(stamp, sort_keys=True)
    print(line)
    if "--write" in sys.argv:
        perf = os.path.join(REPO, "PERF.md")
        src = open(perf).read()
        if re.search(r"^CHURN_STAMP: .*$", src, flags=re.M):
            src = re.sub(r"^CHURN_STAMP: .*$", line, src, flags=re.M)
        else:
            src = src.rstrip("\n") + (
                "\n\n## Churn stamp (derived, tool-written — do not hand-edit)\n\n"
                "The close-tree churn derivation (tools/close_stamp.py; the\n"
                "suite asserts this line equals a fresh derivation on every\n"
                "run, so a post-stamp commit that changes churn fails until\n"
                "the stamp is re-run):\n\n" + line + "\n"
            )
        open(perf, "w").write(src)
        print(f"written to {perf}")


if __name__ == "__main__":
    main()

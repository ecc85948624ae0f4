#!/usr/bin/env python
"""Integer-overflow scale audit (round-11): find every integer
sum-of-products aggregation site in the catalog source and require each
to be either DECIMAL-GUARDED or explicitly whitelisted as
STRUCTURALLY BOUNDED with a recorded reason.

Why this exists: the round-11 full-catalog sweep caught
`ab_cuped_adjustment` failing ONLY at sf0.1 — an ANSI multiplyExact
int64 overflow in a hash-agg output (sum(v)^2 crossed 2^63 at 10x the
driver-gate scale while every smaller-scale check was green).  A manual
audit then found ten more sites within 1.3-100x of the same cliff
(n^2 rank sums, n^3 rank-diff moments, quadratic-in-volume daily
counts, micro/nano-quantized products) and moved them to exact
DECIMAL(38,0) moments.  This tool re-runs that audit mechanically on
every suite run (tests/test_round11.py::test_overflow_audit_clean), so
the bug class cannot silently re-enter with a new query.

Detection: AST scan of every plans/operators module for
`F.sum(<a> * <b>)` where the product is not decimal-guarded.  A site is
DECIMAL-GUARDED when either operand is a literal `.cast("decimal…")`
call or a local name whose assignment (in the same function) contains a
decimal cast — the two idioms the hardened queries use.  Everything
else must appear in BOUNDED with a headroom reason, or the audit fails.

Scope notes: linear-law sums of RAW columns (`F.sum("cents")`) are not
flagged — a linear int64 sum of bounded-quanta values holds to ~1e17
rows and the cents helpers document that; the overflow class this
audit guards is PRODUCTS inside sums (quanta multiply) and is exactly
what the round-11 finds were.  Products of two aggregate RESULTS
(sum*sum, n*sum) are expression-level and were hardened alongside their
sums; they only arise next to a flagged/whitelisted site, so the
per-site review covers them.
"""

from __future__ import annotations

import ast
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "real_time_big_data_iot_monitoring_pipeline_spark")
SCAN_DIRS = ("plans", "operators", "streaming", "functions", "sources")

# (module, enclosing function) -> reason the int64 formulation is safe.
# Every entry must state the BOUND, not just assert safety.
BOUNDED: dict[tuple[str, str], str] = {
    ("plans/analytics_queries.py", "acf_hourly_means"): (
        "hour-grid moments: np = #hours, m = cent-scale hourly mean — "
        "np*sxx < 2^53 through ~1e8 hours (docstring headroom note)"
    ),
    ("plans/analytics_queries.py", "xcorr_click_purchase"): (
        "hour-grid moments over per-hour event COUNTS — counts are "
        "hours-scale, products bounded by traffic-per-hour, not corpus size"
    ),
    ("plans/analytics_queries.py", "conformal_forecast_interval"): (
        "OLS over i < 20 daily index points per type (fit window is a "
        "fixed 20-day slice) — 20-row regression, products < 1e11"
    ),
    ("plans/analytics_queries.py", "poisson_bootstrap_ci"): (
        "sum(w*cents): w is Poisson(1)-ish (<= ~8), linear law — "
        "< ~1e18 at 1e12 rows of 1e5-cent values"
    ),
    ("plans/analytics_queries.py", "cluster_bootstrap_ci"): (
        "same replicate-weighted linear law as poisson_bootstrap_ci"
    ),
    ("plans/engine_queries.py", "layout_hilbert_stats"): (
        "bbox spans: sc <= #custkeys, sd <= #days — area < 5e10 per "
        "file, 64 files per layout"
    ),
    ("plans/matching_queries.py", "entity_match_candidates"): (
        "cnt_l*cnt_r per matched NAME pair — bounded by per-name "
        "frequency, not corpus size"
    ),
    ("plans/matching_queries.py", "entity_match_sorted_neighborhood"): (
        "same name-frequency pair-count bound"
    ),
    ("plans/pipeline_queries.py", "_pad_waste_for_k"): (
        "mx*n_docs per bucket: token totals are linear in corpus — "
        "~2.5e13 tokens at 100 TB, far under 2^63"
    ),
    ("plans/pipeline_queries.py", "heaps_law_vocab_growth"): (
        "micro-nat OLS over <= dozens of training checkpoints — "
        "n is checkpoint count, products < 1e16"
    ),
}

def _module_decimal_consts(tree: ast.AST) -> set[str]:
    """Module-level names bound to a 'decimal…' string (the `_DEC =
    "decimal(38,0)"` idiom) — casts to these count as decimal casts."""
    out: set[str] = set()
    for node in getattr(tree, "body", ()):
        if (
            isinstance(node, ast.Assign)
            and isinstance(node.value, ast.Constant)
            and isinstance(node.value.value, str)
            and node.value.value.startswith("decimal")
        ):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    out.add(tgt.id)
    return out


def _has_decimal_cast(node: ast.AST, const_names: frozenset = frozenset()) -> bool:
    for sub in ast.walk(node):
        if (
            isinstance(sub, ast.Call)
            and isinstance(sub.func, ast.Attribute)
            and sub.func.attr == "cast"
            and sub.args
        ):
            a = sub.args[0]
            if (
                isinstance(a, ast.Constant)
                and isinstance(a.value, str)
                and a.value.startswith("decimal")
            ):
                return True
            if isinstance(a, ast.Name) and a.id in const_names:
                return True
    return False


def _decimal_names(func: ast.AST, const_names: frozenset) -> set[str]:
    """Local names whose assignment contains a decimal cast (the
    `xd = F.col("x").cast("decimal(38,0)")` idiom, incl. tuple unpack
    and the `dec = lambda …` helper applied at the call site)."""
    names: set[str] = set()
    for sub in ast.walk(func):
        if isinstance(sub, ast.Assign) and _has_decimal_cast(sub.value, const_names):
            for tgt in sub.targets:
                for n in ast.walk(tgt):
                    if isinstance(n, ast.Name):
                        names.add(n.id)
    return names


def _is_guarded(mult: ast.BinOp, dec_names: set[str], const_names: frozenset) -> bool:
    def side_ok(n: ast.AST) -> bool:
        if _has_decimal_cast(n, const_names):
            return True
        # application of a decimal-bound name or decimal-cast lambda:
        # dec(F.col("x")) / xd / xd2 …
        for sub in ast.walk(n):
            if isinstance(sub, ast.Name) and sub.id in dec_names:
                return True
        return False

    return side_ok(mult.left) or side_ok(mult.right)


def scan() -> dict:
    flagged, guarded, bounded = [], [], []
    for d in SCAN_DIRS:
        root = os.path.join(PKG, d)
        if not os.path.isdir(root):
            continue
        for fn in sorted(os.listdir(root)):
            if not fn.endswith(".py"):
                continue
            rel = f"{d}/{fn}"
            src = open(os.path.join(root, fn)).read()
            tree = ast.parse(src)
            const_names = frozenset(_module_decimal_consts(tree))
            for func in ast.walk(tree):
                if not isinstance(func, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    continue
                dec_names = _decimal_names(func, const_names)
                for node in ast.walk(func):
                    if not (
                        isinstance(node, ast.Call)
                        and isinstance(node.func, ast.Attribute)
                        and node.func.attr == "sum"
                        and isinstance(node.func.value, ast.Name)
                        and node.func.value.id == "F"
                        and node.args
                        and isinstance(node.args[0], ast.BinOp)
                        and isinstance(node.args[0].op, ast.Mult)
                    ):
                        continue
                    site = {"file": rel, "function": func.name, "line": node.lineno}
                    if _is_guarded(node.args[0], dec_names, const_names):
                        guarded.append(site)
                    elif (rel, func.name) in BOUNDED:
                        bounded.append({**site, "reason": BOUNDED[(rel, func.name)]})
                    else:
                        flagged.append(site)
    return {
        "n_guarded": len(guarded),
        "n_bounded": len(bounded),
        "n_flagged": len(flagged),
        "guarded": guarded,
        "bounded": bounded,
        "flagged": flagged,
    }


def main() -> None:
    out = scan()
    print(
        f"integer sum-of-products sites: {out['n_guarded']} decimal-guarded, "
        f"{out['n_bounded']} bounded-by-structure, {out['n_flagged']} FLAGGED"
    )
    if "--json" in sys.argv:
        print(json.dumps(out, indent=1))
    for s in out["flagged"]:
        print(f"  FLAGGED {s['file']}:{s['line']} in {s['function']} — harden to "
              "decimal(38,0) or whitelist with a bound")
    sys.exit(1 if out["flagged"] else 0)


if __name__ == "__main__":
    main()

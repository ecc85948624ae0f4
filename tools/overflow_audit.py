#!/usr/bin/env python
"""Integer-overflow scale audit (round-11, extended round-12): find every
integer sum-of-products aggregation site in the catalog source and require
each to be either DECIMAL-GUARDED, SPLIT-ACCUMULATED with a recorded
row-product bound, or explicitly whitelisted as STRUCTURALLY BOUNDED with
a recorded reason.

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

Detection, three site classes (round-11 verdict "What's wrong #3": the
split-sum rewrite made the revenue sites invisible to the original
F.sum(a*b) scan — 48 recorded vs 39 seen):
  1. `F.sum(<a> * <b>)` — must be decimal-guarded (either operand
     carries a decimal cast, directly or through a local name) or
     whitelisted in BOUNDED.
  2. `sum_product_exact(<product>)` — the split-accumulator path
     (functions/scalars.py): EXACT past 2^63 only under its
     preconditions (row product >= 0 and < 2^53), so EVERY call site
     must carry a recorded row-product bound in SPLIT_BOUNDED; an
     unlisted call site fails the audit.
  3. Whitelists are keyed by (module, function, product-source-text)
     (round-11 ADVICE #2: a (module, function) key let a NEW unguarded
     product inside an already-whitelisted function pass silently) —
     adding a multiply to a whitelisted function flags until its exact
     expression text is reviewed and recorded.

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

# (module, function, product source text) -> reason the int64
# formulation is safe.  Every entry must state the BOUND, not just
# assert safety; the product text pins the exact reviewed expression.
_HOUR_GRID = (
    "hour-grid moments: per-hour means/counts are hours-scale, "
    "products bounded by traffic-per-hour, not corpus size"
)
BOUNDED: dict[tuple[str, str, str], str] = {
    ("plans/analytics_queries.py", "acf_hourly_means", "F.col('x') * F.col('x')"): (
        "np*sxx < 2^53 through ~1e8 hours (docstring headroom note): " + _HOUR_GRID
    ),
    ("plans/analytics_queries.py", "acf_hourly_means", "F.col('y') * F.col('y')"): _HOUR_GRID,
    ("plans/analytics_queries.py", "acf_hourly_means", "F.col('x') * F.col('y')"): _HOUR_GRID,
    ("plans/analytics_queries.py", "xcorr_click_purchase", "F.col('x') * F.col('x')"): _HOUR_GRID,
    ("plans/analytics_queries.py", "xcorr_click_purchase", "F.col('y') * F.col('y')"): _HOUR_GRID,
    ("plans/analytics_queries.py", "xcorr_click_purchase", "F.col('x') * F.col('y')"): _HOUR_GRID,
    ("plans/analytics_queries.py", "conformal_forecast_interval", "F.col('i') * F.col('i')"): (
        "OLS over i < 20 daily index points per type (fit window is a "
        "fixed 20-day slice) — 20-row regression, products < 1e11"
    ),
    ("plans/analytics_queries.py", "conformal_forecast_interval", "F.col('i') * F.col('m6')"): (
        "same fixed 20-day fit window; m6 is micro-scaled cents mean < 1e12"
    ),
    ("plans/analytics_queries.py", "poisson_bootstrap_ci", "F.col('w') * F.col('cents')"): (
        "sum(w*cents): w is Poisson(1)-ish (<= ~8), linear law — "
        "< ~1e18 at 1e12 rows of 1e5-cent values"
    ),
    ("plans/analytics_queries.py", "cluster_bootstrap_ci", "F.col('w') * F.col('cents')"): (
        "same replicate-weighted linear law as poisson_bootstrap_ci"
    ),
    ("plans/engine_queries.py", "layout_hilbert_stats", "F.col('sc') * F.col('sd')"): (
        "bbox spans: sc <= #custkeys, sd <= #days — area < 5e10 per "
        "file, 64 files per layout"
    ),
    ("plans/matching_queries.py", "entity_match_candidates", "F.col('cnt_l') * F.col('cnt_r')"): (
        "cnt_l*cnt_r per matched NAME pair — bounded by per-name "
        "frequency, not corpus size"
    ),
    (
        "plans/matching_queries.py",
        "entity_match_sorted_neighborhood",
        "F.col('cnt_l') * F.col('cnt_r')",
    ): "same name-frequency pair-count bound",
    ("plans/pipeline_queries.py", "_pad_waste_for_k", "F.col('mx') * F.col('n_docs')"): (
        "mx*n_docs per bucket: token totals are linear in corpus — "
        "~2.5e13 tokens at 100 TB, far under 2^63"
    ),
    ("plans/pipeline_queries.py", "heaps_law_vocab_growth", "F.col('x6') * F.col('y6')"): (
        "micro-nat OLS over <= dozens of training checkpoints — "
        "n is checkpoint count, products < 1e16"
    ),
    ("plans/pipeline_queries.py", "heaps_law_vocab_growth", "F.col('x6') * F.col('x6')"): (
        "same checkpoint-count bound"
    ),
}

# (module, function, product source text) -> the recorded ROW-PRODUCT
# bound for a `sum_product_exact` call site.  The split accumulator is
# exact past 2^63 ONLY under product >= 0 and product < 2^53 per row
# (functions/scalars.py::sum_product_exact); every call site must
# record why its product satisfies both, or the audit fails.
_REV_BOUND = (
    "TPC-H revenue quanta: extendedprice cents <= ~1.1e7, factor "
    "(100-disc) in [90,100] — product in [0, ~1.1e9] < 2^53, >= 0"
)
SPLIT_BOUNDED: dict[tuple[str, str, str], str] = {
    (
        "plans/extension_queries.py",
        "revenue_filter_agg",
        "as_cents(F.col('l_extendedprice')) * as_cents(F.col('l_discount'))",
    ): (
        "price cents <= ~1.1e7, discount cents in [0,10] — product "
        "in [0, ~1.1e8] < 2^53, >= 0"
    ),
    (
        "plans/extension_queries.py",
        "unshipped_orders_topk",
        "as_cents(F.col('l_extendedprice')) * (100 - as_cents(F.col('l_discount')))",
    ): _REV_BOUND,
    (
        "plans/extension_queries.py",
        "returned_items_report",
        "as_cents(F.col('l_extendedprice')) * (100 - as_cents(F.col('l_discount')))",
    ): _REV_BOUND,
    (
        "plans/extension_queries.py",
        "volume_shipping",
        "as_cents(F.col('l_extendedprice')) * (100 - as_cents(F.col('l_discount')))",
    ): _REV_BOUND,
    (
        "plans/incremental_queries.py",
        "_join_partials",
        "as_cents(F.col('l_extendedprice')) * (100 - as_cents(F.col('l_discount')))",
    ): _REV_BOUND,
    (
        "plans/join_queries.py",
        "join_star_revenue",
        "as_cents(F.col('l_extendedprice')) * (100 - as_cents(F.col('l_discount')))",
    ): _REV_BOUND,
    ("plans/join_queries.py", "pricing_summary", "epc * (100 - dc)"): _REV_BOUND,
    ("plans/join_queries.py", "pricing_summary", "epc * (100 - dc) * (100 + tc)"): (
        "price cents <= ~1.1e7, (100-disc) <= 100, (100+tax) <= 108 — "
        "product in [0, ~1.2e11] < 2^53, >= 0"
    ),
    (
        "plans/skew_queries.py",
        "salted_join_brand_revenue",
        "as_cents(F.col('l_extendedprice')) * (100 - as_cents(F.col('l_discount')))",
    ): _REV_BOUND,
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
    flagged, guarded, bounded, split_ok, split_flagged = [], [], [], [], []
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
                    if not isinstance(node, ast.Call):
                        continue
                    # class 2: split-accumulator call sites — every one
                    # must carry a recorded row-product bound
                    if (
                        isinstance(node.func, ast.Name)
                        and node.func.id == "sum_product_exact"
                        and node.args
                    ):
                        product = ast.unparse(node.args[0])
                        site = {
                            "file": rel,
                            "function": func.name,
                            "line": node.lineno,
                            "product": product,
                        }
                        key = (rel, func.name, product)
                        if key in SPLIT_BOUNDED:
                            split_ok.append({**site, "bound": SPLIT_BOUNDED[key]})
                        else:
                            split_flagged.append(site)
                        continue
                    # class 1: integer sum-of-products
                    if not (
                        isinstance(node.func, ast.Attribute)
                        and node.func.attr == "sum"
                        and isinstance(node.func.value, ast.Name)
                        and node.func.value.id == "F"
                        and node.args
                        and isinstance(node.args[0], ast.BinOp)
                        and isinstance(node.args[0].op, ast.Mult)
                    ):
                        continue
                    product = ast.unparse(node.args[0])
                    site = {
                        "file": rel,
                        "function": func.name,
                        "line": node.lineno,
                        "product": product,
                    }
                    key = (rel, func.name, product)
                    if _is_guarded(node.args[0], dec_names, const_names):
                        guarded.append(site)
                    elif key in BOUNDED:
                        bounded.append({**site, "reason": BOUNDED[key]})
                    else:
                        flagged.append(site)
    # stale-whitelist sweep: an entry whose site no longer exists means
    # the reviewed expression changed — fail loudly so the record stays
    # honest (dead entries would otherwise hide a rewritten product)
    live_b = {(s["file"], s["function"], s["product"]) for s in bounded}
    live_s = {(s["file"], s["function"], s["product"]) for s in split_ok}
    stale = sorted(
        [list(k) for k in BOUNDED if k not in live_b]
        + [list(k) for k in SPLIT_BOUNDED if k not in live_s]
    )
    return {
        "n_guarded": len(guarded),
        "n_bounded": len(bounded),
        "n_split_bounded": len(split_ok),
        "n_flagged": len(flagged) + len(split_flagged),
        "n_stale_whitelist": len(stale),
        "guarded": guarded,
        "bounded": bounded,
        "split_bounded": split_ok,
        "flagged": flagged,
        "split_flagged": split_flagged,
        "stale_whitelist": stale,
    }


def main() -> None:
    out = scan()
    print(
        f"integer sum-of-products sites: {out['n_guarded']} decimal-guarded, "
        f"{out['n_bounded']} bounded-by-structure, "
        f"{out['n_split_bounded']} split-accumulated-with-recorded-bound, "
        f"{out['n_flagged']} FLAGGED, {out['n_stale_whitelist']} stale whitelist"
    )
    if "--json" in sys.argv:
        print(json.dumps(out, indent=1))
    for s in out["flagged"]:
        print(f"  FLAGGED {s['file']}:{s['line']} in {s['function']} — harden to "
              "decimal(38,0) or whitelist with a bound")
    for s in out["split_flagged"]:
        print(f"  FLAGGED {s['file']}:{s['line']} in {s['function']} — "
              "sum_product_exact site without a recorded row-product bound "
              "(product >= 0 and < 2^53 per row): add to SPLIT_BOUNDED")
    for k in out["stale_whitelist"]:
        print(f"  STALE whitelist entry {k} — site gone or expression changed")
    sys.exit(1 if out["flagged"] or out["split_flagged"] or out["stale_whitelist"] else 0)


if __name__ == "__main__":
    main()

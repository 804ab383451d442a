#!/usr/bin/env python
"""Render FUZZREPORT lines (tests/test_fuzz.py, FA_FUZZ_REPORT=1) as the
markdown table recorded in docs/PARITY.md — the analog of the reference
internal test's error-rate report (internal_test.cu:289-317).

Usage: python tools/fuzz_table.py <logfile> [<logfile> ...]
"""

import re
import sys

ROW = re.compile(
    r"FUZZREPORT case=(\S+) dims=(\d) dtype=(\S+) runs=(\d+) "
    r"worst_ratio\(abs_err\): (.*)")


def main(paths):
    rows = {}
    for path in paths:
        for line in open(path):
            m = ROW.search(line)
            if not m:
                continue
            case, dims, dtype, runs, cols = m.groups()
            vals = dict(re.findall(r"(\w+)=([0-9.]+)\(([-0-9.e+]+)\)", cols)
                        and [(k, (float(r), float(e))) for k, r, e in
                             re.findall(r"(\w+)=([0-9.]+)\(([-0-9.e+]+)\)",
                                        cols)])
            rows[(dims, dtype, case)] = (runs, vals)
    print("| case | dims | dtype | runs | worst O | worst dQ | worst dK "
          "| worst dV | verdict |")
    print("|---|---|---|---|---|---|---|---|---|")
    for (dims, dtype, case), (runs, vals) in sorted(rows.items()):
        def fmt(k):
            if k not in vals:
                return "—"
            r, e = vals[k]
            return f"{r:.3f}x ({e:.1e})"
        worst = max(v[0] for v in vals.values())
        print(f"| {case} | {dims}d | {dtype} | {runs} | {fmt('O')} | "
              f"{fmt('dQ')} | {fmt('dK')} | {fmt('dV')} | "
              f"{'PASS' if worst < 1 else 'FAIL'} |")
    if rows:
        overall = max(v[0] for _, vals in rows.values() for v in vals.values())
        print(f"\nworst ratio anywhere: {overall:.3f} of tolerance "
              f"({len(rows)} case rows)")


if __name__ == "__main__":
    main(sys.argv[1:])

#!/usr/bin/env python3
"""Compare two BENCH_LAST.json artifacts, host-noise aware.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [threshold]

Implements the BASELINE.md "Host-noise telemetry" rules:
  - min-to-min comparison on the common query set (the grading contract);
  - rows in either artifact's `stall_suspect` list are reported
    separately, not counted as regressions;
  - when both artifacts carry `cal_par_sec`, per-query ratios are also
    shown normalized by the host-speed ratio, because the box drifts
    uniformly (r16: 1.3-2x across all queries, steal ~= 0) between days.

A query "regresses" when its normalized ratio exceeds `threshold`
(default 2.0) AND it is not stall-suspect in either run.
Exit code 1 if any such regression exists.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    suspects = set(old.get("stall_suspect", [])) | set(new.get("stall_suspect", []))

    cal_o, cal_n = old.get("cal_par_sec"), new.get("cal_par_sec")
    host = (cal_n / cal_o) if (cal_o and cal_n) else None
    if host:
        print(f"host speed ratio (new/old cal_par): {host:.3f} "
              f"(old {cal_o:.3f}s, new {cal_n:.3f}s)")
    else:
        print("no cal_par_sec in one or both artifacts: raw ratios only")

    if not common:
        print("no common queries between the two artifacts: nothing to compare")
        return 2
    total_o = sum(oq[k] for k in common)
    total_n = sum(nq[k] for k in common)
    if total_o <= 0:
        print("old artifact's common-set total is 0s: ratios undefined")
        return 2
    print(f"common set: {len(common)} queries; total {total_o:.2f}s -> "
          f"{total_n:.2f}s (raw x{total_n / total_o:.2f}"
          + (f", host-normalized x{total_n / total_o / host:.2f})" if host else ")"))

    regressions, suspect_rows = [], []
    for k in common:
        if oq[k] <= 0:
            continue
        raw = nq[k] / oq[k]
        norm = raw / host if host else raw
        if norm > threshold:
            (suspect_rows if k in suspects else regressions).append((norm, raw, k))

    for norm, raw, k in sorted(regressions, reverse=True):
        print(f"REGRESSION {k}: {oq[k]:.3f}s -> {nq[k]:.3f}s "
              f"(raw x{raw:.2f}, normalized x{norm:.2f})")
    for norm, raw, k in sorted(suspect_rows, reverse=True):
        print(f"stall-suspect (not counted) {k}: {oq[k]:.3f}s -> {nq[k]:.3f}s "
              f"(raw x{raw:.2f}, normalized x{norm:.2f})")
    if not regressions:
        print(f"no regressions above x{threshold} (normalized, non-suspect)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())

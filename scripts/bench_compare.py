#!/usr/bin/env python3
"""Round-over-round bench comparison with the measured noise floor built in.

Usage: python3 scripts/bench_compare.py <old.json> <new.json> [noise_ratio]

Accepts either the full-fidelity file (bench_full_last.json /
target/bench_full.json — per-query medians under "queries") or the
driver's compact BENCH_r{N}.json tail line. Reports:

  - total and batch/streaming subtotal ratios (subtotals only when both
    files carry them), calibration-normalized when both carry calib_sec;
  - per-query ratios BEYOND the noise floor only. The floor defaults to
    1.7x: round 13 re-ran byte-identical code and per-query ratios
    scattered 0.67x-1.69x (s08 1.69x, q153 1.68x) on pure host weather,
    so a single-round per-query ratio under ~1.7x carries no signal on
    this host. Queries slower than the floor AND >0.2s absolute delta
    are listed as suspects; everything else is noise by measurement.

Exit code: number of suspect regressions, clamped to 100 (0 = clean;
120 = usage error).
"""
import json
import sys


def load(path):
    """Returns (doc, per-query medians, full_fidelity) - full_fidelity is
    False for compact driver tails, whose "slowest" top-20 is NOT the
    full query set (so scope diffs against it would be wrong)."""
    with open(path) as f:
        d = json.load(f)
    # driver BENCH_r{N}.json wraps the parsed tail line under "parsed"
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    qs = d.get("queries", {})
    full = bool(qs)
    # full-fidelity: {"q01_...": {"median": 1.2, ...}}; compact tails
    # carry only "slowest" with short keys - usable but partial
    if qs and isinstance(next(iter(qs.values())), dict):
        qs = {k: v["median"] for k, v in qs.items()}
    elif not qs:
        qs = d.get("slowest", {})
    return d, {k: v for k, v in qs.items() if isinstance(v, (int, float)) and v >= 0}, full


def calib(d):
    cs = d.get("calib_sec") or [d.get("calib_sec_start", -1), d.get("calib_sec_end", -1)]
    cs = [c for c in cs if isinstance(c, (int, float)) and c > 0]
    return sum(cs) / len(cs) if cs else None


def main():
    if len(sys.argv) < 3:
        # 120: outside any plausible suspect count, so a wrapper reading
        # the exit code as "number of regressions" can't confuse a usage
        # error with findings
        print(__doc__, file=sys.stderr)
        return 120
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.7
    old_d, old_q, old_full = load(sys.argv[1])
    new_d, new_q, new_full = load(sys.argv[2])

    ov, nv = old_d.get("value", -1), new_d.get("value", -1)
    # both sides must carry a total: a new file without "value" (nv=-1)
    # would otherwise print a negative ratio
    print(f"total: {ov:.1f}s -> {nv:.1f}s  ({nv / ov:.3f}x)"
          if ov > 0 and nv > 0 else "total: n/a")
    oc, nc = calib(old_d), calib(new_d)
    if oc and nc and ov > 0 and nv > 0:
        print(f"calib-normalized: {ov / oc:.1f} -> {nv / nc:.1f}  "
              f"({(nv / nc) / (ov / oc):.3f}x; host speed ratio {nc / oc:.3f}x)")
    for cls in ("batch", "streaming"):
        o = (old_d.get("subtotals") or {}).get(cls)
        n = (new_d.get("subtotals") or {}).get(cls)
        if o and n and o["value"] > 0:
            print(f"{cls}: {o['value']:.1f}s ({o['nq']}q) -> {n['value']:.1f}s ({n['nq']}q)  "
                  f"({n['value'] / o['value']:.3f}x, spread {n['spread']:.1f}s)")

    shared = sorted(set(old_q) & set(new_q))
    print(f"\nper-query ({len(shared)} shared; noise floor {floor}x, "
          f"listing ratio>{floor} AND delta>0.2s):")
    suspects = []
    for k in shared:
        o, n = old_q[k], new_q[k]
        if o > 0 and n / o > floor and n - o > 0.2:
            suspects.append((n / o, k, o, n))
    for r, k, o, n in sorted(suspects, reverse=True):
        print(f"  SUSPECT {k}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    if not suspects:
        print("  none beyond the noise floor")
    # scope diff only when BOTH sides carry the full query set: on
    # compact tails, set differences are top-20 membership churn, not
    # added/removed queries
    new_only = sorted(set(new_q) - set(old_q)) if (old_full and new_full) else []
    if new_only:
        tot = sum(new_q[k] for k in new_only)
        print(f"\nnew queries ({len(new_only)}, {tot:.1f}s total): "
              + ", ".join(f"{k}={new_q[k]:.2f}s" for k in new_only))
    # clamp below the 120 usage-error sentinel and the shell's mod-256
    # wrap (256 suspects would otherwise exit 0 = clean)
    return min(len(suspects), 100)


if __name__ == "__main__":
    sys.exit(main())

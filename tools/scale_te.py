#!/usr/bin/env python3
"""Recompute scale exponents (with error bars) from SCALE_BENCH json
artifacts, and check cross-artifact agreement.

Usage:
  python3 tools/scale_te.py ARTIFACT.json            # per-shape te ± spread
  python3 tools/scale_te.py A.json B.json            # agreement verdict

Every r18+ artifact carries per-run work arrays (runs_cpu_ms /
runs_task_ms) at every scale point, so the exponent is a pure function
of the committed file:

  te     = ln(med(cpu_hi) / med(cpu_mid)) / ln(n/m)
  spread = (ln(max/min at hi) + ln(max/min at mid)) / (2 ln(n/m))

The agreement contract for two same-code artifacts is
|te_a - te_b| <= spread_a + spread_b — the spread is the measured
within-run sample dispersion (shared-box CPU weather: bandwidth,
frequency, JIT state), which bounds how far two medians of 3 can
legitimately land apart. A violation means the CODE's work profile
changed, not the weather. Exit 2 on any violation in compare mode.
"""
import json
import math
import sys


def series_of(block, field):
    return [x for x in (block.get(field) or []) if x]


def med(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def pick_series(mid, hi):
    """ONE series choice for both endpoints, mirroring ScaleBench's
    useCpu logic: cpu only when BOTH mid and hi carry it, else task for
    both. A per-point fallback would mix CPU and wall-task series in
    one exponent and disagree with the artifact's own teMid."""
    cpu_mid = series_of(mid, "runs_cpu_ms")
    cpu_hi = series_of(hi, "runs_cpu_ms")
    if cpu_mid and cpu_hi:
        return cpu_mid, cpu_hi
    return series_of(mid, "runs_task_ms"), series_of(hi, "runs_task_ms")


def te_of(shape):
    n = shape.get("copies")
    mid = shape.get("mid")
    hi = shape.get("x%d" % n) if n else None
    if not (mid and hi and n):
        return None
    m = mid.get("copies")
    s_mid, s_hi = pick_series(mid, hi)
    if not (s_mid and s_hi and m and m < n):
        return None
    lnr = math.log(n / m)
    te = math.log(med(s_hi) / med(s_mid)) / lnr
    spread = (math.log(max(s_hi) / min(s_hi)) +
              math.log(max(s_mid) / min(s_mid))) / (2 * lnr)
    return te, spread


def regime_of(shape):
    """Machine-readable mid-regime indicator: prefers the artifact's
    own mid_regime field (r19+); recomputes the same rule for older
    artifacts. The mid point is 'overhead' when its measured work is
    under 30% of ideal linear growth from x1 (mid work < 0.3 * m * x1
    work) — there the mid->hi exponent is the MARGINAL exponent taken
    right at fixed-cost exit and reads high even for linear shapes."""
    if shape.get("mid_regime"):
        return shape["mid_regime"]
    n = shape.get("copies")
    mid = shape.get("mid")
    x1 = shape.get("x1")
    hi = shape.get("x%d" % n) if n else None
    if not (mid and x1 and hi):
        return "?"
    m = mid.get("copies")
    s_mid, _ = pick_series(mid, hi)
    s_x1, _ = pick_series(x1, hi)
    if not (s_mid and s_x1 and m):
        return "?"
    return "overhead" if med(s_mid) < 0.3 * m * med(s_x1) else "in-regime"


def main():
    paths = sys.argv[1:]
    if not paths:
        sys.exit(__doc__)
    arts = [json.load(open(p)) for p in paths]
    if len(arts) == 1:
        for name, s in sorted(arts[0]["shapes"].items()):
            r = te_of(s)
            if r:
                print("%-24s te=%.3f ± %.3f  mid:%s"
                      % (name, r[0], r[1], regime_of(s)))
            else:
                print("%-24s (no mid-basis data)" % name)
        return
    a, b = arts[0], arts[1]
    bad = 0
    both = sorted(set(a["shapes"]) & set(b["shapes"]))
    for name in both:
        ra, rb = te_of(a["shapes"][name]), te_of(b["shapes"][name])
        if not (ra and rb):
            print("%-24s (missing data in one artifact)" % name)
            continue
        (ta, sa), (tb, sb) = ra, rb
        d, bound = abs(ta - tb), sa + sb
        ok = d <= bound
        if not ok:
            bad += 1
        print("%-24s %.3f±%.3f vs %.3f±%.3f  |d|=%.3f %s %.3f  %s" % (
            name, ta, sa, tb, sb, d, "<=" if ok else ">", bound,
            "ok" if ok else "VIOLATION"))
    print("%d/%d shapes agree within stated uncertainty" %
          (len(both) - bad, len(both)))
    sys.exit(2 if bad else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Cross-round per-entry comparison, raw AND sentinel-normalized.

The r12 verdict derived "0.86 median = 0.81 box + ~1.05 code" by hand;
this makes the decomposition mechanical (VERDICT r12 item 4). Both
artifacts must carry `sentinel_ratio` (every close since r12 does):
the ratio of the runs' sentinel ratios estimates the box-speed delta,
so  normalized = (new/old) / (sent_new/sent_old)  isolates code+plan
movement from the box hour.

Usage: normalized_compare.py OLD.json NEW.json [topN]
"""
import json
import sys


def main() -> None:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    so, sn = old.get("sentinel_ratio"), new.get("sentinel_ratio")
    if not so or not sn:
        sys.exit("both artifacts need sentinel_ratio (post-r12 closes)")
    box = sn / so
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    rows = []
    for k in common:
        if qo[k] <= 0:
            continue
        raw = qn[k] / qo[k]
        rows.append((k, qo[k], qn[k], raw, raw / box))
    rows.sort(key=lambda r: r[4])
    raws = sorted(r[3] for r in rows)
    norms = sorted(r[4] for r in rows)
    med = lambda xs: xs[len(xs) // 2]
    print(f"common entries: {len(rows)}  box factor (sent {sn}/{so}): "
          f"{box:.3f}")
    print(f"sum old {sum(r[1] for r in rows):.1f}s  new "
          f"{sum(r[2] for r in rows):.1f}s  "
          f"raw median {med(raws):.3f}  normalized median {med(norms):.3f}")
    hdr = f"{'entry':-<34} {'old':>7} {'new':>7} {'raw':>6} {'norm':>6}"
    print(hdr)
    for r in rows[:top_n]:
        print(f"{r[0]:<34} {r[1]:7.2f} {r[2]:7.2f} {r[3]:6.2f} {r[4]:6.2f}")
    print("...")
    for r in rows[-top_n:]:
        print(f"{r[0]:<34} {r[1]:7.2f} {r[2]:7.2f} {r[3]:6.2f} {r[4]:6.2f}")


if __name__ == "__main__":
    main()

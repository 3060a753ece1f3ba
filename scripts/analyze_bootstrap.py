#!/usr/bin/env python
"""Aggregate explore_bootstrap.py outputs into advantage-vs-protocol
tables (VERDICT r3 next-round #2).

For every (framework, seed) curve file, computes

    adv(k, e) = max(ft_from_k[k][:e]) - max(ft_from_random[:e])

i.e. the Hebbian bootstrap advantage under a best-val-by-epoch-e
protocol (the reference selects by best val Dice — train_sup_2d.py's
best_JI snapshot — so max-so-far is the faithful readout).  Prints a
per-(k, e) table of mean±std and n_positive per framework, then the
protocol cells where the torch reference is reliably positive, with the
hebbax value at the same cell — the done-criterion comparison.

Usage:
  python scripts/analyze_bootstrap.py /tmp/sweep_r4/explore_*.json \
      /tmp/explore_*_s0.json [--cutoffs 3 5 8 10 20] [--json OUT]
"""

import argparse
import json
import statistics


def load(paths):
    cells = {}
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        cfg, res = doc["config"], doc["result"]
        fw, seed = cfg["framework"], cfg["seed"]
        key = (cfg.get("noise", 0.5), cfg.get("label_frac", 0.05),
               cfg.get("ft_lr", 1e-3))
        cells.setdefault(key, {}).setdefault(fw, {})[seed] = res
    return cells


def adv(res, k, e):
    ftk = res["ft_from_k"].get(str(k))
    if ftk is None:
        return None
    e = min(e, len(ftk), len(res["ft_from_random"]))
    return max(ftk[:e]) - max(res["ft_from_random"][:e])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--cutoffs", nargs="+", type=int,
                    default=[2, 3, 4, 5, 6, 8, 10, 15, 20])
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    out = {}
    for key, fws in sorted(load(args.paths).items()):
        print(f"\n=== protocol noise={key[0]} frac={key[1]} "
              f"ft_lr={key[2]} ===")
        ks = sorted({int(k) for fw in fws.values() for r in fw.values()
                     for k in r["ft_from_k"]})
        for fw in sorted(fws):
            seeds = sorted(fws[fw])
            print(f"[{fw}] seeds={seeds}")
            for k in ks:
                row = []
                for e in args.cutoffs:
                    a = [adv(fws[fw][s], k, e) for s in seeds]
                    a = [x for x in a if x is not None]
                    if not a:
                        row.append("      -      ")
                        continue
                    m = statistics.mean(a)
                    sd = statistics.stdev(a) if len(a) > 1 else 0.0
                    npos = sum(x > 0 for x in a)
                    row.append(f"{m:+.3f}±{sd:.3f}({npos}/{len(a)})")
                    out.setdefault(str(key), {}).setdefault(
                        fw, {}).setdefault(str(k), {})[str(e)] = {
                        "mean": round(m, 4), "std": round(sd, 4),
                        "n_positive": npos, "n": len(a),
                        "advantages": [round(x, 4) for x in a]}
                print(f"  k={k:>3}  " + "  ".join(row))
            print("  cutoffs: " + "  ".join(f"e={e:<12}"
                                            for e in args.cutoffs))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()

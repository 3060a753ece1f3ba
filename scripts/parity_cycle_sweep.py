#!/usr/bin/env python
"""Multi-seed Hebbian bootstrap-advantage sweep (VERDICT r3 next-round #2).

Runs scripts/parity_hebbian_cycle.py across seeds on the TEXTURE
dataset (orientation-only cue — the regime where from-random fine-tuning
at 5% labels does NOT saturate, so the bootstrap advantage has headroom)
in BOTH frameworks, then aggregates per-framework advantage mean/std.

Done-criterion (VERDICT): the torch reference shows advantage reliably
> 0 and hebbax matches it within seed scatter.

Usage:
  python scripts/parity_cycle_sweep.py --seeds 0 1 2 3 4 \
      --out PARITY_CYCLE_r4.json [--label_frac 0.05] [--n_train 128]

Each seed's cycle is run in a SUBPROCESS (fresh backend) and its JSON
captured from stdout; intermediate results are flushed to --out after
every cell so a long sweep can be monitored / resumed-from.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cycle(seed, args, extra):
    cmd = [sys.executable, os.path.join(REPO, "scripts",
                                        "parity_hebbian_cycle.py"),
           "--data", "texture", "--seed", str(seed),
           "--label_frac", str(args.label_frac),
           "--n_train", str(args.n_train), "--n_val", str(args.n_val),
           "--pre_epochs", str(args.pre_epochs),
           "--ft_epochs", str(args.ft_epochs),
           "--out", args.tmp] + extra
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"cycle seed={seed} rc={r.returncode}")
    # the cycle prints progress lines starting with '#', then one JSON doc
    body = r.stdout[r.stdout.index("{"):]
    return json.loads(body)


def aggregate(cells, key):
    adv = [c[key]["hebbian_advantage"] for c in cells if key in c]
    if not adv:
        return None
    import statistics
    return {"advantages": adv,
            "mean": round(statistics.mean(adv), 4),
            "stdev": round(statistics.stdev(adv), 4) if len(adv) > 1
            else 0.0,
            "n_positive": sum(a > 0 for a in adv), "n": len(adv)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", nargs="+", type=int,
                   default=[0, 1, 2, 3, 4])
    p.add_argument("--label_frac", default=0.05, type=float)
    p.add_argument("--n_train", default=128, type=int)
    p.add_argument("--n_val", default=24, type=int)
    p.add_argument("--pre_epochs", default=20, type=int)
    p.add_argument("--ft_epochs", default=20, type=int)
    p.add_argument("--out", default="PARITY_CYCLE_r4.json")
    p.add_argument("--tmp", default="/tmp/parity_hebb_r4")
    p.add_argument("--skip_torch", action="store_true")
    p.add_argument("--skip_hebbax", action="store_true")
    args = p.parse_args()

    extra = []
    if args.skip_torch:
        extra.append("--skip_torch")
    if args.skip_hebbax:
        extra.append("--skip_hebbax")

    doc = {"protocol": {
        "data": "texture (orientation-only cue, no intensity cue)",
        "label_frac": args.label_frac, "n_train": args.n_train,
        "n_val": args.n_val, "pre_epochs": args.pre_epochs,
        "ft_epochs": args.ft_epochs,
        "reference_protocol":
            "reproduce_hebbian_semi_supervised_2d.sh:28-34 cycle "
            "(swta_t k=50 pretrain -> 5%-label fine-tune vs random)"},
        "cells": {}}
    for seed in args.seeds:
        doc["cells"][f"seed{seed}"] = run_cycle(seed, args, extra)
        doc["summary"] = {
            "hebbax": aggregate(doc["cells"].values(), "hebbax"),
            "torch_reference": aggregate(doc["cells"].values(),
                                         "torch_reference")}
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps(doc["summary"], indent=1), flush=True)


if __name__ == "__main__":
    main()

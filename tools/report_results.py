#!/usr/bin/env python
"""Aggregate experiment results across runs (replaces the reference's
show_2d.ipynb / show_3d.ipynb result-browsing notebooks): walks a runs/
tree, collects every test.csv and the val logs, and prints/saves
mean +/- std tables grouped by (dataset, phase, tag, inv_temp, regime).
"""

import argparse
import os

import numpy as np
import pandas as pd


def collect(exp_root):
    rows = []
    for dirpath, _, files in os.walk(exp_root):
        if "test.csv" not in files:
            continue
        df = pd.read_csv(os.path.join(dirpath, "test.csv"))
        rel = os.path.relpath(dirpath, exp_root)
        parts = rel.split(os.sep)
        # <dataset>/<phase>/<tag>/inv_temp-K/regime-R/run-S
        row = dict(df.iloc[0])
        keys = ["dataset", "phase", "tag", "inv_temp", "regime", "run"]
        for k, v in zip(keys, parts):
            row[k] = v.split("-", 1)[-1] if "-" in v and k in (
                "inv_temp", "regime", "run") else v
        rows.append(row)
    return pd.DataFrame(rows)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp_root", default="./runs")
    parser.add_argument("--out", default=None, help="optional summary csv")
    args = parser.parse_args(argv)
    df = collect(args.exp_root)
    if df.empty:
        print("no test.csv found under", args.exp_root)
        return df
    metrics = [c for c in df.columns if c.startswith("segm/")]
    group_keys = [k for k in ("dataset", "phase", "tag", "inv_temp",
                              "regime") if k in df.columns]
    summary = df.groupby(group_keys)[metrics].agg(["mean", "std", "count"])
    pd.set_option("display.width", 200)
    print(summary.round(4))
    if args.out:
        summary.to_csv(args.out)
    return summary


if __name__ == "__main__":
    main()

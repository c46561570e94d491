#!/usr/bin/env python
"""Aggregate run logs into a CSV.

Drop-in analogue of the reference's release_scripts/log2csv.py (:28-226): scans
run directories for python.log, scrapes the final metrics (our RunLogger emits
the same line grammar), and writes a CSV. Additionally consumes the structured
events.jsonl when present (preferred — no regex fragility).

Usage: python release_scripts/log2csv.py <run_dir> [<run_dir> ...] [-o out.csv]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

FIELDS = [
    "run", "test_psnr", "train_psnr", "num_3dgs", "max_hbm_gb", "host_gb",
    "total_time_s", "iterations", "throughput",
]


def from_events(path):
    m = {k: None for k in FIELDS[1:]}
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e["kind"] == "eval":
                m[f"{e['split']}_psnr"] = e["psnr"]
            elif e["kind"] == "densify":
                m["num_3dgs"] = e["num_3dgs"]
                m["max_hbm_gb"] = e["hbm_gb"]
                m["host_gb"] = e["host_gb"]
            elif e["kind"] == "end2end":
                m["total_time_s"] = e["total_time_s"]
                m["iterations"] = e["iterations"]
                m["throughput"] = e["throughput"]
    return m


def from_log(path):
    """Regex-free scrape of the reference-compatible python.log grammar."""
    m = {k: None for k in FIELDS[1:]}
    with open(path, errors="replace") as f:
        lines = f.readlines()
    for line in reversed(lines):
        try:
            if m["total_time_s"] is None and "end2end total_time:" in line:
                m["total_time_s"] = float(
                    line.split("end2end total_time: ")[1].split(" s")[0]
                )
                m["iterations"] = int(line.split("iterations: ")[1].split(",")[0])
                m["throughput"] = float(line.split("throughput ")[1].split(" it/s")[0])
            if m["test_psnr"] is None and "Evaluating test:" in line:
                m["test_psnr"] = float(line.split("PSNR ")[1].strip())
            if m["train_psnr"] is None and "Evaluating train:" in line:
                m["train_psnr"] = float(line.split("PSNR ")[1].strip())
            if (
                m["num_3dgs"] is None
                and "Now num of 3dgs:" in line
                and "Max Memory usage:" in line
            ):
                m["num_3dgs"] = int(line.split("Now num of 3dgs: ")[1].split(".")[0])
                m["max_hbm_gb"] = float(
                    line.split("Max Memory usage: ")[1].split(" GB")[0]
                )
                m["host_gb"] = float(
                    line.split("Now Pinned Memory: ")[1].split(" GB")[0]
                )
        except (ValueError, IndexError):
            continue
    return m


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("-o", "--output", default="results.csv")
    args = ap.parse_args(argv)

    rows = []
    for d in args.run_dirs:
        ev = os.path.join(d, "events.jsonl")
        lg = os.path.join(d, "python.log")
        if os.path.exists(ev):
            m = from_events(ev)
        elif os.path.exists(lg):
            m = from_log(lg)
        else:
            print(f"skip {d}: no log", file=sys.stderr)
            continue
        m["run"] = os.path.basename(os.path.normpath(d))
        rows.append(m)

    with open(args.output, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.output} ({len(rows)} runs)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dedupe a campaign loss_curve.csv in place: resumes from an earlier
checkpoint re-run steps, appending duplicate step rows; keep the LAST
occurrence of each step (the one whose weights the final checkpoint
contains), sorted by step.

Usage: python tools/dedupe_curve.py <out_dir>
"""

import sys


def main():
    path = f"{sys.argv[1]}/loss_curve.csv"
    with open(path) as f:
        header = f.readline()
        rows = {}
        for line in f:
            line = line.strip()
            if not line:
                continue
            step = int(line.split(",", 1)[0])
            rows[step] = line
    with open(path, "w") as f:
        f.write(header)
        for step in sorted(rows):
            f.write(rows[step] + "\n")
    print(f"deduped {path}: {len(rows)} unique steps")


if __name__ == "__main__":
    main()

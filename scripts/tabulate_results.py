"""Tabulate a run's results.txt (held-out eval trajectory) as a markdown table.

usage: python scripts/tabulate_results.py <run_dir_or_results.txt> [metric]
metric defaults to psnr (mosaicked regime for raw modalities).
"""

import re
import os
import sys


def main():
    path = sys.argv[1]
    if os.path.isdir(path):
        path = os.path.join(path, "results.txt")
    metric = sys.argv[2] if len(sys.argv) > 2 else "psnr"

    steps = []  # (step, {mod: value})
    cur = None
    for line in open(path):
        m = re.match(r"step (\d+) @", line)
        if m:
            cur = (int(m.group(1)), {})
            steps.append(cur)
            continue
        m = re.match(rf"\s+(\w+): .*?\b{metric}=([0-9.]+)", line)
        if m and cur is not None:
            cur[1][m.group(1)] = float(m.group(2))

    if not steps:
        print("no eval blocks found", file=sys.stderr)
        return
    steps.sort(key=lambda t: t[0])  # results.txt prepends (reference parity)
    mods = sorted({k for _, d in steps for k in d})
    print("| step | " + " | ".join(mods) + " |")
    print("|" + "---|" * (len(mods) + 1))
    for step, d in steps:
        print(
            f"| {step} | "
            + " | ".join(f"{d[m]:.2f}" if m in d else "-" for m in mods)
            + " |"
        )


if __name__ == "__main__":
    main()

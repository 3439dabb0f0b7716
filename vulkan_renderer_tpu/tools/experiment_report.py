"""Summarize experiment results.csv into a markdown table.

The harness CLI appends one CSV row per experiment run (see
experiments/harness.py main). This tool renders the accumulated results —
the figure-suite equivalent of the reference's timing-in-filename outputs
(main.c:2006) collected into one reviewable table.

Usage: python -m vulkan_renderer_tpu.tools.experiment_report \
           [results.csv] [-o RESULTS.md]
"""

from __future__ import annotations

import argparse
import csv
import os


def write_report(csv_path: str, out_path: str) -> int:
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    # Last run of each experiment index wins.
    latest: dict[str, dict] = {}
    for row in rows:
        latest[row["index"]] = row
    rows = sorted(latest.values(), key=lambda r: int(r["index"]))
    lines = [
        "# Experiment results",
        "",
        f"{len(rows)} experiments (latest run per index). Frame times on "
        "the `cpu` backend are NOT TPU measurements (tagged `_cpu` in "
        "filenames); `stand_in` marks procedural stand-in scenes/layouts "
        "(reference assets are a separate download).",
        "",
        "| # | scene | technique | strategy | spp | res | ms/frame | "
        "backend | stand-in | uncertain | overflow |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['index']} | {r['scene']} | {r['technique']} | "
            f"{r['strategy']} | {r['spp']} | {r['width']}x{r['height']} | "
            f"{r['frame_ms']} | {r['backend']} | "
            f"{'yes' if r['stand_in'] == '1' else 'no'} | "
            f"{r['primary_uncertain']} | {r['shadow_overflow']} |")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(rows)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("csv", nargs="?", default="data/experiments/results.csv")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args(argv)
    out = args.output or os.path.join(os.path.dirname(args.csv),
                                      "RESULTS.md")
    n = write_report(args.csv, out)
    print(f"{n} experiments -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

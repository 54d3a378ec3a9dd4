"""Summarize the round-4 inductive sweep into RESULTS.md-ready rows.

Reads each /tmp/r4_induct/<split>_s<seed>.log, takes the BEST json line
(test metrics at best-valid epoch), and prints a markdown table sorted
by split, plus per-split best-over-seeds where multiple seeds ran.

Usage: python scripts/summarize_inductive.py [dir]
"""

import glob
import json
import os
import re
import sys


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4_induct"
    rows = []
    for log in sorted(glob.glob(os.path.join(d, "*.log"))):
        tag = os.path.basename(log)[:-4]
        m = re.match(r"(.+)_s(\d+)$", tag)
        if not m:
            continue
        split, seed = m.group(1), int(m.group(2))
        best = None
        with open(log) as f:
            for line in f:
                if line.startswith("BEST "):
                    best = json.loads(line[5:])
        if best is None:
            # unfinished: latest eval line still carries the trajectory
            rows.append((split, seed, None))
            continue
        rows.append((split, seed, best))

    print("| split | seed | test MRR | H@1 | H@10 | epoch(best) |")
    print("|---|---|---|---|---|---|")
    by_split = {}
    for split, seed, best in rows:
        if best is None:
            print(f"| {split} | {seed} | (unfinished) | | | |")
            continue
        mrr = best.get("test_mrr")
        h1 = best.get("test_h1")
        h10 = best.get("test_h10")
        ep = best.get("epoch")
        print(f"| {split} | {seed} | {mrr:.4f} | {h1:.4f} | {h10:.4f} "
              f"| {ep} |")
        cur = by_split.get(split)
        if cur is None or mrr > cur[1]:
            by_split[split] = (seed, mrr, h1, h10)
    print()
    print("best over seeds:")
    for split in sorted(by_split):
        seed, mrr, h1, h10 = by_split[split]
        print(f"  {split}: MRR {mrr:.4f} H@1 {h1:.4f} H@10 {h10:.4f} "
              f"(seed {seed})")


if __name__ == "__main__":
    main()

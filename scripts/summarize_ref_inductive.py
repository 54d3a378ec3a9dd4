"""Best-by-valid summary of the reference code's own CPU runs
(/tmp/ref_induct/results/<split>_perf.txt) — the reference's committed
protocol (train.py:177-185): track best valid MRR, report that epoch's
line. Used to separate 'our gap to the paper' from 'the reference
code's gap to the paper'."""
import glob
import re
import sys

for f in sorted(glob.glob("/tmp/ref_induct/results/*_perf.txt")):
    split = f.split("/")[-1][:-9]
    best = None
    n = 0
    for line in open(f):
        m = re.search(r"\[VALID\] MRR:([0-9.]+) H@1:([0-9.]+) H@10:([0-9.]+)"
                      r"\s+\[TEST\] MRR:([0-9.]+) H@1:([0-9.]+) H@10:([0-9.]+)",
                      line)
        if not m:
            continue
        v = tuple(float(x) for x in m.groups())
        if best is None or v[0] > best[1][0]:
            best = (n, v)
        n += 1
    if best is None:
        continue
    ep, v = best
    print(f"{split}: {n} epochs run; best valid MRR {v[0]:.4f} (ep {ep}) "
          f"-> test MRR {v[3]:.4f} H@1 {v[4]:.4f} H@10 {v[5]:.4f}")

"""Dataset preprocessing: inverse-relation augmentation.

Local equivalent of `Temporal/interpolation/data/preprocess.py` (which
downloads from mmkb and writes `<ds>_aug` dirs with `~relation` inverses
appended) — this container has zero egress, so only the augmentation step
is reproduced, applied to an existing name-based quadruple dir.
"""

from __future__ import annotations

import os


def augment_with_inverses(src_dir: str, dst_dir: str,
                          files=("train.txt", "valid.txt", "test.txt"),
                          wikidata_format: bool = False) -> None:
    """Write `<dst>/f` = lowercased originals + (t, ~r, h, time) inverses.

    ``wikidata_format`` handles the 5-column wikidata11k TSV
    (`preprocess.py:27-45`) where column 4 is the 'since' marker.
    """
    os.makedirs(dst_dir, exist_ok=True)
    for fname in files:
        path = os.path.join(src_dir, fname)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            lines = f.read().lower().splitlines()
        rows = [ln.split("\t") for ln in lines if ln.strip()]
        out_lines = list(lines)
        for r in rows:
            if wikidata_format:
                h, rel, t, since, time = r[:5]
                out_lines.append("\t".join([t, "~" + rel, h, since, time]))
            else:
                h, rel, t, time = r[:4]
                out_lines.append("\t".join([t, "~" + rel, h, time]))
        with open(os.path.join(dst_dir, fname), "w") as f:
            f.write("\n".join(out_lines) + "\n")

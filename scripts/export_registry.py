#!/usr/bin/env python
"""Regenerate configs/registry.json from the in-code config registry.

The JSON export exists so the tuned per-dataset hyperparameters (the
reference keeps them as if/elif blocks, e.g.
`Static/transductive/train.py:46-111`) are inspectable as data without
importing the package. `redgnn_tpu.utils.config.DATASET_CONFIGS` is the
source of truth; run this after editing it.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from redgnn_tpu.utils.config import DATASET_CONFIGS  # noqa: E402

out = {
    task: {name: dataclasses.asdict(cfg) for name, cfg in table.items()}
    for task, table in DATASET_CONFIGS.items()
}
path = os.path.join(os.path.dirname(__file__), "..", "configs",
                    "registry.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2, sort_keys=False)
    f.write("\n")
print(f"wrote {os.path.normpath(path)}")

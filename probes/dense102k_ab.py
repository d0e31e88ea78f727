"""Device A/B (round-4 verdict item 3): 102K-face full train step,
dense-RESIDENT kernel (12 MB gate, pallas_intersect.dense_available)
vs the HBM-streamed paired kernel that the old 10 MB gate forced.

Reuses probes/bigtree_step.py's chained-carry step harness; arms differ
only in the kernel auto-policy env toggles (read at trace time).

Run DETACHED on an idle chip:
  setsid nohup python probes/dense102k_ab.py > records/dense102k_ab_r4.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigtree_step import measure  # noqa: E402


def main():
    # arm 1: old policy (dense off -> paired_streamed at 102K faces)
    os.environ["IRIS_TPU_DENSE"] = "0"
    r = measure(8500)
    r["arm"] = "paired_streamed"
    print(json.dumps(r), flush=True)

    # arm 2: new policy (dense resident, 12 MB gate)
    os.environ["IRIS_TPU_DENSE"] = "auto"
    r = measure(8500)
    r["arm"] = "dense_resident"
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)

"""Pre-warm the shared round-4 render cache on CPU.

The chain's three trainings (tsh_r4, embed_r4_ref, embed_r4_neg20)
consume the IDENTICAL SyntheticTSEDataset splits, so one cache at
data/prerendered_r4/shared/{train,val,test} serves all of them.
Running this while the chip recovers means the first training starts
compute-bound immediately. render_split is resumable/idempotent, so
the trainer's own prerender pass afterwards is a no-op.

Run:  JAX_PLATFORMS=cpu python scripts/prerender_warm.py
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lookoncetohear_tpu import utils
from lookoncetohear_tpu.data.prep.prerender import render_split

CFG = "configs/tsh_synthetic.json"
OUT = "data/prerendered_r4/shared"


def main():
    hp = json.load(open(CFG))
    ncpu = os.cpu_count() or 1
    # spawn-pool overhead dominates on a 1-CPU host: go sequential
    workers = 0 if ncpu <= 1 else min(hp.get("num_workers", 8), ncpu)
    for which in ("val", "test", "train"):  # small splits first
        ds_cls = utils.import_attr(hp[f"{which}_dataset"])
        ds = ds_cls(**hp[f"{which}_data_args"])
        t0 = time.time()
        render_split(ds, os.path.join(OUT, which), num_workers=workers)
        print(f"warmed {which}: {len(ds)} shards in {time.time()-t0:.1f}s",
              flush=True)
    print("PRERENDER_WARM_DONE", flush=True)


if __name__ == "__main__":
    main()

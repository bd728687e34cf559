"""Multi-host runtime initialization.

The reference delegated multi-process wiring to Lightning DDP + SLURM
(reference slurm.py:36-37,102-104 — one task per GPU, NCCL rendezvous
via env). The TPU-native equivalent is `jax.distributed.initialize()`:
every host process joins a coordinator, after which `jax.devices()`
spans the whole pod slice and the single-controller training step's
GSPMD all-reduces ride ICI across hosts.

Two activation modes, both env-driven so the trainer CLI stays
flag-compatible with the reference:

* **TPU pod auto-detection** — `LOOKONCE_DIST=auto`: argless
  `jax.distributed.initialize()`; on a TPU-VM pod slice JAX discovers
  the coordinator and process ranks from the TPU metadata service.
  `launch.py` exports this for multi-worker dispatches.
* **Explicit rendezvous** — `LOOKONCE_COORDINATOR=host:port`,
  `LOOKONCE_NUM_PROCESSES=N`, `LOOKONCE_PROCESS_ID=i`: used by the
  2-process CPU test (tests/test_distributed.py) and any non-TPU-pod
  deployment. With a CPU backend the gloo cross-process collectives
  implementation is selected automatically.

MUST be called before anything touches the JAX backend (device
queries, array creation) — backend initialization freezes the process
topology. `lookoncetohear_tpu.trainer.__main__` calls it first thing.
"""

from __future__ import annotations

import logging
import os


def maybe_initialize() -> bool:
    """Join the multi-process JAX cluster if the environment requests
    one. Returns True if `jax.distributed.initialize` was called.

    Safe no-op for single-process runs (the default: none of the
    trigger env vars set).
    """
    coord = os.environ.get("LOOKONCE_COORDINATOR")
    auto = os.environ.get("LOOKONCE_DIST") == "auto"
    if not coord and not auto:
        return False

    import jax

    if coord:
        num = int(os.environ["LOOKONCE_NUM_PROCESSES"])
        pid = int(os.environ["LOOKONCE_PROCESS_ID"])
        # CPU backends rendezvous collectives through gloo; must be
        # configured before backend init (no-op for TPU backends)
        plat = os.environ.get("JAX_PLATFORMS", "")
        if "cpu" in plat:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_cpu_collectives_implementation",
                              "gloo")
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=num, process_id=pid)
        logging.info("jax.distributed: process %d/%d via %s",
                     pid, num, coord)
    else:
        # TPU pod slice: coordinator + ranks from the metadata service
        jax.distributed.initialize()
        logging.info("jax.distributed: auto-initialized, process %d/%d",
                     jax.process_index(), jax.process_count())
    return True

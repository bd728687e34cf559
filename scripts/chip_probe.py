"""One bounded liveness probe of the real (axon) TPU backend.

Exits 0 iff a tiny jit compile+execute round-trips. Run under an
external `timeout` (the proxied chip's failure mode is an indefinite
hang at backend init or first execute, not an error); keep probes
~45 min apart — a timed-out probe is itself a killed client and
restarts the wedge-recovery clock (see MEMORY tpu-wedge-recovery).
"""
import time

import jax
import jax.numpy as jnp

t0 = time.time()
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
x.block_until_ready()
print(f"PROBE_OK {float(x):.1f} backend={jax.default_backend()} "
      f"{time.time() - t0:.1f}s", flush=True)

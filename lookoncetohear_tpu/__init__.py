"""lookoncetohear_tpu — TPU-native target-speech-hearing framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
vb000/LookOnceToHear (CHI 2024, "Look Once to Hear"): a binaural
speaker-enrollment network ("look once") plus a streaming causal
TF-GridNet separator conditioned on the enrolled speaker embedding,
trained on synthetically spatialized LibriSpeech + WHAM mixtures.

Design stance (TPU-first, not a port):
  * Pure-functional models with explicit streaming-state pytrees;
    streaming inference is one compiled `jax.lax.scan` step.
  * STFT/iSTFT as framing + matmul filterbanks (MXU-friendly).
  * Banded local attention as chunked two-block attention (training)
    and a ring-buffer GEMV step (streaming), with a Pallas kernel
    for the serving hot path.
  * Data parallelism via `jax.sharding.Mesh` + NamedSharding; XLA
    collectives over ICI (the reference uses torch DDP/NCCL,
    reference src/trainer.py:53-56).
  * Host-side C++ audio engine for spatialization / moving sources
    (the reference's only native component, moving_sources.so,
    reference src/datasets/motion_simulator.py:30-95).
"""

__version__ = "0.1.0"

"""Host-side data pipeline.

TPU-native stance: all scene synthesis (decode, loudness-matched
mixing, HRTF/BRIR spatialization, noise augmentation) runs on host
CPUs in numpy/scipy worker processes; devices only ever see fixed-shape
float32 batches moved via double-buffered prefetch (`loader.py`).
Mirrors the reference pipeline (reference src/datasets/) component for
component.
"""

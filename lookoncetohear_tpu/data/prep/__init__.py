"""One-shot offline data-prep scripts (reference src/datasets/
librispeech2scaper.py, generate_jams.py, dvector_embeddings.py,
nemo_embed.py), each runnable as `python -m
lookoncetohear_tpu.data.prep.<script>`."""

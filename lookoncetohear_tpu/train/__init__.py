"""Training harness: tasks, optimizer/scheduler, checkpointing,
loggers, and the Trainer loop (the reference's Lightning layer,
reference src/trainer.py + src/*_pl_module.py, rebuilt on optax/orbax
with an explicit data-parallel mesh)."""

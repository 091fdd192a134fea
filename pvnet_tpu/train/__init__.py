"""Training: losses, train state, data-parallel step, checkpointing,
recording."""

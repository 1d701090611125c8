"""Training/eval loops, artifact schema writers, checkpointing."""

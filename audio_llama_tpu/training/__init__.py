"""Training driver, optimizer, checkpointing, metrics."""

"""Training: DSM losses, pjit data-parallel train loop, checkpoints."""

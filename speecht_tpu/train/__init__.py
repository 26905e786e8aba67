"""Training subsystem: state, jitted step, checkpointing, metrics, loop."""

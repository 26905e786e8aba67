"""Data subsystem: audio IO, feature extraction, corpus cache, batching."""

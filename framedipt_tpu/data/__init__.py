"""Data layer: chemical constants, structure IO, featurization, batching."""

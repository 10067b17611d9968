"""Entry points: samplers, inference orchestration, training CLI."""

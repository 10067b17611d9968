"""Evaluation harness: region metrics, sample selection, TCR/de novo CLIs."""

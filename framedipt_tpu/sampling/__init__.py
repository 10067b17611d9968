"""Reverse-SDE sampling: fully on-device lax.scan samplers."""

from framedipt_tpu.sampling.reverse import build_inference_fn, inference_fn

__all__ = ["build_inference_fn", "inference_fn"]

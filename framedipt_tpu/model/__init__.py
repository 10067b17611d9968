"""Score network: embedder + invariant-point-attention trunk (flax.linen)."""

from framedipt_tpu.model.score_network import ScoreNetwork

__all__ = ["ScoreNetwork"]

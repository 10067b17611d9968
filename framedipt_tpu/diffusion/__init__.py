"""SE(3) diffusion engine: IGSO(3) rotation + VP-SDE translation diffusion.

All sampling/score/reverse operators are pure jnp functions with explicit
PRNG keys, so the whole reverse-SDE sampler stays on-device inside one
``lax.scan`` — the reference crosses torch->numpy->scipy every step
(SURVEY.md §3.1); this engine never leaves XLA.
"""

from framedipt_tpu.diffusion.r3_diffuser import R3Diffuser
from framedipt_tpu.diffusion.se3_diffuser import SE3Diffuser
from framedipt_tpu.diffusion.so3_diffuser import SO3Diffuser

__all__ = ["R3Diffuser", "SO3Diffuser", "SE3Diffuser"]

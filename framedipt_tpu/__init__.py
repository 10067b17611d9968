"""framedipt_tpu — TPU-native SE(3) diffusion framework for protein backbone
structure inpainting and de novo design.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
instadeepai/FrameDiPT (reference layout documented in SURVEY.md): IGSO(3)
rotation diffusion + VP-SDE translation diffusion over rigid backbone frames,
an invariant-point-attention score network, a fully on-device `lax.scan`
reverse sampler with self-conditioning and inpainting masks, data/eval
pipelines, and a pjit data-parallel trainer.
"""

# Residue index gap inserted between chains when re-indexing multi-chain
# complexes (ref: framedipt/__init__.py:3).
CHAIN_RESIDUE_GAP = 200

__version__ = "0.1.0"

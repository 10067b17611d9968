"""The reverse-SDE inference driver as a single on-device ``lax.scan``.

Behavioral contract mirrors experiments/utils.py:511-626 (inference_fn /
one_step_inference): reverse steps over linspace(min_t, 1, num_t) reversed,
dt = 1/num_t, one initial self-conditioning forward, per-step model forward
with score scalings, SE(3) reverse step for t > min_t and the model's x0
prediction at the final step, self-conditioning CA update from predicted
rigids, and trajectory stacking flipped to start at t=0.

TPU-first design: where the reference round-trips torch -> numpy -> scipy on
every one of its 100 steps (experiments/utils.py:361-377, SURVEY.md §3.1),
here the model forward, the score conversions, the geodesic rotation step,
the Euler-Maruyama translation step, and the atom37 reconstruction are all
inside one jitted scan body — zero host transfers for the whole trajectory.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from framedipt_tpu.diffusion.se3_diffuser import SE3Diffuser
from framedipt_tpu.geometry import frames
from framedipt_tpu.geometry.rigid import Rigid
from framedipt_tpu.model.score_network import preprocess_aatype

# Rebuild atom37 for the whole trajectory in one batched post-scan pass
# instead of per scan step (identical math — equality-tested in
# tests/unit/test_sampling.py). Measured A/B on the v5e
# (scripts/ab_sampler_variants.py, PERF.md round-4 notes): the hoist LOSES
# ~2% at len-256 and ~3% at len-512 — in-scan, the O(N) backbone tail
# overlaps with the step's N^2 work inside one fused program, while the
# post-scan pass is a serial extra sweep with its own [T, B, N] HBM
# round-trips. Default off; kept as a flag with the equality test.
_HOIST_BACKBONE = False

# lax.scan unroll factor for the reverse loop. >1 lets XLA overlap/fuse
# across adjacent diffusion steps at the cost of a bigger program;
# measured neutral-to-negative on the v5e (PERF.md round-4 notes), so 1.
_SCAN_UNROLL = 1


def build_inference_fn(
    model: Any,
    diffuser: SE3Diffuser,
    num_t: int,
    min_t: float,
    noise_scale: float = 1.0,
    center: bool = True,
    aux_traj: bool = False,
    self_condition: bool = True,
    embed_self_conditioning: bool = True,
    inpainting: bool = False,
    input_aatype: bool = False,
    sp_mesh: Any | None = None,
) -> Callable[[Any, dict[str, jnp.ndarray], jax.Array], dict[str, jnp.ndarray]]:
    """Return a jitted ``(params, feats, key) -> trajectories`` sampler.

    ``feats`` must contain rigids_t [B,N,7], res_mask/fixed_mask [B,N],
    seq_idx [B,N], sc_ca_t [B,N,3], torsion_angles_sin_cos [B,N,7,2], and
    aatype [B,N] when inpainting.

    ``sp_mesh``: a ``(dp, sp)`` mesh (see ``parallel.sp.make_sp_mesh``) to
    shard the N^2 edge stack over the ``sp`` axis — sequence parallelism
    for long complexes. XLA's SPMD partitioner splits the edge einsums by
    rows against the in-model sharding constraints and inserts collectives.
    The pair-MLP and embedder Pallas kernels run per-shard via shard_map
    under sp; only the IPA-attention kernel requires the XLA path.
    """
    # The edge-transition and embedder kernels are sp-aware: under an
    # active sp context they run per-shard via shard_map on each device's
    # local row block (model/ipa.py, model/embed.py — rows local, columns
    # full). The fused IPA attention kernel is not (it is a flag-gated
    # reference implementation that loses to XLA anyway, PERF.md), so it
    # still requires the XLA formulation under sp.
    if sp_mesh is not None and bool(
        getattr(model.conf.ipa, "use_pallas_ipa", False)
    ):
        raise ValueError(
            "sequence parallelism (sp_mesh) supports the Pallas edge-"
            "transition and embedder kernels (via shard_map) but not the "
            "fused IPA attention kernel; set model.ipa.use_pallas_ipa=False"
        )
    reverse_steps = jnp.asarray(
        np.linspace(min_t, 1.0, num_t)[::-1].copy(), jnp.float32
    )
    dt = 1.0 / num_t

    def _step_feats(feats: dict, rigids_t7, sc_ca, t) -> dict:
        batch = feats["res_mask"].shape[0]
        t_vec = jnp.full((batch,), t, jnp.float32)
        rot_ss, trans_ss = diffuser.score_scaling(t)
        out = dict(feats)
        out.update(
            rigids_t=rigids_t7,
            sc_ca_t=sc_ca,
            t=t_vec,
            rot_score_scaling=jnp.full((batch,), rot_ss, jnp.float32),
            trans_score_scaling=jnp.full((batch,), trans_ss, jnp.float32),
        )
        return out

    @jax.jit
    def run(params, feats: dict[str, jnp.ndarray], key: jax.Array):
        feats = dict(feats)
        res_mask = feats["res_mask"].astype(jnp.float32)
        fixed_mask = feats["fixed_mask"].astype(jnp.float32) * res_mask
        diffuse_mask = (1.0 - feats["fixed_mask"].astype(jnp.float32)) * res_mask
        aatype = preprocess_aatype(
            feats.get("aatype"), fixed_mask, inpainting, input_aatype
        )

        rigids_t7 = feats["rigids_t"].astype(jnp.float32)
        sc_ca = feats["sc_ca_t"].astype(jnp.float32)

        # Initial self-conditioning forward (experiments/utils.py:571-578).
        if embed_self_conditioning and self_condition:
            init_feats = _step_feats(feats, rigids_t7, sc_ca, reverse_steps[0])
            out0 = model.apply(params, init_feats)
            sc_ca = out0["rigids"][..., 4:]

        def body(carry, t):
            rigids_t7, sc_ca, key = carry
            step_feats = _step_feats(feats, rigids_t7, sc_ca, t)
            out = model.apply(params, step_feats)
            rigid_pred = out["rigids"]  # model x0 prediction, [B, N, 7]

            sc_next = rigid_pred[..., 4:] if embed_self_conditioning else sc_ca

            key, sub = jax.random.split(key)
            reversed_rigids = diffuser.reverse(
                sub,
                Rigid.from_tensor7(rigids_t7),
                out["rot_score"],
                out["trans_score"],
                t,
                dt,
                diffuse_mask=diffuse_mask,
                center=center,
                noise_scale=noise_scale,
            )
            # Final step (t <= min_t): take the model's x0 prediction
            # (experiments/utils.py:361-374).
            take_reverse = (t > min_t).astype(jnp.float32)
            rigids_next7 = (
                take_reverse * reversed_rigids.to_tensor7()
                + (1.0 - take_reverse) * rigid_pred
            )

            # With _HOIST_BACKBONE the body emits only rigids7/psi and a
            # single post-scan pass rebuilds atom37 for all num_t steps at
            # once; the default is the in-scan rebuild below, which
            # measured 2-3% faster (the O(N) tail fuses into the step
            # program — see the flag comment at module top / PERF.md).
            psi = out["psi"]
            ys = {"rigids7": rigids_next7, "psi": psi}
            if aux_traj:
                ys["rigid_pred7"] = rigid_pred
            if not _HOIST_BACKBONE:
                atom37, atom37_mask, _, _ = frames.compute_backbone(
                    Rigid.from_tensor7(rigids_next7), psi, aatype=aatype
                )
                ys["prot_traj"] = atom37 * atom37_mask[..., None]
                if aux_traj:
                    a37_0, m37_0, _, _ = frames.compute_backbone(
                        Rigid.from_tensor7(rigid_pred), psi, aatype=aatype
                    )
                    ys["rigid_0_traj"] = a37_0 * m37_0[..., None]

            return (rigids_next7, sc_next, key), ys

        (final_rigids7, _, _), traj = jax.lax.scan(
            body, (rigids_t7, sc_ca, key), reverse_steps, unroll=_SCAN_UNROLL
        )

        # Post-scan trajectory reconstruction, batched over all steps.
        traj_rigids7 = traj["rigids7"]  # [T, B, N, 7]
        traj_psi = traj["psi"]
        if _HOIST_BACKBONE:
            # aatype is None on the de novo path (preprocess_aatype returns
            # None unless inpainting/input_aatype); compute_backbone treats
            # None as all-ALA geometry, same as the per-step path did.
            aatype_traj = (
                None
                if aatype is None
                else jnp.broadcast_to(
                    aatype[None], (traj_rigids7.shape[0],) + aatype.shape
                )
            )
            atom37, atom37_mask, _, _ = frames.compute_backbone(
                Rigid.from_tensor7(traj_rigids7), traj_psi, aatype=aatype_traj
            )
            traj = dict(traj, prot_traj=atom37 * atom37_mask[..., None])
            if aux_traj:
                a37_0, m37_0, _, _ = frames.compute_backbone(
                    Rigid.from_tensor7(traj["rigid_pred7"]),
                    traj_psi,
                    aatype=aatype_traj,
                )
                traj["rigid_0_traj"] = a37_0 * m37_0[..., None]
        if aux_traj:
            traj["rigid_traj"] = traj_rigids7
            gt_trans_0 = traj_rigids7[..., 4:]
            pred_trans_0 = traj["rigid_pred7"][..., 4:]
            traj["trans_traj"] = (
                diffuse_mask[None, ..., None] * pred_trans_0
                + fixed_mask[None, ..., None] * gt_trans_0
            )

        # Flip so trajectories start at t = 0 (experiments/utils.py:610-616).
        ret = {
            "prot_traj": jnp.flip(traj["prot_traj"], axis=0),
            "psi_pred": traj["psi"][-1][None],
            "final_rigids": final_rigids7,
        }
        if aux_traj:
            # Prepend the initial (t=1) rigids, then flip: [t=0 ... t=1].
            rigid_traj = jnp.concatenate(
                [feats["rigids_t"][None], traj["rigid_traj"]], axis=0
            )
            ret["rigid_traj"] = jnp.flip(rigid_traj, axis=0)
            ret["trans_traj"] = jnp.flip(traj["trans_traj"], axis=0)
            ret["rigid_0_traj"] = jnp.flip(traj["rigid_0_traj"], axis=0)
        return ret

    if sp_mesh is None:
        return run

    from framedipt_tpu.parallel import sp as _sp

    def run_sp(params, feats, key):
        # The sp context must be live while ``run`` traces (first call) so
        # the in-model constraints bind to this mesh; afterwards it is a
        # no-op around cached executions.
        with _sp.sp_context(sp_mesh):
            return run(params, feats, key)

    return run_sp


def inference_fn(
    model: Any,
    params: Any,
    diffuser: SE3Diffuser,
    data_init: dict[str, jnp.ndarray],
    key: jax.Array,
    num_t: int,
    min_t: float,
    **kwargs,
) -> dict[str, np.ndarray]:
    """One-shot convenience mirroring the reference signature; returns host
    numpy arrays."""
    run = build_inference_fn(model, diffuser, num_t, min_t, **kwargs)
    out = run(params, data_init, key)
    return {k: np.asarray(v) for k, v in out.items()}

"""EigenFold ELBO confidence score as an on-device lax.scan.

Role of experiments/utils.py:752-869 (logp_confidence_score): a forward
noising ladder from the final prediction, accumulating per-step
log p_backward - log p_forward, plus terminal Gaussian (translation) and
uniform-rotation prior terms. The reference runs this as a second Python
loop over timesteps with host round-trips; here the whole ladder is one
jitted scan (two model forwards per step with self-conditioning, as in the
reference's one_step_inference_score).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from framedipt_tpu.diffusion.se3_diffuser import SE3Diffuser
from framedipt_tpu.geometry.rigid import Rigid


def logp_confidence_score(
    model,
    params,
    diffuser: SE3Diffuser,
    sample_feats: dict,
    final_rigids_t7: np.ndarray,
    diffuse_mask: np.ndarray,
    num_t: int,
    min_t: float,
    key: jax.Array,
    self_condition: bool = True,
) -> jnp.ndarray:
    """Scalar EigenFold confidence (higher = more likely under the model)."""
    forward_steps = np.linspace(min_t, 1.0, num_t)[:-1]
    # t at which the model is evaluated per step (next grid point; 1.0 last).
    eval_ts = np.append(forward_steps[1:], 1.0)
    dt = 1.0 / num_t

    feats = {
        k: jnp.asarray(v)
        for k, v in sample_feats.items()
        if k
        in (
            "res_mask",
            "fixed_mask",
            "seq_idx",
            "sc_ca_t",
            "torsion_angles_sin_cos",
            "aatype",
        )
    }
    if "aatype" in feats:
        feats["aatype"] = feats["aatype"].astype(jnp.int32)
    batch = feats["res_mask"].shape[0]
    dmask = jnp.asarray(diffuse_mask, jnp.float32)
    if dmask.ndim == 2:
        dmask_flat = dmask[0]
    else:
        dmask_flat = dmask
        dmask = dmask[None]

    @jax.jit
    def run(params, rigids0_t7, key):
        def model_scores(rigids_t7, t):
            t_vec = jnp.full((batch,), t, jnp.float32)
            rot_ss, trans_ss = diffuser.score_scaling(t)
            step_feats = dict(feats)
            step_feats.update(
                rigids_t=rigids_t7,
                t=t_vec,
                rot_score_scaling=jnp.full((batch,), rot_ss),
                trans_score_scaling=jnp.full((batch,), trans_ss),
            )
            if self_condition:
                out_sc = model.apply(params, step_feats)
                step_feats["sc_ca_t"] = out_sc["rigids"][..., 4:]
            out = model.apply(params, step_feats)
            return out["trans_score"], out["rot_score"]

        def body(carry, inputs):
            rigids_t7, log_p, k = carry
            t_1, t_eval = inputs
            k, k_fwd = jax.random.split(k)
            r_prev = Rigid.from_tensor7(rigids_t7)
            r_next = diffuser.forward(
                k_fwd, r_prev, t_1, dt, diffuse_mask=dmask
            )
            next_t7 = r_next.to_tensor7()
            trans_score, rot_score = model_scores(next_t7, t_eval)
            lp_b = diffuser.log_prob_backward(
                r_next, r_prev, trans_score, rot_score, t_eval, dt,
                diffuse_mask=dmask,
            )
            lp_f = diffuser.log_prob_forward(
                r_next, r_prev, t_1, dt, diffuse_mask=dmask
            )
            return (next_t7, log_p + lp_b - lp_f, k), ()

        ts = jnp.stack(
            [jnp.asarray(forward_steps, jnp.float32), jnp.asarray(eval_ts, jnp.float32)],
            axis=-1,
        )
        (final_t7, log_p, _), _ = jax.lax.scan(
            body, (rigids0_t7, jnp.asarray(0.0), key), (ts[:, 0], ts[:, 1])
        )

        # Terminal priors: N(0, I) on scaled translations, uniform rotations.
        trans = diffuser.r3.scale(final_t7[..., 4:])
        var = 1.0
        lp_trans = jnp.sum(
            (-0.5 * (trans**2 / var + jnp.log(2.0 * jnp.pi * var)))
            * dmask[..., None]
        )
        n_diffused = jnp.sum(dmask_flat)
        lp_rot = jnp.log(1.0 / jnp.pi**2) * n_diffused
        return log_p + lp_trans + lp_rot

    rigids0 = jnp.asarray(final_rigids_t7, jnp.float32)
    return run(params, rigids0, key)

"""Data-parallel training step (pjit over a device mesh).

The reference trained off-repo with DDP (SURVEY.md §2.9); here the trainer
is a first-class TPU component: one jitted ``train_step`` whose batch is
sharded over the mesh ``dp`` axis — XLA inserts the gradient all-reduce over
ICI automatically. The step fuses: timestep sampling, SE(3) forward-marginal
noising, optional stop-gradient self-conditioning forward, the score-network
forward, DSM losses, and the optax update.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from framedipt_tpu.diffusion.se3_diffuser import SE3Diffuser
from framedipt_tpu.geometry import frames
from framedipt_tpu.geometry.rigid import Rigid
from framedipt_tpu.tools.config import Config
from framedipt_tpu.train.losses import score_matching_losses


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_optimizer(
    learning_rate: float = 1e-4, max_grad_norm: float = 10.0
) -> optax.GradientTransformation:
    """Adam (the reference's optimizer, config/base.yaml:95) with global
    gradient-norm clipping — score-matching gradients spike at small t."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(learning_rate),
    )


def init_train_state(
    model: Any, optimizer: optax.GradientTransformation, example_batch: dict, key
) -> TrainState:
    feats = build_model_feats(example_batch, example_batch["rigids_0"],
                              jnp.ones(example_batch["res_mask"].shape[0]),
                              jnp.zeros_like(example_batch["rigids_0"][..., 4:]))
    # jit the inits: run eagerly they are thousands of per-op dispatches,
    # which on a remote/tunneled executor costs minutes instead of seconds.
    params = jax.jit(model.init)(key, feats)
    return TrainState(
        jnp.zeros((), jnp.int32), params, jax.jit(optimizer.init)(params)
    )


def build_model_feats(batch: dict, rigids_t7, t, sc_ca_t) -> dict:
    """Assemble the score-network input dict from a training batch."""
    feats = {
        "res_mask": batch["res_mask"],
        "fixed_mask": batch["fixed_mask"],
        "seq_idx": batch["seq_idx"],
        "torsion_angles_sin_cos": batch["torsion_angles_sin_cos"],
        "rigids_t": rigids_t7,
        "t": t,
        "sc_ca_t": sc_ca_t,
    }
    if "aatype" in batch:
        feats["aatype"] = batch["aatype"]
    return feats


def build_train_step(
    model: Any,
    diffuser: SE3Diffuser,
    cfg: Config,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Returns ``train_step(state, batch, key) -> (state, metrics)``.

    ``batch`` (leading axis = per-device shard of the global batch):
    rigids_0 [B,N,7], res_mask/fixed_mask [B,N], seq_idx [B,N],
    torsion_angles_sin_cos [B,N,7,2], optional aatype [B,N].
    """
    exp_conf = cfg.experiment
    min_t = cfg.data.min_t

    def noise_batch(batch, key):
        b = batch["res_mask"].shape[0]
        k_t, k_marg = jax.random.split(key)
        # Importance sampling supplies host-sampled timesteps via batch["t"]
        # (train/importance.py); otherwise t ~ U(min_t, 1).
        if "t" in batch:
            t = batch["t"]
        else:
            t = jax.random.uniform(k_t, (b,), minval=min_t, maxval=1.0)
        rigids_0 = Rigid.from_tensor7(batch["rigids_0"].astype(jnp.float32))
        diffuse_mask = (
            1.0 - batch["fixed_mask"].astype(jnp.float32)
        ) * batch["res_mask"].astype(jnp.float32)
        marg = jax.vmap(
            lambda k, r0_t7, t_i, m: diffuser.forward_marginal(
                k, Rigid.from_tensor7(r0_t7), t_i, diffuse_mask=m
            )
        )(jax.random.split(k_marg, b), batch["rigids_0"], t, diffuse_mask)
        return t, marg

    def recycle_rigids(params, batch, rigids_t7, t, key):
        """Training-time recycling (cfg.experiment.recycle, ref
        experiments/utils.py:440-508 semantics reconstructed): noise to a
        later timestep ('max' -> t=1, 'next' -> t+dt), run the model without
        gradient, take one reverse step back to t, and feed that structure
        as the model input."""
        k_noise, k_rev = jax.random.split(key)
        dt = 1.0 / cfg.data.num_t
        if exp_conf.recycle.mode == "max":
            t_recycle = jnp.ones_like(t)
        else:  # "next"
            t_recycle = jnp.minimum(t + dt, 1.0)
        diffuse_mask = (
            1.0 - batch["fixed_mask"].astype(jnp.float32)
        ) * batch["res_mask"].astype(jnp.float32)
        b = t.shape[0]
        marg_r = jax.vmap(
            lambda k, r0_t7, t_i, m: diffuser.forward_marginal(
                k, Rigid.from_tensor7(r0_t7), t_i, diffuse_mask=m
            )
        )(jax.random.split(k_noise, b), batch["rigids_0"], t_recycle, diffuse_mask)
        feats_r = build_model_feats(
            batch, marg_r.rigids_t.to_tensor7(), t_recycle,
            jnp.zeros_like(rigids_t7[..., 4:]),
        )
        out_r = model.apply(params, feats_r)
        out_r = jax.lax.stop_gradient(out_r)
        reversed_r = jax.vmap(
            lambda k, r7, rs, ts, t_i, m: diffuser.reverse(
                k, Rigid.from_tensor7(r7), rs, ts, t_i, dt, diffuse_mask=m
            ).to_tensor7()
        )(
            jax.random.split(k_rev, b),
            marg_r.rigids_t.to_tensor7(),
            out_r["rot_score"],
            out_r["trans_score"],
            t_recycle,
            diffuse_mask,
        )
        return reversed_r

    def loss_fn(params, batch, key):
        k_noise, k_sc, k_recycle = jax.random.split(key, 3)
        t, marg = noise_batch(batch, k_noise)
        rigids_t7 = marg.rigids_t.to_tensor7()
        trans_score_target = marg.trans_score
        rot_score_target = marg.rot_score
        if exp_conf.recycle.enabled:
            rigids_t7 = recycle_rigids(params, batch, rigids_t7, t, k_recycle)
            # The recycled rigids are a DIFFERENT x_t realization than the
            # forward_marginal draw, so the score targets must be recomputed
            # against them — otherwise even a perfect x_0 prediction carries
            # nonzero loss biased by (x_t_recycled - x_t_orig). The loss is
            # masked to the diffused region, where both are valid targets.
            r0 = batch["rigids_0"].astype(jnp.float32)
            if diffuser.diffuse_trans:
                trans_score_target = diffuser.calc_trans_score(
                    rigids_t7[..., 4:], r0[..., 4:], t
                )
            if diffuser.diffuse_rot:
                rot_score_target = diffuser.calc_rot_score(
                    rigids_t7[..., :4], r0[..., :4], t
                )

        # Ground-truth idealized backbone atoms from the clean frames.
        gt_psi = batch["torsion_angles_sin_cos"][..., 2, :]
        _, _, _, atom14_gt = frames.compute_backbone(
            Rigid.from_tensor7(batch["rigids_0"].astype(jnp.float32)),
            gt_psi,
            aatype=batch.get("aatype"),
        )

        zeros_sc = jnp.zeros_like(rigids_t7[..., 4:])

        # Self-conditioning on a coin flip, detached (FrameDiff recipe).
        def with_sc(_):
            feats_sc = build_model_feats(batch, rigids_t7, t, zeros_sc)
            out_sc = model.apply(params, feats_sc)
            return jax.lax.stop_gradient(out_sc["rigids"][..., 4:])

        use_sc = cfg.model.embed.embed_self_conditioning
        if use_sc:
            coin = jax.random.bernoulli(k_sc)
            sc_ca = jax.lax.cond(coin, with_sc, lambda _: zeros_sc, None)
        else:
            sc_ca = zeros_sc

        feats = build_model_feats(batch, rigids_t7, t, sc_ca)
        pred = model.apply(params, feats)

        loss_batch = {
            **batch,
            "t": t,
            "trans_score": trans_score_target,
            "rot_score": rot_score_target,
            "trans_score_scaling": marg.trans_score_scaling,
            "rot_score_scaling": marg.rot_score_scaling,
            "atom14_gt": atom14_gt,
        }
        total, terms = score_matching_losses(
            pred,
            loss_batch,
            exp_conf,
            diffuse_rot=diffuser.diffuse_rot,
            diffuse_trans=diffuser.diffuse_trans,
        )
        if "loss_weight" in batch:
            # Unbiased reweighting under importance-sampled timesteps. The
            # history fed back to the sampler must be the RAW per-example
            # loss: storing the 1/p-weighted value makes the next proposal
            # proportional to raw/w_old, whose fixed point is w ~ sqrt(raw)
            # — under-concentrating on high-loss bins (improved-DDPM
            # recipe stores the unweighted loss).
            terms["raw_per_example_loss"] = terms["per_example_loss"]
            per_ex = terms["per_example_loss"] * batch["loss_weight"]
            total = jnp.mean(per_ex)
            terms["per_example_loss"] = per_ex
            terms["total_loss"] = total
        terms["t"] = t
        return total, terms

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            **terms,
        }
        return TrainState(state.step + 1, new_params, new_opt_state), metrics

    return train_step

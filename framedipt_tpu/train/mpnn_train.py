"""TPU-native ProteinMPNN training step.

Re-implements the training contract of the reference's vendored MPNN
training scripts (``ProteinMPNN/training/``) as pure jitted functions:

- label-smoothed NLL divided by the FIXED 2000 normalizer
  (``training/model_utils.py:140-150`` ``loss_smoothed``, weight=0.1) for
  the update, plus the mask-averaged NLL + argmax accuracy used for the
  train/valid reporting (``loss_nll``, :128-137);
- the Noam/"std" optimizer: Adam(0.9, 0.98, eps=1e-9) at
  lr = factor * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5) with
  factor=2, warmup=4000 (``model_utils.py:474-511`` NoamOpt/get_std_opt);
- backbone noise augmentation ``augment_eps=0.2`` during training
  (``training/training.py:83,231``) — applied inside ``mpnn_encode`` when
  a key is threaded (model/mpnn.py:316);
- a fresh random decoding order per step (the teacher-forced forward's
  ``randn``), exactly the reference ``model(X, S, mask, chain_M, ...)``
  call (``training/training.py:150-162``).

TPU redesign notes: the whole step — noise draw, decoding-order draw,
forward, loss, Noam update — is ONE jitted XLA program over static
shapes; the reference's mixed-precision GradScaler path is unnecessary
(bf16 on TPU needs no loss scaling, and the MPNN is small enough that we
keep the update in f32). Data feeding reuses the pipeline's length
bucketing rather than the reference's StructureLoader (same batching
contract: pad to bucket, mask carries validity).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from framedipt_tpu.model import mpnn


def noam_schedule(
    d_model: int, factor: float = 2.0, warmup: int = 4000
) -> optax.Schedule:
    """lr(step) = factor * d_model^-0.5 * min(step^-0.5, step*warmup^-1.5)
    (model_utils.py:498-505; step is 1-indexed there — NoamOpt calls
    rate(self._step) after incrementing)."""

    def schedule(count):
        step = jnp.maximum(count + 1, 1).astype(jnp.float32)
        return (
            factor
            * (d_model ** -0.5)
            * jnp.minimum(step ** -0.5, step * (warmup ** -1.5))
        )

    return schedule


def make_mpnn_optimizer(
    cfg: mpnn.MPNNConfig, factor: float = 2.0, warmup: int = 4000,
    gradient_norm: float = -1.0,
) -> optax.GradientTransformation:
    """get_std_opt equivalent (model_utils.py:509-511). ``gradient_norm``
    > 0 prepends clip_by_global_norm (training.py --gradient_norm,
    default -1 = off, matching the reference)."""
    adam = optax.adam(
        noam_schedule(cfg.hidden_dim, factor, warmup),
        b1=0.9,
        b2=0.98,
        eps=1e-9,
    )
    if gradient_norm > 0:
        return optax.chain(optax.clip_by_global_norm(gradient_norm), adam)
    return adam


def smoothed_loss(
    s: jax.Array, log_probs: jax.Array, mask: jax.Array, weight: float = 0.1
) -> jax.Array:
    """loss_smoothed (model_utils.py:140-150): label-smoothed cross
    entropy summed over valid positions / fixed 2000."""
    vocab = log_probs.shape[-1]
    s_onehot = jax.nn.one_hot(s, vocab, dtype=log_probs.dtype)
    s_onehot = s_onehot + weight / vocab
    s_onehot = s_onehot / jnp.sum(s_onehot, axis=-1, keepdims=True)
    loss = -jnp.sum(s_onehot * log_probs, axis=-1)
    return jnp.sum(loss * mask) / 2000.0


def nll_and_accuracy(
    s: jax.Array, log_probs: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """loss_nll (model_utils.py:128-137): mask-averaged NLL and the
    mask-weighted argmax recovery used for train/valid accuracy
    (training.py:167-169 sums true_false*mask / sum(mask))."""
    nll = -jnp.take_along_axis(log_probs, s[..., None], axis=-1)[..., 0]
    loss_av = jnp.sum(nll * mask) / jnp.sum(mask)
    acc = jnp.sum((jnp.argmax(log_probs, -1) == s) * mask) / jnp.sum(mask)
    return loss_av, acc


class MPNNTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_train_state(
    key: jax.Array,
    cfg: mpnn.MPNNConfig,
    optimizer: optax.GradientTransformation | None = None,
) -> MPNNTrainState:
    if optimizer is None:
        optimizer = make_mpnn_optimizer(cfg)
    params = mpnn.init_mpnn_params(key, cfg)
    return MPNNTrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_mpnn_train_step(
    cfg: mpnn.MPNNConfig,
    optimizer: optax.GradientTransformation | None = None,
    smoothing: float = 0.1,
):
    """Build the jitted (state, batch, key) -> (state, metrics) step.

    batch keys (featurize_chains / pipeline contract): X [B,L,4,3] (or
    [B,L,3] ca_only), S [B,L] int, mask [B,L], chain_M [B,L],
    residue_idx [B,L], chain_encoding_all [B,L].
    """
    if optimizer is None:
        optimizer = make_mpnn_optimizer(cfg)
    train_cfg = (
        cfg
        if cfg.augment_eps > 0
        else dataclasses.replace(cfg, augment_eps=0.2)
    )

    def loss_fn(params, batch, key):
        k_noise, k_order, k_drop = jax.random.split(key, 3)
        randn = jax.random.normal(k_order, batch["S"].shape)
        log_probs = mpnn.mpnn_log_probs(
            params,
            batch["X"],
            batch["S"],
            batch["mask"],
            batch["chain_M"],
            batch["residue_idx"],
            batch["chain_encoding_all"],
            train_cfg,
            randn=randn,
            key=k_noise,
            dropout_key=k_drop if train_cfg.dropout > 0 else None,
        )
        mask_full = batch["mask"] * batch["chain_M"]
        loss = smoothed_loss(batch["S"], log_probs, mask_full, smoothing)
        nll, acc = nll_and_accuracy(batch["S"], log_probs, mask_full)
        return loss, {"nll": nll, "accuracy": acc}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: MPNNTrainState, batch: dict, key: jax.Array):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "nll": aux["nll"],
            "accuracy": aux["accuracy"],
            "grad_norm": optax.global_norm(grads),
            "lr": noam_schedule(cfg.hidden_dim)(state.step),
        }
        return (
            MPNNTrainState(params, opt_state, state.step + 1),
            metrics,
        )

    return train_step


def make_mpnn_eval_step(cfg: mpnn.MPNNConfig):
    """Validation pass (training.py:174-188): teacher-forced forward with
    a random decoding order, NO backbone noise, reporting loss_nll +
    accuracy over mask*chain_M."""

    @jax.jit
    def eval_step(params, batch, key):
        randn = jax.random.normal(key, batch["S"].shape)
        log_probs = mpnn.mpnn_log_probs(
            params,
            batch["X"],
            batch["S"],
            batch["mask"],
            batch["chain_M"],
            batch["residue_idx"],
            batch["chain_encoding_all"],
            cfg,
            randn=randn,
        )
        mask_full = batch["mask"] * batch["chain_M"]
        nll, acc = nll_and_accuracy(batch["S"], log_probs, mask_full)
        return {"nll": nll, "accuracy": acc}

    return eval_step

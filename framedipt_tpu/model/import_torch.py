"""Import reference PyTorch checkpoints into flax parameter trees.

Maps the reference state_dict layout (framedipt/model/score_network.py +
ipa_pytorch.py module names; DDP ``module.`` prefixes stripped as in
experiments/inference.py:158) onto this framework's module tree. Enables
running the published ``inpainting.pth`` / ``denovo.pth`` weights on TPU.

Unused reference parameters (vestigial ``linear_rbf`` in IPA, the dead
``linear_3`` in TorsionAngles — neither participates in the reference
forward pass) are skipped.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _t(w) -> np.ndarray:
    """torch Linear weight [out, in] -> flax kernel [in, out]."""
    return np.ascontiguousarray(np.asarray(w).T)


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.asarray(value, np.float32)


def _linear(tree, dst, sd, src) -> None:
    _set(tree, f"{dst}/dense/kernel", _t(sd[f"{src}.weight"]))
    if f"{src}.bias" in sd:
        _set(tree, f"{dst}/dense/bias", sd[f"{src}.bias"])


def _layernorm(tree, dst, sd, src) -> None:
    _set(tree, f"{dst}/scale", sd[f"{src}.weight"])
    _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _mlp(tree, dst, sd, src, linear_indices=(0, 2, 4), ln_index=5) -> None:
    """nn.Sequential(Linear, ReLU, Linear, ReLU, Linear, LayerNorm)."""
    for i, t_idx in enumerate(linear_indices):
        _linear(tree, f"{dst}/linear_{i}", sd, f"{src}.{t_idx}")
    _layernorm(tree, f"{dst}/layer_norm", sd, f"{src}.{ln_index}")


def convert_state_dict(
    state_dict: Mapping[str, Any], num_blocks: int = 4, seq_tfmr_layers: int = 2
) -> dict:
    """Reference state_dict (numpy or torch tensors) -> flax params dict."""
    sd = {
        k.removeprefix("module."): np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
        for k, v in state_dict.items()
    }
    p: dict = {}

    # Embedder. Node MLP maps 1:1; the edge MLP's first layer is the
    # decomposed raw kernel (concat-free formulation in model/embed.py).
    _mlp(p, "embedding_layer/node_embedder", sd, "embedding_layer.node_embedder")
    _set(
        p,
        "embedding_layer/edge_embedder_w0",
        _t(sd["embedding_layer.edge_embedder.0.weight"]),
    )
    _set(p, "embedding_layer/edge_embedder_b0", sd["embedding_layer.edge_embedder.0.bias"])
    _set(
        p,
        "embedding_layer/edge_linear_1_kernel",
        _t(sd["embedding_layer.edge_embedder.2.weight"]),
    )
    _set(
        p,
        "embedding_layer/edge_linear_1_bias",
        sd["embedding_layer.edge_embedder.2.bias"],
    )
    _set(
        p,
        "embedding_layer/edge_linear_2_kernel",
        _t(sd["embedding_layer.edge_embedder.4.weight"]),
    )
    _set(
        p,
        "embedding_layer/edge_linear_2_bias",
        sd["embedding_layer.edge_embedder.4.bias"],
    )
    _set(
        p,
        "embedding_layer/edge_ln_scale",
        sd["embedding_layer.edge_embedder.5.weight"],
    )
    _set(
        p,
        "embedding_layer/edge_ln_bias",
        sd["embedding_layer.edge_embedder.5.bias"],
    )

    trunk = "score_model.trunk"
    for b in range(num_blocks):
        ipa_dst = f"score_model/ipa_{b}"
        ipa_src = f"{trunk}.ipa_{b}"
        for name in (
            "linear_q",
            "linear_kv",
            "linear_q_points",
            "linear_kv_points",
            "linear_b",
            "down_z",
            "linear_out",
        ):
            _linear(p, f"{ipa_dst}/{name}", sd, f"{ipa_src}.{name}")
        _set(p, f"{ipa_dst}/head_weights", sd[f"{ipa_src}.head_weights"])

        _layernorm(p, f"score_model/ipa_ln_{b}", sd, f"{trunk}.ipa_ln_{b}")
        _linear(p, f"score_model/skip_embed_{b}", sd, f"{trunk}.skip_embed_{b}")

        for layer in range(seq_tfmr_layers):
            t_src = f"{trunk}.seq_tfmr_{b}.layers.{layer}"
            t_dst = f"score_model/seq_tfmr_{b}_layer_{layer}"
            _set(
                p,
                f"{t_dst}/in_proj/dense/kernel",
                _t(sd[f"{t_src}.self_attn.in_proj_weight"]),
            )
            _set(
                p,
                f"{t_dst}/in_proj/dense/bias",
                sd[f"{t_src}.self_attn.in_proj_bias"],
            )
            _linear(p, f"{t_dst}/out_proj", sd, f"{t_src}.self_attn.out_proj")
            _linear(p, f"{t_dst}/ff_linear1", sd, f"{t_src}.linear1")
            _linear(p, f"{t_dst}/ff_linear2", sd, f"{t_src}.linear2")
            _layernorm(p, f"{t_dst}/norm1", sd, f"{t_src}.norm1")
            _layernorm(p, f"{t_dst}/norm2", sd, f"{t_src}.norm2")

        _linear(p, f"score_model/post_tfmr_{b}", sd, f"{trunk}.post_tfmr_{b}")
        nt_src = f"{trunk}.node_transition_{b}"
        nt_dst = f"score_model/node_transition_{b}"
        for i in (1, 2, 3):
            _linear(p, f"{nt_dst}/linear_{i}", sd, f"{nt_src}.linear_{i}")
        _layernorm(p, f"{nt_dst}/ln", sd, f"{nt_src}.ln")
        _linear(p, f"score_model/bb_update_{b}", sd, f"{trunk}.bb_update_{b}.linear")

        if b < num_blocks - 1:
            et_src = f"{trunk}.edge_transition_{b}"
            et_dst = f"score_model/edge_transition_{b}"
            _linear(p, f"{et_dst}/initial_embed", sd, f"{et_src}.initial_embed")
            # trunk_0 / final_layer are decomposed raw kernels in the TPU
            # EdgeTransition (concat-free formulation) — same math, kernels
            # sliced at runtime.
            _set(p, f"{et_dst}/trunk_0_kernel", _t(sd[f"{et_src}.trunk.0.weight"]))
            _set(p, f"{et_dst}/trunk_0_bias", sd[f"{et_src}.trunk.0.bias"])
            _set(p, f"{et_dst}/trunk_1_kernel", _t(sd[f"{et_src}.trunk.2.weight"]))
            _set(p, f"{et_dst}/trunk_1_bias", sd[f"{et_src}.trunk.2.bias"])
            _set(p, f"{et_dst}/final_kernel", _t(sd[f"{et_src}.final_layer.weight"]))
            _set(p, f"{et_dst}/final_bias", sd[f"{et_src}.final_layer.bias"])
            _set(p, f"{et_dst}/ln_scale", sd[f"{et_src}.layer_norm.weight"])
            _set(p, f"{et_dst}/ln_bias", sd[f"{et_src}.layer_norm.bias"])

    tp_src = "score_model.torsion_pred"
    tp_dst = "score_model/torsion_pred"
    _linear(p, f"{tp_dst}/linear_1", sd, f"{tp_src}.linear_1")
    _linear(p, f"{tp_dst}/linear_2", sd, f"{tp_src}.linear_2")
    _linear(p, f"{tp_dst}/linear_final", sd, f"{tp_src}.linear_final")

    return {"params": _nest(p)}


def _nest(flat: dict) -> dict:
    """Flat {'a/b': leaf} entries were already nested by _set; idempotent."""
    return flat


def load_torch_checkpoint(path: str) -> tuple[dict, dict | None]:
    """Load a reference .pth checkpoint: returns (state_dict, saved_config).

    Reference checkpoints are pickles {model, conf, optim, epoch, step}
    (framedipt/data/utils.py:381-417)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("model", ckpt)
    conf = ckpt.get("conf")
    if conf is not None and not isinstance(conf, dict):
        try:  # OmegaConf container without importing omegaconf
            conf = dict(conf)
        except Exception:  # pragma: no cover
            conf = None
    return state_dict, conf

"""Convert a reference ProteinMPNN ``.pt`` checkpoint to ``.npz``.

The in-process designer (tools/mpnn_design.load_mpnn_params) reads both
formats, but the ``.npz`` path needs no torch at runtime — use this once
where torch exists, ship the .npz to torch-free TPU serving environments.

    python scripts/convert_mpnn_weights.py weights/mpnn/v_48_020.pt \
        [--out weights/mpnn/v_48_020.npz]

Layout: flat state_dict names as npz keys + ``num_edges`` (the k_neighbors
the checkpoint was trained with, protein_mpnn_run.py:166-167).
"""
from __future__ import annotations

import argparse
import pathlib

import numpy as np


def convert(src: pathlib.Path, dst: pathlib.Path) -> None:
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=True)
    sd = {
        k: v.detach().cpu().numpy() for k, v in ckpt["model_state_dict"].items()
    }
    np.savez_compressed(
        dst, num_edges=np.int64(int(ckpt.get("num_edges", 48))), **sd
    )
    print(f"wrote {dst} ({dst.stat().st_size} bytes, {len(sd)} tensors)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("src", type=pathlib.Path)
    ap.add_argument("--out", type=pathlib.Path, default=None)
    args = ap.parse_args()
    convert(args.src, args.out or args.src.with_suffix(".npz"))

"""Fetch the published FrameDiPT checkpoints from HuggingFace.

The reference distributes two pre-trained weight sets, ``denovo.pth`` and
``inpainting.pth``, via the InstaDeepAI/FrameDiPTModels HuggingFace repo
(/root/reference/README.md, "Download Pre-trained Weights"). This script
downloads them to ``weights/`` so the real-checkpoint parity tests
(tests/parity/test_real_checkpoint_parity.py) can run. In offline
environments it exits gracefully with a message — those tests skip when the
files are absent.

Usage: python scripts/fetch_weights.py [--out weights/]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import urllib.error
import urllib.request

BASE = "https://huggingface.co/InstaDeepAI/FrameDiPTModels/resolve/main/weights"
FILES = ("inpainting.pth", "denovo.pth")
# Released ProteinMPNN vanilla weights (for the in-process JAX MPNN,
# framedipt_tpu/model/mpnn.py). Same checkpoint protein_mpnn_run.py loads
# by default (model_name v_48_020).
MPNN_URL = (
    "https://github.com/dauparas/ProteinMPNN/raw/main/"
    "vanilla_model_weights/v_48_020.pt"
)


def fetch(out_dir: pathlib.Path, timeout: float = 30.0) -> int:
    out_dir.mkdir(parents=True, exist_ok=True)
    failures = 0
    extra = [("mpnn/v_48_020.pt", MPNN_URL)]
    for name in FILES:
        dest = out_dir / name
        if dest.exists() and dest.stat().st_size > 1_000_000:
            print(f"{dest} already present ({dest.stat().st_size} bytes)")
            continue
        url = f"{BASE}/{name}"
        print(f"downloading {url} -> {dest}")
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                dest.write_bytes(resp.read())
            print(f"  ok ({dest.stat().st_size} bytes)")
        except (urllib.error.URLError, OSError, TimeoutError) as exc:
            failures += 1
            print(f"  FAILED: {exc} (offline environment? tests will skip)")
            if dest.exists():
                dest.unlink()
    for rel, url in extra:
        dest = out_dir / rel
        if dest.exists() and dest.stat().st_size > 1_000_000:
            print(f"{dest} already present ({dest.stat().st_size} bytes)")
            continue
        dest.parent.mkdir(parents=True, exist_ok=True)
        print(f"downloading {url} -> {dest}")
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
                dest.write_bytes(resp.read())
            print(f"  ok ({dest.stat().st_size} bytes)")
        except (urllib.error.URLError, OSError, TimeoutError) as exc:
            failures += 1
            print(f"  FAILED: {exc} (offline environment? tests will skip)")
            if dest.exists():
                dest.unlink()
    return failures


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights")
    args = ap.parse_args()
    sys.exit(1 if fetch(pathlib.Path(args.out)) else 0)

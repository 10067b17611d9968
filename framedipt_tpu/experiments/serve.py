"""Minimal inference server for production serving.

Loads the model once (weights + jitted samplers stay resident; programs are
compiled per length bucket and cached), then serves inpainting requests over
HTTP. This is a TPU-native addition beyond the reference's batch CLI: the
chip stays warm between requests and repeat requests at the same bucket
length run at full sampler throughput.

POST /inpaint
    body: {"pdb": "<pdb text>", "chain": "A", "start": 10, "end": 20,
           "samples": 5, "num_t": 100}
    returns: {"samples": ["<pdb text>", ...], "seconds": float}

GET /healthz -> {"status": "ok"}

Usage:
    python -m framedipt_tpu.experiments.serve --port=8900 \
        [--weights=weights/inpainting.pth] [config overrides...]
"""
from __future__ import annotations

import argparse
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

import jax
import jax.numpy as jnp

from framedipt_tpu.analysis.utils import write_prot_to_pdb
from framedipt_tpu.data import constants as rc
from framedipt_tpu.data import features as feature_lib
from framedipt_tpu.data import transforms
from framedipt_tpu.data.protein import from_pdb_string, int_to_chain_id
from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.geometry.rigid import Rigid
from framedipt_tpu.model import ScoreNetwork
from framedipt_tpu.model.import_torch import convert_state_dict, load_torch_checkpoint
from framedipt_tpu.sampling import build_inference_fn
from framedipt_tpu.tools.config import Config, load_config, merge_checkpoint_config
from framedipt_tpu.tools.log import get_logger

logger = get_logger()


class InpaintingService:
    def __init__(self, cfg: Config) -> None:
        self.cfg = cfg
        weights = cfg.inference.weights_path
        self._params = None
        if weights:
            state_dict, ckpt_conf = load_torch_checkpoint(weights)
            if ckpt_conf:
                cfg = merge_checkpoint_config(cfg, ckpt_conf)
            self.cfg = cfg
            self._state_dict = state_dict
        self.diffuser = SE3Diffuser(cfg.diffuser)
        # Same auto-kernel policy as the inference CLI (TPU-only).
        from framedipt_tpu.experiments.utils import (
            resolve_pallas_flags,
            setup_compilation_cache,
        )

        resolve_pallas_flags(cfg, logger)
        setup_compilation_cache(cfg, logger)
        self.model = ScoreNetwork(cfg.model, self.diffuser, inpainting=True)
        if weights:
            self._params = jax.tree_util.tree_map(
                jnp.asarray,
                convert_state_dict(
                    self._state_dict,
                    num_blocks=cfg.model.ipa.num_blocks,
                    seq_tfmr_layers=cfg.model.ipa.seq_tfmr_num_layers,
                ),
            )
        self._run_cache: dict[int, object] = {}
        self._req_count = 0
        self._warmed: list[dict] = []

    def warmup(
        self, buckets: list[int], samples: int = 1, num_t: int = 100
    ) -> None:
        """Pre-compile the sampler for (bucket, samples, num_t) shapes so
        the first real request is served from a warm program — a cold
        compile costs 20-40 s on TPU. The synthetic case mirrors the
        request path's feature pytree exactly (same keys/dtypes), so the
        jit cache hit is guaranteed for matching request shapes."""
        for bucket in buckets:
            n = bucket
            diffused = np.zeros(n, np.float32)
            diffused[: max(1, n // 8)] = 1.0
            rigids_t = np.asarray(
                self.diffuser.sample_ref(
                    jax.random.PRNGKey(0), n_samples=n
                ).to_tensor7(),
                np.float32,
            )
            base = {
                "res_mask": np.ones(n, np.float32),
                "fixed_mask": (1.0 - diffused).astype(np.float32),
                "seq_idx": np.arange(n, dtype=np.int64),
                "sc_ca_t": np.zeros((n, 3), np.float32),
                "torsion_angles_sin_cos": np.zeros((n, 7, 2), np.float32),
                "aatype": np.zeros(n, np.int64),
                "rigids_t": rigids_t,
                "t": np.asarray(1.0, np.float32),
            }
            batched = {
                k: np.stack([v] * samples) for k, v in base.items()
            }
            feats = {k: jnp.asarray(v) for k, v in batched.items()}
            feats["aatype"] = feats["aatype"].astype(jnp.int32)
            self._ensure_params(feats)
            t0 = time.perf_counter()
            out = self._runner(num_t)(
                self._params, feats, jax.random.PRNGKey(1)
            )
            np.asarray(out["prot_traj"][0])  # force execution
            took = time.perf_counter() - t0
            self._warmed.append(
                {"bucket": bucket, "samples": samples, "num_t": num_t}
            )
            logger.info(
                f"warmed bucket {bucket} (S={samples}, num_t={num_t}) "
                f"in {took:.1f}s"
            )

    def _ensure_params(self, example_feats) -> None:
        if self._params is None:
            logger.warning("serving with RANDOM weights (no checkpoint given)")
            self._params = jax.jit(self.model.init)(
                jax.random.PRNGKey(0), example_feats
            )

    def _runner(self, num_t: int):
        if num_t not in self._run_cache:
            self._run_cache[num_t] = build_inference_fn(
                self.model,
                self.diffuser,
                num_t=num_t,
                min_t=self.cfg.inference.diffusion.min_t,
                noise_scale=self.cfg.inference.diffusion.noise_scale,
                inpainting=True,
                aux_traj=False,
            )
        return self._run_cache[num_t]

    def inpaint(
        self, pdb_text: str, chain: str, start: int, end: int,
        samples: int, num_t: int,
    ) -> list[str]:
        prot = from_pdb_string(pdb_text)
        n = len(prot.aatype)
        sorted_ids = sorted(set(int(c) for c in prot.chain_index))
        letter_for = {cid: int_to_chain_id(i) for i, cid in enumerate(sorted_ids)}
        chain_sel = np.asarray(
            [letter_for[int(c)] == chain for c in prot.chain_index]
        )
        if not chain_sel.any():
            raise ValueError(f"chain {chain!r} not found")
        chain_rows = np.where(chain_sel)[0]
        region_rows = chain_rows[start : end + 1]
        diffused = np.zeros(n, np.float32)
        diffused[region_rows] = 1.0

        rigids_0 = transforms.backbone_rigid_tensor7(
            prot.aatype, prot.atom_positions, prot.atom_mask
        )
        torsions = transforms.atom37_to_torsion_angles(
            prot.aatype, prot.atom_positions, prot.atom_mask
        )["torsion_angles_sin_cos"]

        bucket = feature_lib.length_bucket(n)
        base = {
            "res_mask": prot.atom_mask[:, rc.CA_IDX].astype(np.float32),
            "fixed_mask": (1.0 - diffused).astype(np.float32),
            "seq_idx": np.arange(n, dtype=np.int64),
            "sc_ca_t": np.zeros((n, 3), np.float32),
            "torsion_angles_sin_cos": torsions.astype(np.float32),
            "aatype": prot.aatype.astype(np.int64),
            "rigids_0": rigids_0,
            "t": np.asarray(1.0, np.float32),
        }
        # One batch entry per requested sample, each with its own t=1 draw.
        entries = []
        for s in range(samples):
            key = jax.random.fold_in(
                jax.random.PRNGKey(self.cfg.inference.seed), self._req_count * 997 + s
            )
            rigids_t = self.diffuser.sample_ref(
                key,
                n_samples=n,
                impute=Rigid.from_tensor7(jnp.asarray(rigids_0)),
                diffuse_mask=jnp.asarray(diffused),
            )
            item = dict(base)
            item["rigids_t"] = np.asarray(rigids_t.to_tensor7(), np.float32)
            item = feature_lib.pad_feats(item, bucket)
            entries.append(item)
        batched = {
            k: np.stack([e[k] for e in entries]) for k in entries[0]
        }
        self._req_count += 1

        feats = {
            k: jnp.asarray(v)
            for k, v in batched.items()
            if k not in ("rigids_0",)
        }
        feats["aatype"] = feats["aatype"].astype(jnp.int32)
        self._ensure_params(feats)
        run = self._runner(num_t)
        out = run(
            self._params, feats, jax.random.fold_in(
                jax.random.PRNGKey(self.cfg.inference.seed + 1), self._req_count
            )
        )
        prot_final = np.asarray(out["prot_traj"][0])  # t=0 frame, [S, N, 37, 3]

        res_mask = base["res_mask"].astype(bool)
        b_factors = np.tile((diffused * 100.0)[:, None], (1, 37))
        pdbs = []
        for s in range(samples):
            import tempfile, pathlib

            with tempfile.TemporaryDirectory() as td:
                path = write_prot_to_pdb(
                    prot_final[s][:n][res_mask],
                    pathlib.Path(td) / "sample",
                    aatype=prot.aatype[res_mask],
                    b_factors=b_factors[res_mask],
                    residue_index=prot.residue_index[res_mask],
                    chain_index=prot.chain_index[res_mask],
                )
                pdbs.append(path.read_text())
        return pdbs


def make_handler(service: InpaintingService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            logger.info("http: " + fmt % args)

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(
                    200, {"status": "ok", "warmed": service._warmed}
                )
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/inpaint":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                t0 = time.perf_counter()
                pdbs = service.inpaint(
                    pdb_text=req["pdb"],
                    chain=req.get("chain", "A"),
                    start=int(req["start"]),
                    end=int(req["end"]),
                    samples=int(req.get("samples", 1)),
                    num_t=int(req.get("num_t", 100)),
                )
                self._json(
                    200,
                    {"samples": pdbs, "seconds": time.perf_counter() - t0},
                )
            except Exception as e:  # noqa: BLE001 - report to client
                logger.warning(f"request failed: {type(e).__name__}: {e}")
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8900)
    ap.add_argument("--weights", default="")
    ap.add_argument(
        "--warmup",
        default="",
        help="comma-separated length buckets to pre-compile before "
        "binding the port (e.g. 256,512); requests with other "
        "(bucket, samples, num_t) shapes still compile on first hit",
    )
    ap.add_argument("--warmup_samples", type=int, default=1)
    ap.add_argument("--warmup_num_t", type=int, default=100)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(None, args.overrides)
    cfg.inference.weights_path = args.weights
    service = InpaintingService(cfg)
    if args.warmup:
        service.warmup(
            [int(b) for b in args.warmup.split(",") if b],
            samples=args.warmup_samples,
            num_t=args.warmup_num_t,
        )
    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(service))
    logger.info(f"serving on http://127.0.0.1:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()

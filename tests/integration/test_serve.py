"""HTTP inference server smoke test: boot serve.py as a subprocess with a
tiny random-weight model on CPU, hit /healthz and /inpaint, and check that
the fixed region of the returned PDB is untouched while the requested
region was resampled.

The serve recipe mirrors the verify-skill drive (nohup + PID, kill by PID —
never by pattern).
"""
import json
import os
import pathlib
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent.parent

sys.path.insert(0, str(REPO / "tests" / "unit"))

TINY_OVERRIDES = [
    "model.node_embed_size=32",
    "model.edge_embed_size=16",
    "model.ipa.c_s=32",
    "model.ipa.c_z=16",
    "model.ipa.c_hidden=16",
    "model.ipa.c_skip=8",
    "model.ipa.no_heads=2",
    "model.ipa.no_qk_points=4",
    "model.ipa.no_v_points=4",
    "model.ipa.num_blocks=1",
    "model.ipa.seq_tfmr_num_layers=1",
    "model.ipa.seq_tfmr_num_heads=2",
    "diffuser.so3.num_omega=50",
    "diffuser.so3.num_sigma=20",
    "diffuser.so3.cache_dir=null",
]


def _helix_pdb(n_res: int = 24) -> str:
    from geom_helpers import nerf_backbone

    from framedipt_tpu.data.protein import Protein, to_pdb

    atom37, mask = nerf_backbone(n_res)
    prot = Protein(
        atom_positions=atom37,
        atom_mask=mask,
        aatype=np.zeros(n_res, np.int32),
        residue_index=np.arange(1, n_res + 1),
        chain_index=np.zeros(n_res, np.int32),
        b_factors=np.zeros((n_res, 37)),
    )
    return to_pdb(prot)


@pytest.mark.slow
def test_serve_inpaint_roundtrip(tmp_path):
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    env = dict(os.environ)
    # JAX_PLATFORMS alone is not enough: the axon sitecustomize overrides it
    # via jax.config, and when the TPU tunnel is wedged the child then hangs
    # at backend registration. Unset the gate so the plugin never loads.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_comp_cache_cpu"
    log = open(tmp_path / "serve.log", "w")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "framedipt_tpu.experiments.serve",
            f"--port={port}",
            # Pre-compile the exact (bucket=64, S=2, num_t=2) program the
            # request below uses, so it must be served from the warm cache.
            "--warmup=64", "--warmup_samples=2", "--warmup_num_t=2",
            *TINY_OVERRIDES,
        ],
        cwd=str(REPO), env=env, stdout=log, stderr=log,
    )
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = time.time() + 300
        while True:
            try:
                with urllib.request.urlopen(base + "/healthz", timeout=5) as r:
                    health = json.load(r)
                    assert health["status"] == "ok"
                break
            except Exception:  # noqa: BLE001
                if proc.poll() is not None:
                    log.close()
                    raise AssertionError(
                        "server died:\n"
                        + (tmp_path / "serve.log").read_text()[-3000:]
                    ) from None
                if time.time() > deadline:
                    raise
                time.sleep(2.0)

        # Outside the retry loop so a regression fails fast rather than
        # being swallowed and retried for the full readiness deadline.
        # The port binds only after warmup, so /healthz already reports
        # the pre-compiled program.
        assert health["warmed"] == [{"bucket": 64, "samples": 2, "num_t": 2}]

        pdb = _helix_pdb(24)
        body = json.dumps(
            {
                "pdb": pdb, "chain": "A", "start": 8, "end": 15,
                "samples": 2, "num_t": 2,
            }
        ).encode()
        req = urllib.request.Request(
            base + "/inpaint", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=900) as r:
            out = json.load(r)
        assert len(out["samples"]) == 2

        from framedipt_tpu.data.protein import from_pdb_string

        orig = from_pdb_string(pdb)
        for sample_pdb in out["samples"]:
            got = from_pdb_string(sample_pdb)
            ca = got.atom_positions[:, 1]
            assert np.isfinite(ca).all()
            # Fixed residues keep their input CA coordinates up to the
            # frames->atom37 reconstruction round trip (input atoms ->
            # backbone rigids -> idealized atoms; <=0.06 A on this helix).
            fixed_rows = np.r_[0:8, 16:24]
            np.testing.assert_allclose(
                ca[fixed_rows], orig.atom_positions[fixed_rows, 1], atol=0.1
            )
            # The diffused region actually moved (random weights, t=1 noise).
            moved = np.abs(ca[8:16] - orig.atom_positions[8:16, 1]).max()
            assert moved > 0.1, moved
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        log.close()


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])

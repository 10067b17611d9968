"""Component-level timing of the score-network forward on the real chip.

Times each sub-module (embedder, IPA attention, edge transition, sequence
transformer) in-scan (lax.scan over K calls with varying inputs, so per-call
dispatch amortizes and the executor cannot dedup identical steps), mirroring
how the sampler executes them. Prints a table attributing the full forward's
time to components. Run with no args on the TPU:

    python scripts/profile_step.py [N]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from framedipt_tpu.geometry.rigid import Rigid  # noqa: E402
from framedipt_tpu.model.embed import Embedder  # noqa: E402
from framedipt_tpu.model.ipa import (  # noqa: E402
    EdgeTransition,
    InvariantPointAttention,
    SeqTransformerLayer,
    StructureModuleTransition,
)
from framedipt_tpu.tools.config import Config  # noqa: E402

DT = jnp.bfloat16


def timed_scan(fn, params, args, steps_lo=50, steps_hi=200):
    """Per-call ms via the two-length slope: time a scan of `steps_lo` calls
    and one of `steps_hi`, and divide the difference by the step delta.

    Pitfalls this harness defends against (PERF.md measurement note):
    - zero-init final layers let XLA constant-fold a whole module away, so
      params are re-randomized before timing;
    - ``jax.block_until_ready`` on the scalar result of a jitted scan can
      RETURN WITHOUT EXECUTING on the tunneled backend (totals read ~0.1 ms
      and the first value fetch then pays the whole compile+run), so every
      timed call forces the value to host with ``float()``;
    - the remote executor dedups repeated identical calls, so a per-rep
      time-salted seed feeds the computation;
    - the dispatch round-trip (~30 ms on the tunneled executor) would swamp a
      short scan — the slope between two scan lengths cancels it exactly.
    """
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [
        0.05 * jax.random.normal(k, l.shape, jnp.float32).astype(l.dtype)
        for k, l in zip(keys, leaves)
    ]
    params = jax.tree.unflatten(treedef, leaves)

    def make(steps):
        @jax.jit
        def run(params, args, seed):
            def body(carry, i):
                out = fn(params, *jax.tree.map(lambda a: a, args), i)
                return carry + jnp.sum(out.astype(jnp.float32)), None

            xs = seed + jnp.arange(steps, dtype=jnp.float32) * 1e-6
            tot, _ = jax.lax.scan(body, 0.0, xs)
            return tot

        return run

    salt = (time.time_ns() % 1_000_000_007) * 1e-12
    totals = {}
    for si, steps in enumerate((steps_lo, steps_hi)):
        run = make(steps)
        float(run(params, args, jnp.float32(salt)))  # compile + execute
        times = []
        for rep in range(3):
            seed = jnp.float32(salt + (si * 3 + rep + 1) * 1e-4)
            t0 = time.perf_counter()
            float(run(params, args, seed))  # value-forced: see docstring
            times.append(time.perf_counter() - t0)
        totals[steps] = min(times)
        if os.environ.get("PROFILE_DEBUG"):
            print(f"    steps={steps} totals={[f'{t*1e3:.1f}' for t in times]} ms")
    return (totals[steps_hi] - totals[steps_lo]) / (steps_hi - steps_lo) * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    only = sys.argv[2] if len(sys.argv) > 2 else None
    B = 1
    cfg = Config()
    ipa_conf = cfg.model.ipa
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)

    s = jax.random.normal(ks[0], (B, N, ipa_conf.c_s), DT)
    z = jax.random.normal(ks[1], (B, N, N, cfg.model.edge_embed_size), DT)
    mask = jnp.ones((B, N), jnp.float32)

    rows = {}

    def want(name):
        return only is None or only == name

    # Every section is lazy so one process builds (and compiles) only the
    # component it measures.

    # IPA attention (XLA path). The frame tensors are built only here:
    # their eager ops on the tunneled backend poison later measurements.
    if want("ipa"):
        quats = jax.random.normal(ks[2], (B, N, 4), jnp.float32)
        quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
        trans = jax.random.normal(ks[3], (B, N, 3), jnp.float32)
        t7 = jnp.concatenate([quats, trans], axis=-1)
        rigids = Rigid.from_tensor7(t7)
        ipa = InvariantPointAttention(ipa_conf, dtype=DT)
        p_ipa = jax.jit(ipa.init)(ks[4], s, z, rigids, mask)

        def run_ipa(p, s, z, t7, mask, i):
            # z must vary per step: in the sampler the pair rep is rebuilt
            # every diffusion step, so the kernel-hoisting XLA would do for
            # a loop-invariant z never happens in real execution.
            r = Rigid.from_tensor7(t7)
            return ipa.apply(p, s + i * 1e-6, z + i.astype(z.dtype), r, mask)

        rows["ipa_attention (x4)"] = (
            timed_scan(run_ipa, p_ipa, (s, z, t7, mask)), 4
        )

    # Edge transition, XLA and pallas. Init lazily: module init traces (and
    # on TPU, compiles) the kernel, so only build what this process times.
    for use_pallas in (False, True):
        label = "et_pallas" if use_pallas else "et_xla"
        if not want(label):
            continue
        et = EdgeTransition(
            node_embed_size=ipa_conf.c_s,
            edge_embed_out=cfg.model.edge_embed_size,
            dtype=DT,
            use_pallas=use_pallas,
        )
        p_et = jax.jit(et.init)(ks[5], s, z, mask.astype(DT))

        def run_et(p, s, z, mask, i, _et=et):
            return _et.apply(
                p, s + i * 1e-6, z + i.astype(z.dtype), mask.astype(DT)
            )

        rows[label + " (x3)"] = (timed_scan(run_et, p_et, (s, z, mask)), 3)

    # Edge-transition value+grad: the training-path A/B for the backward.
    #   et_grad_xla    — plain XLA module (saved-activation backward)
    #   et_grad_remat  — kernel forward + remat-through-XLA-twin backward
    #   et_grad_pallas — kernel forward + fused Pallas backward kernel
    for label, use_pallas, bwd in (
        ("et_grad_xla", False, "xla"),
        ("et_grad_remat", True, "xla"),
        ("et_grad_pallas", True, "pallas"),
    ):
        if not want(label):
            continue
        et_g = EdgeTransition(
            node_embed_size=ipa_conf.c_s,
            edge_embed_out=cfg.model.edge_embed_size,
            dtype=DT,
            use_pallas=use_pallas,
            bwd_impl=bwd,
        )
        p_etg = jax.jit(et_g.init)(ks[5], s, z, mask.astype(DT))

        def run_etg(p, s, z, mask, i, _et=et_g):
            def loss(pp):
                out = _et.apply(
                    pp, s + i * 1e-6, z + i.astype(z.dtype), mask.astype(DT)
                )
                return jnp.sum(out.astype(jnp.float32))

            grads = jax.grad(loss)(p)
            # Sum every leaf so no gradient is dead-code-eliminated.
            return sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(grads)
            )

        rows[label + " (x3)"] = (
            timed_scan(run_etg, p_etg, (s, z, mask)), 3
        )

    # Sequence transformer layer (x8 = 4 blocks x 2 layers).
    if want("seq_tfmr"):
        d_model = ipa_conf.c_s + ipa_conf.c_skip
        st = SeqTransformerLayer(
            d_model=d_model, num_heads=ipa_conf.seq_tfmr_num_heads, dtype=DT
        )
        x = jax.random.normal(ks[6], (B, N, d_model), DT)
        p_st = jax.jit(st.init)(ks[7], x, mask)

        def run_st(p, x, mask, i):
            return st.apply(p, x + i * 1e-6, mask)

        rows["seq_tfmr_layer (x8)"] = (timed_scan(run_st, p_st, (x, mask)), 8)

    # Node transition (x4).
    if want("node_transition"):
        nt = StructureModuleTransition(c=ipa_conf.c_s, dtype=DT)
        p_nt = jax.jit(nt.init)(ks[8], s)

        def run_nt(p, s, i):
            return nt.apply(p, s + i * 1e-6)

        rows["node_transition (x4)"] = (timed_scan(run_nt, p_nt, (s,)), 4)

    # Embedder (x1).
    if want("embedder"):
        emb = Embedder(cfg.model, inpainting=True, dtype=DT)
        seq_idx = jnp.tile(jnp.arange(N)[None], (B, 1))
        tt = jnp.full((B,), 0.5)
        fixed = jnp.zeros((B, N))
        sc_ca = jax.random.normal(ks[9], (B, N, 3), jnp.float32)
        aatype = jnp.zeros((B, N), jnp.int32)
        p_emb = jax.jit(emb.init)(
            key, seq_idx=seq_idx, t=tt, fixed_mask=fixed,
            self_conditioning_ca=sc_ca, aatype=aatype,
        )

        def run_emb(p, sc_ca, i):
            n, e = emb.apply(
                p, seq_idx=seq_idx, t=tt, fixed_mask=fixed,
                self_conditioning_ca=sc_ca + i * 1e-6, aatype=aatype,
            )
            return e

        rows["embedder (x1)"] = (timed_scan(run_emb, p_emb, (sc_ca,)), 1)

    # Embedder value+grad: the training-path A/B for the embedder backward.
    #   emb_grad_xla    — plain XLA embedder (saved-activation backward)
    #   emb_grad_remat  — kernel forward + remat-through-XLA-twin backward
    #   emb_grad_pallas — kernel forward + fused Pallas backward kernel
    for label, use_pallas_emb, emb_bwd in (
        ("emb_grad_xla", False, "xla"),
        ("emb_grad_remat", True, "xla"),
        ("emb_grad_pallas", True, "pallas"),
    ):
        if not want(label):
            continue
        import dataclasses

        mc = dataclasses.replace(cfg.model, compute_dtype="bfloat16")
        mc.ipa = dataclasses.replace(
            mc.ipa, use_pallas_embedder=use_pallas_emb,
            pallas_emb_bwd_impl=emb_bwd,
        )
        emb_g = Embedder(mc, inpainting=True, dtype=DT,
                         use_pallas=use_pallas_emb)
        seq_idx = jnp.tile(jnp.arange(N)[None], (B, 1))
        tt = jnp.full((B,), 0.5)
        fixed = jnp.zeros((B, N))
        sc_ca = jax.random.normal(ks[9], (B, N, 3), jnp.float32)
        aatype = jnp.zeros((B, N), jnp.int32)
        nmask = jnp.ones((B, N)) if use_pallas_emb else None
        p_embg = jax.jit(emb_g.init)(
            key, seq_idx=seq_idx, t=tt, fixed_mask=fixed,
            self_conditioning_ca=sc_ca, aatype=aatype, node_mask=nmask,
        )
        # Zero-init final layers would let XLA fold modules away; perturb.
        p_embg = jax.tree.map(
            lambda x: x + 0.02 * jax.random.normal(
                jax.random.fold_in(key, x.size), x.shape, x.dtype
            ).astype(x.dtype),
            p_embg,
        )

        def run_embg(p, sc_ca, i, _emb=emb_g, _nm=nmask):
            def loss(pp):
                n_, e_ = _emb.apply(
                    pp, seq_idx=seq_idx, t=tt, fixed_mask=fixed,
                    self_conditioning_ca=sc_ca + i * 1e-6,
                    aatype=aatype, node_mask=_nm,
                )
                return jnp.sum(e_.astype(jnp.float32))

            grads = jax.grad(loss)(p)
            return sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(grads)
            )

        rows[label + " (x1)"] = (
            timed_scan(run_embg, p_embg, (sc_ca,)), 1
        )

    for name, (ms, mult) in rows.items():
        print(f"RESULT {name:24s} {ms:8.4f} ms x{mult} -> {ms * mult:8.4f} ms/fwd")


def driver(N):
    """Run each component in its own process: the tunneled executor retires
    work asynchronously, so a single process mis-attributes time between
    back-to-back measurements of different executables."""
    import subprocess

    comps = [
        "embedder", "ipa", "et_xla", "et_pallas",
        "et_grad_xla", "et_grad_remat", "et_grad_pallas",
        "emb_grad_xla", "emb_grad_remat", "emb_grad_pallas",
        "seq_tfmr", "node_transition",
    ]
    print(f"N={N} B=1 dtype=bf16 (ms per single call, in-scan; slope method)")
    for comp in comps:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(N), comp],
            capture_output=True, text=True, timeout=900,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT"):
                print("  " + line[7:])
        if out.returncode != 0:
            print(f"  {comp}: FAILED\n{out.stderr[-500:]}")


if __name__ == "__main__":
    if len(sys.argv) > 2:
        main()
    else:
        driver(int(sys.argv[1]) if len(sys.argv) > 1 else 512)

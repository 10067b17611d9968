"""Numerical parity of host featurization + frame math vs the reference
torch implementation (imported as an oracle, never shipped)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from framedipt_tpu.data import transforms as my_transforms
from framedipt_tpu.geometry import frames as my_frames
from framedipt_tpu.geometry.rigid import Rigid


def synthetic_structure(n=24, seed=0):
    """A random but physically plausible backbone + full atom37 coverage for
    a run of residue types."""
    rng = np.random.default_rng(seed)
    aatype = rng.integers(0, 20, size=(n,))
    atom37 = rng.normal(size=(n, 37, 3)).astype(np.float64) * 2
    # Give every residue a plausible local backbone geometry.
    ca = np.cumsum(rng.normal(size=(n, 3)) * 2 + np.asarray([3.0, 0, 0]), axis=0)
    atom37[:, 1] = ca  # CA
    atom37[:, 0] = ca + rng.normal(scale=0.2, size=(n, 3)) + [-1.4, 0.4, 0]  # N
    atom37[:, 2] = ca + rng.normal(scale=0.2, size=(n, 3)) + [1.5, 0.3, 0]  # C
    atom37[:, 4] = atom37[:, 2] + rng.normal(scale=0.2, size=(n, 3)) + [0.6, 1.0, 0]  # O
    mask = np.zeros((n, 37), np.float64)
    mask[:, :5] = 1.0  # N CA C CB O
    atom37[:, 3] = ca + rng.normal(scale=0.3, size=(n, 3)) + [0, -1.3, 0.6]  # CB
    # A few side-chain atoms for chi coverage.
    mask[:, 5:11] = rng.integers(0, 2, size=(n, 6))
    atom37 = atom37 * mask[..., None]
    return aatype, atom37, mask


@pytest.fixture(scope="module")
def ref_feats(reference):
    aatype, atom37, mask = synthetic_structure()
    prot = {
        "aatype": torch.tensor(aatype).long(),
        "all_atom_positions": torch.tensor(atom37).double(),
        "all_atom_mask": torch.tensor(mask).double(),
    }
    prot = reference.transforms.atom37_to_frames(prot)
    prot = reference.transforms.make_atom14_masks(prot)
    prot = reference.transforms.make_atom14_positions(prot)
    prot = reference.transforms.atom37_to_torsion_angles()(prot)
    return (aatype, atom37, mask), prot


class TestFrames:
    def test_rigidgroups_gt_frames(self, ref_feats):
        (aatype, atom37, mask), prot = ref_feats
        mine = my_transforms.atom37_to_frames(aatype, atom37, mask)
        ref = prot["rigidgroups_gt_frames"].numpy()
        got = mine["rigidgroups_gt_frames"]
        exists = mine["rigidgroups_gt_exists"][..., None, None]
        np.testing.assert_allclose(
            got * exists, ref * exists, atol=2e-5
        )

    def test_group_exists(self, ref_feats):
        (aatype, atom37, mask), prot = ref_feats
        mine = my_transforms.atom37_to_frames(aatype, atom37, mask)
        np.testing.assert_allclose(
            mine["rigidgroups_gt_exists"],
            prot["rigidgroups_gt_exists"].numpy(),
            atol=1e-6,
        )


class TestTorsions:
    def test_torsion_angles(self, ref_feats):
        (aatype, atom37, mask), prot = ref_feats
        mine = my_transforms.atom37_to_torsion_angles(aatype, atom37, mask)
        ref_tor = prot["torsion_angles_sin_cos"].numpy()
        ref_mask = prot["torsion_angles_mask"].numpy()
        diff = np.abs(mine["torsion_angles_sin_cos"] - ref_tor) * ref_mask[..., None]
        assert diff.max() < 2e-4, f"torsion mismatch {diff.max()}"
        np.testing.assert_allclose(
            mine["torsion_angles_mask"], ref_mask, atol=1e-6
        )


class TestAtom14:
    def test_atom14_positions(self, ref_feats):
        (aatype, atom37, mask), prot = ref_feats
        mine = my_transforms.make_atom14_positions(aatype, atom37, mask)
        np.testing.assert_allclose(
            mine["atom14_gt_positions"],
            prot["atom14_gt_positions"].numpy(),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            mine["residx_atom14_to_atom37"],
            prot["residx_atom14_to_atom37"].numpy(),
        )


class TestComputeBackbone:
    def test_compute_backbone_parity(self, reference):
        rng = np.random.default_rng(1)
        n = 16
        q = rng.normal(size=(1, n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        trans = rng.normal(size=(1, n, 3)).astype(np.float32) * 8
        psi = rng.normal(size=(1, n, 2)).astype(np.float32)
        psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
        aatype = rng.integers(0, 20, size=(1, n))

        t7 = np.concatenate([q, trans], axis=-1)
        rig = reference.rigid.Rigid.from_tensor_7(
            torch.tensor(t7), normalize_quats=True
        )
        ref_out = reference.all_atom.compute_backbone(
            rig, torch.tensor(psi), aatype=torch.tensor(aatype).long()
        )

        mine = my_frames.compute_backbone(
            Rigid.from_tensor7(jnp.asarray(t7), normalize=True),
            jnp.asarray(psi),
            aatype=jnp.asarray(aatype),
        )
        np.testing.assert_allclose(
            np.asarray(mine[0]), ref_out[0].numpy(), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(mine[3]), ref_out[3].numpy(), atol=5e-6
        )

    def test_backbone_rigid_roundtrip(self):
        # atom37 -> backbone frame -> idealized atoms -> frame again.
        aatype, atom37, mask = synthetic_structure(seed=3)
        t7 = my_transforms.backbone_rigid_tensor7(aatype, atom37, mask)
        r = Rigid.from_tensor7(jnp.asarray(t7))
        psi = jnp.zeros((len(aatype), 2)).at[:, 1].set(1.0)
        a37, m37, _, _ = my_frames.compute_backbone(r, psi, jnp.asarray(aatype))
        t7_2 = my_transforms.backbone_rigid_tensor7(
            aatype, np.asarray(a37), np.asarray(m37, np.float64)
        )
        # CA (= frame origin) round-trips exactly; quats up to sign.
        np.testing.assert_allclose(t7_2[:, 4:], t7[:, 4:], atol=1e-3)
        dots = np.abs(np.sum(t7_2[:, :4] * t7[:, :4], axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

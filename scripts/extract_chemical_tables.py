"""Extract AlphaFold2 chemical constant tables into a binary data artifact.

These are physical-chemistry data (ideal residue geometry, atom naming
conventions, rigid-group frame definitions) originally published with
AlphaFold2 (Jumper et al. 2021, CC-BY-4.0) and present in the reference at
framedipt/protein/residue_constants.py. They are *data*, not code: the TPU
framework loads them from ``framedipt_tpu/data/chemical_tables.npz`` at import
time instead of carrying a 1.1k-line literal module.

Run once (requires /root/reference mounted):
    python scripts/extract_chemical_tables.py
"""
from __future__ import annotations

import importlib.util
import json
import pathlib
import sys

import numpy as np

REF = "/root/reference/framedipt/protein/residue_constants.py"
OUT_DIR = pathlib.Path(__file__).resolve().parent.parent / "framedipt_tpu" / "data"


def load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_residue_constants", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    rc = load_reference_module()
    arrays = {
        # Ideal rigid-group geometry (ref: residue_constants.py:974-980).
        "restype_rigid_group_default_frame": np.asarray(
            rc.restype_rigid_group_default_frame, np.float64
        ),
        "restype_atom14_rigid_group_positions": np.asarray(
            rc.restype_atom14_rigid_group_positions, np.float64
        ),
        "restype_atom37_rigid_group_positions": np.asarray(
            rc.restype_atom37_rigid_group_positions, np.float64
        ),
        "restype_atom14_to_rigid_group": np.asarray(
            rc.restype_atom14_to_rigid_group, np.int32
        ),
        "restype_atom37_to_rigid_group": np.asarray(
            rc.restype_atom37_to_rigid_group, np.int32
        ),
        "restype_atom14_mask": np.asarray(rc.restype_atom14_mask, np.float32),
        "restype_atom37_mask": np.asarray(rc.restype_atom37_mask, np.float32),
        # Torsion-angle metadata used by atom37_to_torsion_angles.
        "chi_angles_mask": np.asarray(rc.chi_angles_mask, np.float32),
        "chi_pi_periodic": np.asarray(rc.chi_pi_periodic, np.float32),
    }

    # Derive atom14 <-> atom37 per-restype index maps (the reference derives
    # these on the fly in openfold/data/data_transforms.py:make_atom14_masks).
    atom_order = {name: i for i, name in enumerate(rc.atom_types)}
    n_restype = 21  # 20 + UNK
    a14_to_a37 = np.zeros((n_restype, 14), np.int32)
    a37_to_a14 = np.zeros((n_restype, 37), np.int32)
    a14_mask = np.zeros((n_restype, 14), np.float32)
    a37_mask = np.zeros((n_restype, 37), np.float32)
    for i, r1 in enumerate(rc.restypes):
        names14 = rc.restype_name_to_atom14_names[rc.restype_1to3[r1]]
        for j, name in enumerate(names14):
            if not name:
                continue
            a14_to_a37[i, j] = atom_order[name]
            a14_mask[i, j] = 1.0
        name_to_14 = {n: j for j, n in enumerate(names14) if n}
        for k, name in enumerate(rc.atom_types):
            if name in name_to_14:
                a37_to_a14[i, k] = name_to_14[name]
                a37_mask[i, k] = 1.0
    arrays["restype_atom14_to_atom37"] = a14_to_a37
    arrays["restype_atom37_to_atom14"] = a37_to_a14
    arrays["restype_atom14_exists"] = a14_mask
    arrays["restype_atom37_exists"] = a37_mask
    names = {
        "restypes": list(rc.restypes),  # 20 one-letter codes
        "restypes_with_x": list(rc.restypes_with_x),
        "restype_1to3": dict(rc.restype_1to3),
        "restype_3to1": dict(rc.restype_3to1),
        "atom_types": list(rc.atom_types),  # 37 atom names
        "restype_name_to_atom14_names": {
            k: list(v) for k, v in rc.restype_name_to_atom14_names.items()
        },
        "chi_angles_atoms": {k: [list(a) for a in v] for k, v in rc.chi_angles_atoms.items()},
        "ca_ca": rc.ca_ca,
        "between_res_bond_length_c_n": list(rc.between_res_bond_length_c_n),
        "between_res_bond_length_stddev_c_n": list(
            rc.between_res_bond_length_stddev_c_n
        ),
        "between_res_cos_angles_c_n_ca": list(rc.between_res_cos_angles_c_n_ca),
        "between_res_cos_angles_ca_c_n": list(rc.between_res_cos_angles_ca_c_n),
        # Van der Waals radii for clash/SASA computations.
        "van_der_waals_radius": dict(rc.van_der_waals_radius),
        "unk_restype_index": rc.unk_restype_index,
    }
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT_DIR / "chemical_tables.npz", **arrays)
    (OUT_DIR / "chemical_names.json").write_text(json.dumps(names, indent=1))
    print(f"wrote {OUT_DIR}/chemical_tables.npz with {len(arrays)} arrays")
    print(f"wrote {OUT_DIR}/chemical_names.json with {len(names)} entries")


if __name__ == "__main__":
    main()

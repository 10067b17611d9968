"""Ports of the reference's unit tests (SURVEY.md §4):
- chain naming (tests/unit/test_data_utils.py:13)
- create_redacted_regions scenarios (:56)
- get_diffused_region_per_chain 5 scenarios (test_experiment_utils.py:38)
- dihedral golden values (test_evaluation_utils.py:44)
"""
import numpy as np
import pytest

from framedipt_tpu.data import features as feature_lib
from framedipt_tpu.data.protein import int_to_chain_id
from framedipt_tpu.eval.metrics import dihedral
from framedipt_tpu.experiments.utils import get_diffused_region_per_chain


@pytest.mark.parametrize(
    ("index", "expected"),
    [(0, "A"), (25, "Z"), (26 + 1, "AB"), (26 * 26, "ZA"), (26 * 27, "AAA")],
)
def test_chain_naming(index, expected):
    assert int_to_chain_id(index) == expected


class _FixedRng:
    """Deterministic stand-in for numpy Generator.integers: returns the
    scripted (length, start) pairs per chain."""

    def __init__(self, values):
        self.values = list(values)

    def integers(self, *args, **kwargs):
        return self.values.pop(0)


@pytest.mark.parametrize(
    ("chain_idx", "length", "start_idx", "expected_mask"),
    [
        (
            np.array([0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 2, 2, 2, 2]),
            3,
            1,
            np.array([0, 1, 1, 1, 0, 0, 0, 1, 1, 1, 0, 0, 1, 1, 1]),
        ),
        (
            np.array([0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1]),
            2,
            0,
            np.array([1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 0]),
        ),
        (
            np.array([0, 0, 0, 0, 0, 0]),
            4,
            1,
            np.array([0, 1, 1, 1, 1, 0]),
        ),
    ],
)
def test_create_redacted_regions(chain_idx, length, start_idx, expected_mask):
    n_chains = len(np.unique(chain_idx))
    rng = _FixedRng([length, start_idx] * n_chains)
    mask = feature_lib.create_redacted_regions(
        chain_idx=chain_idx,
        res_mask=np.ones_like(chain_idx),
        rng=rng,
        redact_min_len=2,
        redact_max_len=5,
    )
    np.testing.assert_array_equal(mask, expected_mask)


@pytest.mark.parametrize(
    ("diffused_mask", "chain_index", "expected"),
    [
        (np.array([0, 1, 1, 0]), np.array([2, 2, 2, 2]), ([0], [1], [2])),
        (
            np.array([0, 0, 0, 0, 1, 1, 1]),
            np.array([0, 0, 0, 0, 2, 2, 2]),
            ([1], [0], [2]),
        ),
        (
            np.array([0, 0, 1, 1, 1, 1, 1, 1, 1, 0]),
            np.array([0, 0, 0, 0, 1, 1, 1, 2, 2, 2]),
            ([0, 1, 2], [2, 0, 0], [3, 2, 1]),
        ),
        (
            np.array([0, 0, 1, 1, 1, 0, 1, 1, 1, 1, 0]),
            np.array([0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2]),
            ([0, 1, 1, 2], [2, 0, 2, 0], [3, 0, 3, 1]),
        ),
        (
            np.array([0, 1, 0, 1, 0, 0, 0, 1, 1, 0, 0, 0, 1, 1, 0, 1, 1]),
            np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 3, 3, 3, 3, 3]),
            ([0, 0, 1, 3, 3], [1, 3, 2, 0, 3], [1, 3, 3, 1, 4]),
        ),
    ],
)
def test_get_diffused_region_per_chain(diffused_mask, chain_index, expected):
    chains, starts, ends = get_diffused_region_per_chain(
        diffused_mask=diffused_mask, chain_index=chain_index
    )
    assert chains == expected[0]
    assert starts == expected[1]
    assert ends == expected[2]


# Golden values from the reference's dihedral test (public StackOverflow
# example coordinates).
@pytest.mark.parametrize(
    ("a", "b", "c", "d", "expected"),
    [
        (
            [24.969, 13.428, 30.692],
            [24.044, 12.661, 29.808],
            [22.785, 13.482, 29.543],
            [21.951, 13.670, 30.431],
            -71.21515,
        ),
        (
            [24.969, 13.428, 30.692],
            [24.044, 12.661, 29.808],
            [23.672, 11.328, 30.466],
            [22.881, 10.326, 29.620],
            -171.94319,
        ),
        (
            [24.044, 12.661, 29.808],
            [23.672, 11.328, 30.466],
            [22.881, 10.326, 29.620],
            [23.691, 9.935, 28.389],
            60.82226,
        ),
        (
            [24.044, 12.661, 29.808],
            [23.672, 11.328, 30.466],
            [22.881, 10.326, 29.620],
            [22.557, 9.096, 30.459],
            -177.63641,
        ),
    ],
)
def test_dihedrals_golden(a, b, c, d, expected):
    angle = dihedral(
        np.asarray(a), np.asarray(b), np.asarray(c), np.asarray(d)
    )
    assert abs(np.rad2deg(angle) - expected) < 1e-4

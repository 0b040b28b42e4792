import numpy as np
import pytest

from tpusolve.mesh import (
    row_decomposition, owner_of, local_range, compute_3d_process_distribution)


def test_even_decomposition():
    off = row_decomposition(100, 4)
    assert off.tolist() == [0, 25, 50, 75, 100]


def test_remainder_spread_to_first_ranks():
    # reference rule: HypreSystem.cpp:529-535
    off = row_decomposition(10, 4)
    counts = np.diff(off).tolist()
    assert counts == [3, 3, 2, 2]
    assert off[-1] == 10


def test_single_part():
    off = row_decomposition(7, 1)
    assert off.tolist() == [0, 7]


def test_more_parts_than_rows():
    off = row_decomposition(3, 5)
    assert np.diff(off).tolist() == [1, 1, 1, 0, 0]


def test_owner_of():
    off = row_decomposition(10, 4)  # [0,3,6,8,10]
    owners = owner_of(np.arange(10), off)
    assert owners.tolist() == [0, 0, 0, 1, 1, 1, 2, 2, 3, 3]


def test_local_range():
    off = row_decomposition(10, 4)
    assert local_range(off, 0) == (0, 2)
    assert local_range(off, 3) == (8, 9)


@pytest.mark.parametrize("n,expected_prod", [(1, 1), (8, 8), (12, 12),
                                             (17, 17), (64, 64), (1000, 1000)])
def test_3d_process_distribution(n, expected_prod):
    px, py, pz = compute_3d_process_distribution(n)
    assert px * py * pz == expected_prod
    assert px >= py >= pz >= 1


def test_3d_distribution_near_cubic():
    assert compute_3d_process_distribution(8) == (2, 2, 2)
    assert compute_3d_process_distribution(64) == (4, 4, 4)

"""Tests for mdhelper_tpu.algorithm.utility (parity:
/root/reference/tests/test_algorithm_utility.py)."""

import numpy as np
import pytest

from mdhelper_tpu.algorithm import utility

rng = np.random.default_rng(42)


def test_func_closest_factors():
    # Cube root of a perfect cube.
    assert np.array_equal(
        utility.get_closest_factors(1000, 3), 10 * np.ones(3, dtype=int)
    )
    # Three closest factors in ascending order.
    assert utility.get_closest_factors(35904, 3).tolist() == [32, 33, 34]
    # Four closest factors in descending order.
    assert utility.get_closest_factors(73440, 4, reverse=True).tolist() == [
        18, 17, 16, 15,
    ]
    # Products must always equal the input.
    for value in (360, 99, 17, 100000):
        for n in (2, 3, 4):
            assert utility.get_closest_factors(value, n).prod() == value


def test_func_replicate():
    dims = rng.integers(1, 5, size=3)
    n_cells = rng.integers(2, 10, size=3)
    pos = utility.replicate(dims, np.array(((0, 0, 0), dims // 2)), n_cells)
    assert pos.shape[0] == 2 * n_cells.prod()
    # Third point is atom 0 of the x-shifted replica.
    assert np.allclose(pos[2], (dims[0], 0, 0))


def test_func_rebin():
    arr = np.arange(50)
    ref = np.arange(2, 52, 5)
    assert np.allclose(utility.rebin(arr), ref)
    assert np.allclose(
        utility.rebin(np.tile(arr[None, :], (5, 1))),
        np.tile(ref[None, :], (5, 1)),
    )
    with pytest.raises(ValueError):
        utility.rebin(np.empty((17,)))


def test_func_find_connected_nodes():
    graph = {0: [1], 1: [0, 2], 2: [1], 3: [4], 4: [3], 5: []}
    components = utility.find_connected_nodes(graph)
    assert sorted(sorted(c) for c in components) == [[0, 1, 2], [3, 4], [5]]


def test_func_dfs_deep_chain_no_overflow():
    # A 100k-atom linear chain must not hit the recursion limit.
    n = 100_000
    graph = {i: [] for i in range(n)}
    for i in range(n - 1):
        graph[i].append(i + 1)
        graph[i + 1].append(i)
    components = utility.find_connected_nodes(graph)
    assert len(components) == 1
    assert len(components[0]) == n

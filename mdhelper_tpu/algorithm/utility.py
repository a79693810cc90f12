"""
Utility algorithms
==================

Logical and mathematical helpers used across MDHelper-TPU (reference:
``/root/reference/src/mdhelper/algorithm/utility.py``).  These are
host-side setup utilities (factorization, replication, graph search),
not device hot loops, so they are implemented with NumPy/sympy.
"""

from typing import Any

import numpy as np
import sympy

__all__ = [
    "get_closest_factors",
    "replicate",
    "rebin",
    "depth_first_search",
    "find_connected_nodes",
]


def get_closest_factors(
    value: int, n_factors: int, reverse: bool = False
) -> np.ndarray:
    r"""Decompose :math:`N` into its :math:`n` closest integer factors.

    Parity: ``algorithm/utility.py:15-72`` in the reference.  The greedy
    fill walks the prime factorization of `value` from the largest prime
    down, packing primes into the current slot while the running product
    stays at or below :math:`\lceil N^{1/n}\rfloor` (a slot always
    accepts its first prime while slots remain), and spilling any
    leftover primes onto the currently smallest slot.

    Parameters
    ----------
    value : `int`
        Number :math:`N` to factorize.
    n_factors : `int`
        Number of factors :math:`n` to return.
    reverse : `bool`, optional
        Sort the factors in descending instead of ascending order.

    Returns
    -------
    factors : `numpy.ndarray`
        The :math:`n` closest factors of :math:`N`. Shape: :math:`(n,)`.
    """

    root = value ** (1 / n_factors)
    root_int = int(np.round(root))
    if np.isclose(root, root_int):
        return np.full(n_factors, root_int, dtype=int)

    primes_desc = [
        p
        for p, mult in sorted(sympy.factorint(value).items(), reverse=True)
        for _ in range(mult)
    ]

    factors = np.ones(n_factors, dtype=int)
    slot = 0
    for rank, prime in enumerate(primes_desc):
        placed = False
        while not placed:
            if slot >= n_factors:
                # All slots are occupied: spill onto the smallest one.
                factors[np.argmin(factors)] *= prime
                placed = True
            else:
                trial = factors[slot] * prime
                first_fill = factors[slot] == 1 and rank < n_factors
                if trial <= root_int or first_fill:
                    factors[slot] = trial
                    placed = True
                else:
                    slot += 1

    factors = np.sort(factors)
    return factors[::-1] if reverse else factors


def replicate(
    cell_dims: np.ndarray,
    cell_pos: np.ndarray,
    n_cells: np.ndarray,
) -> np.ndarray:
    r"""Replicate unit-cell points along the x-, y- and z-directions.

    Parity: ``algorithm/utility.py:74-126``.  Output ordering is
    cell-major with the x-replica index varying fastest, then y, then z,
    and the atoms within a cell contiguous — identical to the reference.

    Parameters
    ----------
    cell_dims : `numpy.ndarray`
        Unit-cell dimensions. Shape: :math:`(3,)`.
    cell_pos : `numpy.ndarray`
        Positions of the :math:`N` points inside the unit cell.
        Shape: :math:`(N,\,3)`.
    n_cells : `numpy.ndarray`
        Number of replicas in each direction. Shape: :math:`(3,)`.

    Returns
    -------
    pos : `numpy.ndarray`
        Original and replicated points.
        Shape: :math:`(N\,n_x\,n_y\,n_z,\,3)`.
    """

    cell_dims = np.asarray(cell_dims, dtype=float)
    cell_pos = np.atleast_2d(np.asarray(cell_pos, dtype=float))
    nx, ny, nz = (int(n) for n in n_cells)

    shifts = np.stack(
        (
            np.tile(np.arange(nx), ny * nz),
            np.tile(np.repeat(np.arange(ny), nx), nz),
            np.repeat(np.arange(nz), nx * ny),
        ),
        axis=1,
    ) * cell_dims
    return (shifts[:, None, :] + cell_pos[None, :, :]).reshape(-1, 3)


def rebin(x: np.ndarray, factor: int = None) -> np.ndarray:
    r"""Rebin discrete data along the last axis by averaging.

    Parity: ``algorithm/utility.py:128-156``.  If `factor` is omitted,
    the largest single-digit divisor (>1) of the final axis length is
    used.

    Parameters
    ----------
    x : `numpy.ndarray`
        Data to rebin in the last dimension.
    factor : `int`, optional
        Size-reduction factor.

    Returns
    -------
    xr : `numpy.ndarray`
        Rebinned data.
    """

    x = np.asarray(x)
    if factor is None:
        divisors = [d for d in sympy.divisors(x.shape[-1])[1:] if d < 10]
        if not divisors:
            raise ValueError("No factor provided for rebinning.")
        factor = divisors[-1]
    return x.reshape(*x.shape[:-1], -1, factor).mean(axis=-1)


def depth_first_search(
    graph: dict[Any, list[Any]],
    start: Any,
    visited: dict[Any, bool],
    group: list[Any],
) -> None:
    """Iterative depth-first search collecting one connected component.

    Parity: ``algorithm/utility.py:158-185`` (the reference recurses;
    this version uses an explicit stack so deep chain molecules cannot
    overflow Python's recursion limit).  `visited` and `group` are
    updated in place.
    """

    stack = [start]
    visited[start] = True
    while stack:
        node = stack.pop()
        group.append(node)
        for neighbor in reversed(graph[node]):
            if not visited[neighbor]:
                visited[neighbor] = True
                stack.append(neighbor)


def find_connected_nodes(graph: dict[Any, list[Any]]) -> list[list[Any]]:
    """Find the connected components of a graph.

    Parity: ``algorithm/utility.py:187-210``.

    Parameters
    ----------
    graph : `dict`
        Adjacency mapping (node -> list of neighbors).

    Returns
    -------
    results : `list`
        Connected components, each a list of nodes in DFS order.
    """

    visited = dict.fromkeys(graph, False)
    results = []
    for start in graph:
        if not visited[start]:
            group: list[Any] = []
            depth_first_search(graph, start, visited, group)
            results.append(group)
    return results

"""
Molecular structure
===================

Center-of-mass and radius-of-gyration algorithms (reference:
``/root/reference/src/mdhelper/algorithm/molecule.py``).  The array
math runs through :mod:`jax.numpy` when given JAX arrays (so it can be
traced inside jitted analysis steps) and :mod:`numpy` otherwise; ragged
(per-residue lists with unequal sizes) inputs fall back to host loops
exactly like the reference.

Groups are duck-typed: any object with ``positions``, ``masses``,
``ix``, ``dimensions``, ``residues``/``segments`` and
``center_of_mass()`` works — in particular
:class:`mdhelper_tpu.core.universe.AtomGroup`.
"""

from typing import Any, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["center_of_mass", "radius_of_gyration"]


def _xp(*arrays):
    """Pick jnp when any input is a JAX array, else NumPy."""

    return jnp if any(isinstance(a, jax.Array) for a in arrays) else np


def _validate_grouping(grouping: str) -> None:
    if grouping not in {None, "residues", "segments"}:
        emsg = (f"Invalid grouping: '{grouping}'. Valid options are "
                "None, 'residues', and 'segments'.")
        raise ValueError(emsg)


def _relative_indices(group, subgroup) -> np.ndarray:
    """Positions of `subgroup`'s atoms inside `group`'s position array."""

    order = np.argsort(group.ix)
    return order[np.searchsorted(group.ix, subgroup.ix, sorter=order)]


def center_of_mass(
    group=None,
    grouping: str = None,
    *,
    masses: Union[list, np.ndarray] = None,
    positions: Union[list, np.ndarray] = None,
    images: np.ndarray = None,
    dimensions: np.ndarray = None,
    n_groups: int = None,
    raw: bool = False,
) -> Any:
    r"""Compute center(s) of mass for a collection of particles.

    .. math::

       \mathbf{R}_\mathrm{com}
       = \frac{\sum_i m_i \mathbf{r}_i}{\sum_i m_i}

    Parity: ``algorithm/molecule.py:15-310``.  Accepts either an atom
    group (with optional ``grouping`` of ``"residues"``/``"segments"``)
    or raw mass/position arrays; equisized groups reshape to
    ``(n_groups, -1, 3)`` while ragged groups are handled as lists.
    If positions are wrapped, pass `images` (boundary-crossing counts)
    and `dimensions` to unwrap on the fly.

    Returns ``com`` — or ``(com, masses, positions)`` when
    ``raw=True`` and data was pulled from `group`.
    """

    _validate_grouping(grouping)

    missing = (masses is None, positions is None)
    if any(missing):
        if group is None:
            emsg = ("Either a group of atoms or atom positions and "
                    "masses must be provided.")
            raise ValueError(emsg)

        if grouping:
            groups = list(getattr(group, grouping))
            same = all(
                g.atoms.n_atoms == groups[0].atoms.n_atoms for g in groups
            )
        else:
            groups = None
            same = True

        # Fast exit: ragged groups, no unwrapping, raw data not needed.
        if not same and images is None and not raw:
            return np.array([g.atoms.center_of_mass() for g in groups])

        if missing[1]:
            positions = np.array(group.positions)
            if images is not None:
                if dimensions is None:
                    dims = getattr(group, "dimensions", None)
                    if dims is None:
                        emsg = ("The number of periodic boundary "
                                "crossings was provided, but no system "
                                "dimensions were provided or found in "
                                "the trajectory.")
                        raise ValueError(emsg)
                    dimensions = np.asarray(dims)[:3]
                positions = positions + images * np.asarray(dimensions)[:3]

        if same:
            if missing[0]:
                masses = np.asarray(group.masses)
            if grouping or n_groups:
                n = n_groups if n_groups else getattr(group, f"n_{grouping}")
                masses = np.reshape(masses, (n, -1))
                positions = np.reshape(positions, (n, -1, 3))
        else:
            if missing[0]:
                masses = [np.asarray(g.atoms.masses) for g in groups]
            if missing[1]:
                positions = [positions[_relative_indices(group, g.atoms)]
                             for g in groups]
    else:
        # Raw arrays provided directly; try to vectorize.
        if not isinstance(positions, (np.ndarray, jax.Array)):
            try:
                positions = np.asarray(positions, dtype=float)
                masses = np.asarray(masses, dtype=float)
            except ValueError:
                pass
            if isinstance(positions, np.ndarray) != isinstance(
                masses, np.ndarray
            ):
                emsg = ("The shapes of the arrays containing the "
                        "particle masses and positions are incompatible.")
                raise ValueError(emsg)
        if n_groups and isinstance(positions, (np.ndarray, jax.Array)):
            masses = np.reshape(masses, (n_groups, -1))
            positions = positions.reshape((n_groups, -1, 3))

    if isinstance(positions, (np.ndarray, jax.Array)):
        xp = _xp(positions)
        masses = xp.asarray(masses)
        com = (
            xp.einsum("...a,...ad->...d", masses, xp.asarray(positions))
            / masses.sum(axis=-1, keepdims=True)
        )
    else:
        com = np.array(
            [np.dot(m, p) / np.sum(m) for m, p in zip(masses, positions)]
        )

    if raw and any(missing):
        return com, masses, positions
    return com


def radius_of_gyration(
    group=None,
    grouping: str = None,
    *,
    positions: Union[list, np.ndarray] = None,
    masses: Union[list, np.ndarray] = None,
    com: np.ndarray = None,
    images: np.ndarray = None,
    dimensions: np.ndarray = None,
    n_groups: int = None,
    components: bool = False,
) -> Union[float, np.ndarray]:
    r"""Compute radii of gyration for a collection of particles.

    .. math::

       R_\mathrm{g} = \sqrt{\frac{\sum_i m_i
       \|\mathbf{r}_i - \mathbf{R}_\mathrm{com}\|^2}{\sum_i m_i}}

    With ``components=True`` the gyration radii *around* each axis are
    returned (summing only the orthogonal coordinate deviations).

    Parity: ``algorithm/molecule.py:312-587``.
    """

    _validate_grouping(grouping)

    missing = (masses is None, positions is None, com is None)
    if any(missing[:2]):
        com, masses, positions = center_of_mass(
            group,
            grouping,
            masses=masses,
            positions=positions,
            raw=True,
            images=images,
            dimensions=dimensions,
        )
    elif missing[2]:
        com = center_of_mass(
            masses=masses, positions=positions, n_groups=n_groups
        )

    if isinstance(positions, (np.ndarray, jax.Array)):
        xp = _xp(positions)
        positions = xp.asarray(positions)
        masses = xp.asarray(masses)
        grouped = bool(grouping) or bool(n_groups) or positions.ndim == 3
        if components:
            cpos = (
                positions - xp.expand_dims(com, axis=positions.ndim - 2)
            ) ** 2
            # Sum of squared deviations orthogonal to each axis.
            total = cpos.sum(axis=-1, keepdims=True)
            ortho = total - cpos
            if grouped:
                return xp.sqrt(
                    xp.einsum("ga,gad->gd", masses, ortho)
                    / masses.sum(axis=1, keepdims=True)
                )
            return xp.sqrt(
                xp.einsum("a,ad->d", masses, ortho) / masses.sum()
            )
        if grouped:
            return xp.sqrt(
                xp.einsum(
                    "ga,gad->gd", masses, (positions - com[:, None]) ** 2
                ).sum(axis=1)
                / masses.sum(axis=1)
            )
        return xp.sqrt(
            xp.einsum("a,ad->d", masses, (positions - com) ** 2).sum()
            / masses.sum()
        )

    # Ragged groups: host loop.
    if components:
        gyradii = np.empty(np.shape(com))
        for i, (m, p, c) in enumerate(zip(masses, positions, com)):
            cpos = (np.asarray(p) - c) ** 2
            total = cpos.sum(axis=-1, keepdims=True)
            ortho = total - cpos
            gyradii[i] = np.dot(np.asarray(m), ortho) / np.sum(m)
        return np.sqrt(gyradii)
    return np.sqrt(
        [
            np.einsum("a,ad->d", np.asarray(m),
                      (np.asarray(p) - c) ** 2).sum() / np.sum(m)
            for m, p, c in zip(masses, positions, com)
        ]
    )

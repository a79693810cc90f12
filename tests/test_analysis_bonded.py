"""Bonded-structure distributions (bond lengths / angles) vs NumPy
oracles — beyond-reference capability built on the topology's bond
connectivity."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.bonded import (
    BondAngleDistribution,
    BondLengthDistribution,
    derive_angles,
)
from mdhelper_tpu.core.universe import Universe

rng = np.random.default_rng(31)


def _water_universe(n_mol=8, n_frames=5, box=10.0):
    """Rigid-ish 3-site molecules: O-H1, O-H2 bonds per molecule."""

    n = 3 * n_mol
    pos = np.empty((n_frames, n, 3))
    bonds = []
    for m in range(n_mol):
        o = 3 * m
        bonds += [(o, o + 1), (o, o + 2)]
    for f in range(n_frames):
        centers = rng.random((n_mol, 3)) * box
        for m in range(n_mol):
            o = 3 * m
            pos[f, o] = centers[m]
            for h, angle0 in ((o + 1, 0.0), (o + 2, 104.5)):
                direction = rng.standard_normal(3)
                direction /= np.linalg.norm(direction)
                pos[f, h] = (
                    centers[m]
                    + direction * (0.96 + 0.02 * rng.standard_normal())
                )
    pos %= box
    u = Universe.from_arrays(
        pos,
        np.array([box] * 3),
        types=np.array(["O", "H", "H"] * n_mol, dtype=object),
        resindices=np.repeat(np.arange(n_mol), 3),
        bonds=np.asarray(bonds),
    )
    return u, pos, np.asarray(bonds), np.array([box] * 3)


def test_derive_angles():
    bonds = np.array([(0, 1), (0, 2), (3, 0)])
    np.testing.assert_array_equal(
        derive_angles(bonds),
        [[1, 0, 2], [1, 0, 3], [2, 0, 3]],
    )
    assert derive_angles(np.array([(5, 6)])).shape == (0, 3)


def test_bond_length_distribution_oracle():
    u, pos, bonds, box = _water_universe()
    dist = BondLengthDistribution(
        u.atoms, n_bins=30, range=(0.5, 1.5), verbose=False
    ).run()

    d = pos[:, bonds[:, 0]] - pos[:, bonds[:, 1]]
    d -= box * np.round(d / box)
    lengths = np.linalg.norm(d, axis=-1)
    counts = np.histogram(
        lengths, bins=dist.results.edges
    )[0]
    np.testing.assert_array_equal(dist.results.counts, counts)
    np.testing.assert_allclose(
        dist.results.mean, lengths.mean(), rtol=1e-9
    )
    np.testing.assert_allclose(
        dist.results.std, lengths.std(), rtol=1e-7
    )
    widths = np.diff(dist.results.edges)
    np.testing.assert_allclose(
        (dist.results.probability * widths).sum(), 1.0, rtol=1e-12
    )

    # parallel=True: bit-equal counts
    par = BondLengthDistribution(
        u.atoms, n_bins=30, range=(0.5, 1.5), parallel=True,
        verbose=False,
    ).run()
    np.testing.assert_array_equal(
        par.results.counts, dist.results.counts
    )


def test_bond_angle_distribution_oracle():
    u, pos, bonds, box = _water_universe()
    dist = BondAngleDistribution(
        u.atoms, n_bins=36, range=(0.0, 180.0), verbose=False
    ).run()
    triples = derive_angles(bonds)

    v1 = pos[:, triples[:, 0]] - pos[:, triples[:, 1]]
    v2 = pos[:, triples[:, 2]] - pos[:, triples[:, 1]]
    v1 -= box * np.round(v1 / box)
    v2 -= box * np.round(v2 / box)
    cos = (v1 * v2).sum(-1) / (
        np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1)
    )
    theta = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    counts = np.histogram(theta, bins=dist.results.edges)[0]
    np.testing.assert_array_equal(dist.results.counts, counts)
    np.testing.assert_allclose(
        dist.results.mean, theta.mean(), rtol=1e-9
    )
    assert dist.results.units["results.bins"] is not None


def test_bonded_validation_and_explicit_terms():
    u, pos, bonds, box = _water_universe()
    no_bonds = Universe.from_arrays(
        pos, box, types=np.array(["A"] * pos.shape[1], dtype=object)
    )
    with pytest.raises(ValueError):
        BondLengthDistribution(no_bonds.atoms, verbose=False)
    # Explicit bond list on a bond-less topology works.
    dist = BondLengthDistribution(
        no_bonds.atoms, n_bins=30, range=(0.5, 1.5),
        bonds=bonds, verbose=False,
    ).run()
    assert dist.results.counts.sum() > 0


TRICLINIC_DIMS = np.array([9.0, 10.0, 11.0, 75.0, 85.0, 100.0])


def _box_matrix(dims):
    a, b, c = dims[:3]
    al, be, ga = np.deg2rad(dims[3:6])
    bx, by = b * np.cos(ga), b * np.sin(ga)
    cx = c * np.cos(be)
    cy = c * (np.cos(al) - np.cos(be) * np.cos(ga)) / np.sin(ga)
    cz = np.sqrt(c**2 - cx**2 - cy**2)
    return np.array([[a, 0, 0], [bx, by, 0], [cx, cy, cz]])


def _min_image_oracle(v, h):
    """Brute-force 27-image minimum-image vectors (float64)."""

    frac = v @ np.linalg.inv(h)
    frac -= np.round(frac)
    base = frac @ h
    best = base.copy()
    best_d2 = (base**2).sum(-1)
    for sx in (-1, 0, 1):
        for sy in (-1, 0, 1):
            for sz in (-1, 0, 1):
                if sx == sy == sz == 0:
                    continue
                cand = base + np.array([sx, sy, sz], float) @ h
                d2 = (cand**2).sum(-1)
                take = d2 < best_d2
                best[take] = cand[take]
                best_d2 = np.minimum(best_d2, d2)
    return best


def test_bonded_triclinic_oracle():
    """Bond lengths, angles, and dihedrals on a triclinic cell fold
    vectors through the box-matrix 27-image search; counts match a
    float64 brute-force oracle."""

    from mdhelper_tpu.analysis.bonded import (
        DihedralDistribution,
        derive_dihedrals,
    )

    r = np.random.default_rng(11)
    h = _box_matrix(TRICLINIC_DIMS)
    n_mol, F = 6, 4
    n = 4 * n_mol
    pos = np.empty((F, n, 3))
    bonds = []
    for m in range(n_mol):
        a = 4 * m
        bonds += [(a, a + 1), (a + 1, a + 2), (a + 2, a + 3)]
    for f in range(F):
        centers = r.random((n_mol, 3)) @ h
        for m in range(n_mol):
            pos[f, 4 * m:4 * m + 4] = (
                centers[m] + r.standard_normal((4, 3)) * 0.7
            )
    # wrap into the triclinic cell so min-image folding is exercised
    frac = pos.reshape(-1, 3) @ np.linalg.inv(h)
    pos = ((frac % 1.0) @ h).reshape(F, n, 3)
    bonds = np.asarray(bonds)
    u = Universe.from_arrays(
        pos, TRICLINIC_DIMS,
        types=np.array(["C"] * n, dtype=object),
        bonds=bonds,
    )

    # lengths
    dist = BondLengthDistribution(
        u.atoms, n_bins=40, range=(0.0, 4.0), verbose=False
    ).run()
    d = _min_image_oracle(
        (pos[:, bonds[:, 0]] - pos[:, bonds[:, 1]]).reshape(-1, 3), h
    )
    lengths = np.linalg.norm(d, axis=-1)
    np.testing.assert_array_equal(
        dist.results.counts,
        np.histogram(lengths, bins=dist.results.edges)[0],
    )
    np.testing.assert_allclose(dist.results.mean, lengths.mean(),
                               rtol=1e-9)

    # angles
    triples = derive_angles(bonds)
    ang = BondAngleDistribution(
        u.atoms, n_bins=36, verbose=False
    ).run()
    v1 = _min_image_oracle(
        (pos[:, triples[:, 0]] - pos[:, triples[:, 1]]).reshape(-1, 3), h
    )
    v2 = _min_image_oracle(
        (pos[:, triples[:, 2]] - pos[:, triples[:, 1]]).reshape(-1, 3), h
    )
    cos = (v1 * v2).sum(-1) / (
        np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1)
    )
    theta = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    np.testing.assert_array_equal(
        ang.results.counts,
        np.histogram(theta, bins=ang.results.edges)[0],
    )

    # dihedrals
    quads = derive_dihedrals(bonds)
    dih = DihedralDistribution(u.atoms, n_bins=72, verbose=False).run()
    b1 = _min_image_oracle(
        (pos[:, quads[:, 1]] - pos[:, quads[:, 0]]).reshape(-1, 3), h
    )
    b2 = _min_image_oracle(
        (pos[:, quads[:, 2]] - pos[:, quads[:, 1]]).reshape(-1, 3), h
    )
    b3 = _min_image_oracle(
        (pos[:, quads[:, 3]] - pos[:, quads[:, 2]]).reshape(-1, 3), h
    )
    n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
    m1 = np.cross(
        n1, b2 / np.linalg.norm(b2, axis=-1)[:, None]
    )
    phi = np.degrees(
        np.arctan2((m1 * n2).sum(-1), (n1 * n2).sum(-1))
    )
    np.testing.assert_array_equal(
        dih.results.counts,
        np.histogram(phi, bins=dih.results.edges)[0],
    )


def test_dihedral_distribution():
    from mdhelper_tpu.analysis.bonded import (
        DihedralDistribution,
        derive_dihedrals,
    )

    # derive_dihedrals on a butane-like chain 0-1-2-3 (+ branch 4 on 2)
    bonds = np.array([(0, 1), (1, 2), (2, 3), (2, 4)])
    np.testing.assert_array_equal(
        derive_dihedrals(bonds),
        [[0, 1, 2, 3], [0, 1, 2, 4]],
    )

    # Known geometry: set phi exactly by construction.
    def quad(phi_deg):
        phi = np.radians(phi_deg)
        return np.array(
            [
                [1.0, np.cos(phi), np.sin(phi)],  # i rotated about x
                [0.0, 1.0, 0.0],                  # j
                [0.0, 0.0, 0.0],                  # k (b2 along -y)
                [1.0, -1.0, 0.0],                 # l in the xz ref
            ]
        )

    box = np.array([50.0] * 3)
    for phi in (-120.0, -60.0, 0.0, 60.0, 179.0):
        pos = (quad(phi) + 10.0)[None]
        u = Universe.from_arrays(
            pos, box,
            types=np.array(["C"] * 4, dtype=object),
        )
        dist = DihedralDistribution(
            u.atoms, n_bins=360, range=(-180.0, 180.0),
            dihedrals=np.array([[0, 1, 2, 3]]), verbose=False,
        ).run()
        measured = dist.results.bins[np.argmax(dist.results.counts)]
        # oracle via the standard atan2 formula
        p = pos[0]
        b1, b2, b3 = p[1] - p[0], p[2] - p[1], p[3] - p[2]
        n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
        m1 = np.cross(n1, b2 / np.linalg.norm(b2))
        oracle = np.degrees(
            np.arctan2(np.dot(m1, n2), np.dot(n1, n2))
        )
        assert abs(measured - oracle) <= 0.5, (phi, measured, oracle)

    # Random geometry vs oracle counts (multi-frame, PBC wrap).
    r = np.random.default_rng(4)
    n_mol, F, L = 6, 3, 12.0
    pos = np.empty((F, 4 * n_mol, 3))
    quads = []
    bonds = []
    for m in range(n_mol):
        a = 4 * m
        quads.append((a, a + 1, a + 2, a + 3))
        bonds += [(a, a + 1), (a + 1, a + 2), (a + 2, a + 3)]
    for f in range(F):
        centers = r.random((n_mol, 3)) * L
        for m in range(n_mol):
            pos[f, 4 * m:4 * m + 4] = (
                centers[m] + r.standard_normal((4, 3)) * 0.8
            )
    pos %= L
    u = Universe.from_arrays(
        pos, np.array([L] * 3),
        types=np.array(["C"] * (4 * n_mol), dtype=object),
        bonds=np.asarray(bonds),
    )
    dist = DihedralDistribution(
        u.atoms, n_bins=72, verbose=False
    ).run()
    quads = np.asarray(quads)
    phis = []
    for f in range(F):
        p = pos[f]
        for i, j, k, l in quads:
            def mi(v):
                return v - L * np.round(v / L)
            b1, b2, b3 = mi(p[j] - p[i]), mi(p[k] - p[j]), mi(p[l] - p[k])
            n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
            m1 = np.cross(n1, b2 / np.linalg.norm(b2))
            phis.append(
                np.degrees(np.arctan2(np.dot(m1, n2), np.dot(n1, n2)))
            )
    counts = np.histogram(
        phis, bins=dist.results.edges
    )[0]
    np.testing.assert_array_equal(dist.results.counts, counts)

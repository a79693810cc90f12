"""Hydrogen-bond analysis vs a brute-force NumPy oracle —
beyond-reference capability (MDAnalysis HydrogenBondAnalysis
geometric criterion)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.hbonds import HydrogenBondAnalysis
from mdhelper_tpu.core.universe import Universe

rng = np.random.default_rng(19)


def _water_box(n_mol=24, n_frames=4, box=12.0):
    """Random rigid waters: O at center, two H at 0.96 A."""

    n = 3 * n_mol
    pos = np.empty((n_frames, n, 3))
    names, bonds = [], []
    for m in range(n_mol):
        o = 3 * m
        names += ["O", "H1", "H2"]
        bonds += [(o, o + 1), (o, o + 2)]
    for f in range(n_frames):
        centers = rng.random((n_mol, 3)) * box
        for m in range(n_mol):
            o = 3 * m
            pos[f, o] = centers[m]
            for h in (o + 1, o + 2):
                d = rng.standard_normal(3)
                d /= np.linalg.norm(d)
                pos[f, h] = centers[m] + 0.96 * d
    pos %= box
    u = Universe.from_arrays(
        pos,
        np.array([box] * 3),
        names=np.array(names, dtype=object),
        types=np.array(["O", "H", "H"] * n_mol, dtype=object),
        resindices=np.repeat(np.arange(n_mol), 3),
        bonds=np.asarray(bonds),
    )
    return u, pos, np.asarray(bonds), np.array([box] * 3)


def _mi(v, box):
    return v - box * np.round(v / box)


def _oracle(pos, pairs, acceptors, box, d_cut=3.0, a_cut=150.0):
    """Brute-force per-frame counts + per-pair bond matrix."""

    F = pos.shape[0]
    n, m = len(pairs), len(acceptors)
    hb = np.zeros((F, n, m), dtype=bool)
    for f in range(F):
        for i, (d, h) in enumerate(pairs):
            vhd = _mi(pos[f, d] - pos[f, h], box)
            for j, a in enumerate(acceptors):
                if a == d:
                    continue
                vda = _mi(pos[f, a] - pos[f, d], box)
                if (vda**2).sum() > d_cut**2:
                    continue
                vha = _mi(pos[f, a] - pos[f, h], box)
                den = np.linalg.norm(vhd) * np.linalg.norm(vha)
                if den == 0:
                    continue
                cos = np.dot(vhd, vha) / den
                angle = np.degrees(np.arccos(np.clip(cos, -1, 1)))
                if angle >= a_cut:
                    hb[f, i, j] = True
    return hb


def test_hbonds_water_oracle():
    u, pos, bonds, box = _water_box()
    hba = HydrogenBondAnalysis(
        u, hydrogens_sel="name H*", acceptors_sel="name O*",
        pair_counts=True, verbose=False,
    ).run()

    # bond-derived pairing: every bond is O-H so pairs = bonds
    np.testing.assert_array_equal(
        np.sort(hba.results.pairs, axis=0), np.sort(bonds, axis=0)
    )
    hb = _oracle(
        pos, hba.results.pairs, hba.results.acceptors, box
    )
    np.testing.assert_array_equal(
        hba.results.counts, hb.sum(axis=(1, 2))
    )
    np.testing.assert_allclose(
        hba.results.mean_count, hb.sum(axis=(1, 2)).mean()
    )
    np.testing.assert_allclose(
        hba.results.occupancies,
        hb.any(axis=2).mean(axis=0),
        rtol=1e-12,
    )
    np.testing.assert_array_equal(
        hba.results.pair_counts, hb.sum(axis=0)
    )

    # parallel=True bit-equality
    par = HydrogenBondAnalysis(
        u, hydrogens_sel="name H*", acceptors_sel="name O*",
        parallel=True, verbose=False,
    ).run()
    np.testing.assert_array_equal(
        par.results.counts, hba.results.counts
    )
    np.testing.assert_allclose(
        par.results.occupancies, hba.results.occupancies
    )


def test_hbonds_known_geometry():
    """A textbook linear O-H...O bond is found; bent/far ones are not."""

    box = np.array([30.0] * 3)
    # donor water at origin-ish, H pointing +x toward acceptor O
    def frame(acc_x, acc_y):
        return np.array(
            [
                [5.0, 5.0, 5.0],      # O donor
                [5.96, 5.0, 5.0],     # H along +x
                [4.7, 5.9, 5.0],      # other H
                [acc_x, acc_y, 5.0],  # acceptor O
            ]
        )

    # linear, d(O-O)=2.8 -> bonded
    pos = np.stack(
        [frame(7.8, 5.0), frame(7.8, 7.4), frame(9.5, 5.0)]
    )
    # frame 1: angle(D,H,A) ~ 100 deg -> rejected
    # frame 2: d(D,A)=4.5 > 3.0 -> rejected
    names = np.array(["O", "H1", "H2", "O"], dtype=object)
    u = Universe.from_arrays(
        pos, box, names=names,
        bonds=np.array([(0, 1), (0, 2)]),
    )
    hba = HydrogenBondAnalysis(
        u, hydrogens_sel="name H*", acceptors_sel="name O*",
        verbose=False,
    ).run()
    np.testing.assert_array_equal(hba.results.counts, [1, 0, 0])
    # the donating pair is (0, 1); occupancy 1/3 for it, 0 for others
    i = np.where(
        (hba.results.pairs == [0, 1]).all(axis=1)
    )[0][0]
    occ = np.zeros(len(hba.results.pairs))
    occ[i] = 1 / 3
    np.testing.assert_allclose(hba.results.occupancies, occ)


def test_hbonds_explicit_pairs_and_donor_filter():
    u, pos, bonds, box = _water_box(n_mol=6, n_frames=2)
    # explicit pairs equal the derived ones
    explicit = HydrogenBondAnalysis(
        u, donor_hydrogen_pairs=bonds, acceptors_sel="name O*",
        verbose=False,
    ).run()
    derived = HydrogenBondAnalysis(
        u, hydrogens_sel="name H*", acceptors_sel="name O*",
        verbose=False,
    ).run()
    np.testing.assert_array_equal(
        explicit.results.counts, derived.results.counts
    )
    # donors_sel restricting to nothing -> error
    with pytest.raises(ValueError):
        HydrogenBondAnalysis(
            u, hydrogens_sel="name H*", acceptors_sel="name O*",
            donors_sel="name XX*", verbose=False,
        )


def test_hbonds_triclinic():
    """Donor and acceptor straddling a tilted cell face bond through
    the minimum image."""

    dims = np.array([10.0, 10.0, 10.0, 80.0, 85.0, 95.0])
    from mdhelper_tpu.algorithm.topology import triclinic_vectors

    h = np.asarray(triclinic_vectors(dims))
    # donor near the origin face, acceptor just across it
    pos = np.array(
        [
            [
                [0.5, 2.0, 2.0],
                [0.5 - 0.96, 2.0, 2.0],  # H pointing -x (toward face)
                [1.2, 2.8, 2.0],
                # acceptor: one a-vector away minus 2.3 -> min-image
                # distance 2.8 along -x from the donor
                [0.5 - 2.8 + h[0, 0], 2.0, 2.0],
            ]
        ]
    )
    # wrap into the cell
    frac = pos.reshape(-1, 3) @ np.linalg.inv(h)
    pos = ((frac % 1.0) @ h).reshape(pos.shape)
    u = Universe.from_arrays(
        pos, dims,
        names=np.array(["O", "H1", "H2", "O"], dtype=object),
        bonds=np.array([(0, 1), (0, 2)]),
    )
    hba = HydrogenBondAnalysis(
        u, hydrogens_sel="name H*", acceptors_sel="name O*",
        verbose=False,
    ).run()
    np.testing.assert_array_equal(hba.results.counts, [1])


def test_hbonds_lifetime_intermittent():
    """c(t) for a deterministic on/off bond pattern matches the
    direct triangular-normalized autocorrelation."""

    pattern = np.array(
        [1, 1, 1, 0, 1, 0, 0, 1, 1, 0, 1, 1, 0, 0, 0, 1], dtype=bool
    )
    T = len(pattern)
    box = np.array([30.0] * 3)
    frames = []
    for on in pattern:
        acc_x = 7.8 if on else 20.0
        frames.append(
            np.array(
                [
                    [5.0, 5.0, 5.0],
                    [5.96, 5.0, 5.0],
                    [4.7, 5.9, 5.0],
                    [acc_x, 5.0, 5.0],
                ]
            )
        )
    u = Universe.from_arrays(
        np.stack(frames), box,
        names=np.array(["O", "H1", "H2", "O"], dtype=object),
        bonds=np.array([(0, 1), (0, 2)]),
        dt=2.0,
    )
    hba = HydrogenBondAnalysis(
        u, hydrogens_sel="name H*", acceptors_sel="name O*",
        lifetimes=True, verbose=False,
    ).run()
    np.testing.assert_array_equal(
        hba.results.counts, pattern.astype(int)
    )
    p = pattern.astype(float)
    acf = np.array(
        [
            (p[: T - t] * p[t:]).sum() / (T - t)
            for t in range(T)
        ]
    )
    np.testing.assert_allclose(
        hba.results.lifetime, acf / acf[0], rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        hba.results.lifetime_times, np.arange(T) * 2.0
    )
    assert hba.results.lifetime[0] == 1.0

    # continuous survival: brute-force H(t0, t0+t) oracle
    surv = np.empty(T)
    for t in range(T):
        H = np.array(
            [p[t0:t0 + t + 1].all() for t0 in range(T - t)]
        )
        surv[t] = H.mean()
    surv /= surv[0]
    np.testing.assert_allclose(
        hba.results.survival, surv, rtol=1e-12, atol=1e-15
    )
    # strict survival can never exceed the intermittent correlation
    assert (
        hba.results.survival
        <= hba.results.lifetime + 1e-12
    ).all()


def test_hbonds_validation():
    u, pos, bonds, box = _water_box(n_mol=2, n_frames=1)
    with pytest.raises(ValueError):
        HydrogenBondAnalysis(u, d_a_cutoff=-1.0, verbose=False)
    with pytest.raises(ValueError):
        HydrogenBondAnalysis(
            u, d_h_a_angle_cutoff=0.0, verbose=False
        )
    with pytest.raises(ValueError):
        HydrogenBondAnalysis(
            u, acceptors_sel="name ZZ*", verbose=False
        )
    no_bonds = Universe.from_arrays(
        pos, box,
        names=np.array(["O", "H1", "H2"] * 2, dtype=object),
    )
    with pytest.raises(ValueError):
        HydrogenBondAnalysis(no_bonds, verbose=False)


def test_hbonds_host_pipeline_equals_device(monkeypatch):
    """Host-pipeline H-bond detection (KD-tree candidates; the
    large-N path) matches the dense device sweep bit-for-bit —
    counts, occupancies, pair counts, lifetimes; orthorhombic and
    triclinic cells."""

    def run_both(u, **kwargs):
        out = []
        for knob in ("0", "1"):
            monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
            a = HydrogenBondAnalysis(
                u, hydrogens_sel="name H*", acceptors_sel="name O*",
                verbose=False, **kwargs,
            )
            a._chunk_bytes = 3 * u.atoms.n_atoms * 3 * 8
            out.append(a.run())
        monkeypatch.delenv("MDTPU_HOST_PIPELINE")
        device, host = out
        assert host._host_pipeline and not device._host_pipeline
        np.testing.assert_array_equal(
            host.results.counts, device.results.counts
        )
        np.testing.assert_allclose(
            host.results.occupancies, device.results.occupancies
        )
        if "pair_counts" in kwargs:
            np.testing.assert_array_equal(
                host.results.pair_counts, device.results.pair_counts
            )
        if "lifetimes" in kwargs:
            np.testing.assert_allclose(
                host.results.lifetime, device.results.lifetime,
                rtol=1e-12,
            )
            np.testing.assert_allclose(
                host.results.survival, device.results.survival,
                rtol=1e-12,
            )

    u, pos, bonds, box = _water_box(n_mol=16, n_frames=5)
    run_both(u)
    run_both(u, pair_counts=True, lifetimes=True)

    # triclinic
    dims = np.array([10.0, 11.0, 12.0, 75.0, 85.0, 100.0])
    from mdhelper_tpu.algorithm.topology import triclinic_vectors

    h = np.asarray(triclinic_vectors(dims))
    local = np.random.default_rng(77)
    n_mol = 10
    names, bonds2 = [], []
    posn = np.empty((3, 3 * n_mol, 3))
    for m in range(n_mol):
        o = 3 * m
        names += ["O", "H1", "H2"]
        bonds2 += [(o, o + 1), (o, o + 2)]
    for f in range(3):
        centers = local.random((n_mol, 3)) @ h
        for m in range(n_mol):
            o = 3 * m
            posn[f, o] = centers[m]
            for hh in (o + 1, o + 2):
                d = local.standard_normal(3)
                d /= np.linalg.norm(d)
                posn[f, hh] = centers[m] + 0.96 * d
    frac = posn.reshape(-1, 3) @ np.linalg.inv(h)
    posn = ((frac % 1.0) @ h).reshape(3, 3 * n_mol, 3)
    tric = Universe.from_arrays(
        posn, dims,
        names=np.array(names, dtype=object),
        bonds=np.asarray(bonds2),
    )
    run_both(tric)
    run_both(tric, lifetimes=True)


def test_hbonds_slab_box_host_equals_device(monkeypatch):
    """Slab boxes: a donor-acceptor pair across a periodic axis
    bonds on both paths; the aperiodic axis does not fold."""

    box = np.array([9.0, 9.0, 0.0])
    pos = np.array(
        [
            [
                [0.4, 4.0, 4.0],
                [0.4 - 0.96, 4.0, 4.0],  # H toward -x face
                [1.1, 4.8, 4.0],
                [9.0 - 2.4 + 0.4, 4.0, 4.0],  # acceptor across x
            ]
        ]
    )
    u = Universe.from_arrays(
        pos, box,
        names=np.array(["O", "H1", "H2", "O"], dtype=object),
        bonds=np.array([(0, 1), (0, 2)]),
    )
    out = []
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        a = HydrogenBondAnalysis(
            u, hydrogens_sel="name H*", acceptors_sel="name O*",
            verbose=False,
        )
        out.append(a.run())
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    device, host = out
    np.testing.assert_array_equal(device.results.counts, [1])
    np.testing.assert_array_equal(
        host.results.counts, device.results.counts
    )

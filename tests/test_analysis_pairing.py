"""Ion-pairing analysis vs brute-force NumPy oracles — beyond
reference (contact-pair populations, coordination, free-ion
fractions, Luzar-Chandler pair lifetimes)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.base import existence_lifetimes
from mdhelper_tpu.analysis.pairing import IonPairAnalysis
from mdhelper_tpu.core.universe import Universe

rng = np.random.default_rng(83)

T, N1, N2 = 6, 24, 20
BOX = np.array([12.0, 11.0, 13.0])
CUT = 3.2


def _min_image(delta, box):
    return delta - box * np.round(delta / box)


def _universe(pos, box=BOX, **kw):
    n = pos.shape[1]
    kw.setdefault("types", np.array(["A"] * n, dtype=object))
    return Universe.from_arrays(pos, box, dt=1.0, **kw)


def _oracle(p1, p2, box, cutoff, exclude_same=None):
    """Brute (N1, N2) min-image contact matrix per frame."""

    d = _min_image(p2[None, :, :] - p1[:, None, :], box)
    within = (d**2).sum(-1) <= cutoff**2
    if exclude_same is not None:
        within &= exclude_same
    return within


@pytest.fixture(scope="module")
def traj():
    return rng.random((T, N1 + N2, 3)) * BOX


@pytest.fixture(scope="module")
def universe(traj):
    return _universe(traj)


def test_counts_coordination_free_vs_oracle(universe, traj):
    cations = universe.atoms[np.arange(N1)]
    anions = universe.atoms[np.arange(N1, N1 + N2)]
    ipa = IonPairAnalysis(
        cations, anions, CUT, pair_counts=True, verbose=False
    ).run()
    part1 = np.zeros(N1)
    part2 = np.zeros(N2)
    pair_o = np.zeros((N1, N2), dtype=np.int64)
    for t in range(T):
        w = _oracle(traj[t, :N1], traj[t, N1:], BOX, CUT)
        assert ipa.results.counts[t] == w.sum()
        np.testing.assert_allclose(
            ipa.results.free_fractions[t],
            [(w.sum(1) == 0).mean(), (w.sum(0) == 0).mean()],
            rtol=1e-12,
        )
        part1 += w.sum(1)
        part2 += w.sum(0)
        pair_o += w
    np.testing.assert_allclose(
        ipa.results.coordination[0], part1 / T, rtol=1e-12
    )
    np.testing.assert_allclose(
        ipa.results.coordination[1], part2 / T, rtol=1e-12
    )
    np.testing.assert_array_equal(ipa.results.pair_counts, pair_o)
    assert ipa.results.mean_count == pytest.approx(
        ipa.results.counts.mean()
    )


def test_residue_com_grouping(traj):
    # 2-atom molecular ions: pairing by residue COM
    u = _universe(
        traj,
        masses=np.concatenate(
            [np.tile([2.0, 1.0], N1 // 2), np.ones(N2)]
        ),
        resindices=np.concatenate(
            [np.repeat(np.arange(N1 // 2), 2), N1 + np.arange(N2)]
        ),
    )
    cations = u.atoms[np.arange(N1)]
    anions = u.atoms[np.arange(N1, N1 + N2)]
    ipa = IonPairAnalysis(
        cations, anions, CUT, ("residues", "atoms"), verbose=False
    ).run()
    masses = np.tile([2.0, 1.0], N1 // 2)
    for t in (0, T - 1):
        pos = traj[t, :N1].reshape(N1 // 2, 2, 3)
        m = masses.reshape(N1 // 2, 2)
        com = (m[..., None] * pos).sum(1) / m.sum(1)[:, None]
        w = _oracle(com, traj[t, N1:], BOX, CUT)
        assert ipa.results.counts[t] == w.sum()


def test_like_ion_self_exclusion(universe, traj):
    g = universe.atoms[np.arange(N1)]
    ipa = IonPairAnalysis(g, g, CUT, verbose=False).run()
    for t in (0, T // 2):
        w = _oracle(
            traj[t, :N1],
            traj[t, :N1],
            BOX,
            CUT,
            exclude_same=~np.eye(N1, dtype=bool),
        )
        # identical entity sets: each unordered pair counted ONCE
        assert ipa.results.counts[t] == w.sum() // 2
    # symmetric: both coordination arrays equal
    np.testing.assert_allclose(
        ipa.results.coordination[0],
        ipa.results.coordination[1],
        rtol=1e-12,
    )


def test_lifetimes_match_existence_engine(universe, traj):
    cations = universe.atoms[np.arange(N1)]
    anions = universe.atoms[np.arange(N1, N1 + N2)]
    ipa = IonPairAnalysis(
        cations, anions, CUT, lifetimes=True, verbose=False
    ).run()
    h = np.stack(
        [
            _oracle(traj[t, :N1], traj[t, N1:], BOX, CUT)
            for t in range(T)
        ]
    ).reshape(T, -1)
    c_ref, s_ref = existence_lifetimes(h)
    np.testing.assert_allclose(
        ipa.results.lifetime, c_ref, rtol=1e-10
    )
    np.testing.assert_allclose(
        ipa.results.survival, s_ref, rtol=1e-10
    )
    np.testing.assert_allclose(
        ipa.results.lifetime_times, np.arange(T) * 1.0
    )
    assert ipa.results.lifetime[0] == pytest.approx(1.0)
    assert np.all(np.diff(ipa.results.survival) <= 1e-12)


def test_triclinic_vs_oracle(traj):
    from mdhelper_tpu.algorithm.topology import minimize_vectors

    dims = np.array([12.0, 11.0, 13.0, 75.0, 85.0, 70.0])
    u = _universe(traj, dims)
    cations = u.atoms[np.arange(N1)]
    anions = u.atoms[np.arange(N1, N1 + N2)]
    ipa = IonPairAnalysis(cations, anions, CUT, verbose=False).run()
    for t in (0, T - 1):
        delta = (
            traj[t, N1:][None, :, :] - traj[t, :N1][:, None, :]
        ).reshape(-1, 3)
        v = np.asarray(minimize_vectors(delta, dims)).reshape(
            N1, N2, 3
        )
        w = (v**2).sum(-1) <= CUT**2
        assert ipa.results.counts[t] == w.sum()


def test_parallel_matches_serial(universe):
    cations = universe.atoms[np.arange(N1)]
    anions = universe.atoms[np.arange(N1, N1 + N2)]
    serial = IonPairAnalysis(
        cations, anions, CUT, verbose=False
    ).run()
    par = IonPairAnalysis(
        cations, anions, CUT, parallel=True, verbose=False
    ).run()
    np.testing.assert_array_equal(
        par.results.counts, serial.results.counts
    )
    np.testing.assert_allclose(
        par.results.coordination[0],
        serial.results.coordination[0],
        rtol=1e-12,
    )


def test_host_pipeline_matches_device(universe, monkeypatch):
    cations = universe.atoms[np.arange(N1)]
    anions = universe.atoms[np.arange(N1, N1 + N2)]
    results = []
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        ipa = IonPairAnalysis(
            cations, anions, CUT,
            pair_counts=True, lifetimes=True, verbose=False,
        )
        ipa._chunk_bytes = 2 * (N1 + N2) * 3 * 8
        ipa.run()
        results.append(ipa)
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    device, host = results
    assert not device._host_pipeline and host._host_pipeline
    np.testing.assert_array_equal(
        host.results.counts, device.results.counts
    )
    np.testing.assert_allclose(
        host.results.free_fractions,
        device.results.free_fractions,
        rtol=1e-12,
    )
    np.testing.assert_array_equal(
        host.results.pair_counts, device.results.pair_counts
    )
    np.testing.assert_allclose(
        host.results.lifetime, device.results.lifetime, rtol=1e-10
    )


def test_validation(universe):
    g1 = universe.atoms[np.arange(N1)]
    g2 = universe.atoms[np.arange(N1, N1 + N2)]
    with pytest.raises(ValueError, match="cutoff"):
        IonPairAnalysis(g1, g2, -1.0, verbose=False)
    with pytest.raises(ValueError, match="groupings"):
        IonPairAnalysis(g1, g2, CUT, "molecules", verbose=False)

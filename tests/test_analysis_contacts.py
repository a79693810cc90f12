"""Native-contacts analysis vs f64 NumPy oracles — beyond-reference
capability (MDAnalysis.analysis.contacts family)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.contacts import NativeContacts
from mdhelper_tpu.core.universe import Universe

rng = np.random.default_rng(53)
BOX = 10.0


def _universe(pos, **kw):
    n = pos.shape[-2]
    return Universe.from_arrays(
        pos, np.array([BOX] * 3),
        types=np.array(["A"] * n, dtype=object), **kw
    )


def _min_image(d, box=BOX):
    return d - box * np.round(d / box)


def _oracle(pos, a_ix, b_ix, radius, method, lam, beta):
    """Reference pairs from frame 0, then q(t)."""
    p0 = pos[0]
    pairs = []
    for i, ai in enumerate(a_ix):
        for j, bj in enumerate(b_ix):
            if ai == bj:
                continue
            r = np.linalg.norm(_min_image(p0[bj] - p0[ai]))
            if r < radius:
                pairs.append((i, j, r))
    q = np.empty(len(pos))
    for f, p in enumerate(pos):
        vals = []
        for i, j, r0 in pairs:
            r = np.linalg.norm(
                _min_image(p[b_ix[j]] - p[a_ix[i]])
            )
            if method == "radius":
                vals.append(float(r < radius))
            elif method == "hard":
                vals.append(float(r < lam * r0))
            else:
                vals.append(
                    1.0 / (1.0 + np.exp(beta * (r - lam * r0)))
                )
        q[f] = np.mean(vals)
    return q, len(pairs)


@pytest.mark.parametrize("method", ["hard", "soft", "radius"])
def test_native_contacts_vs_oracle(method):
    F, n = 5, 30
    pos = np.empty((F, n, 3))
    pos[0] = rng.random((n, 3)) * BOX
    for f in range(1, F):
        pos[f] = pos[f - 1] + 0.5 * rng.standard_normal((n, 3))
    u = _universe(pos)
    ga = u.atoms[: n // 2]
    gb = u.atoms[n // 2:]
    nc = NativeContacts(
        ga, gb, 4.0, method=method, verbose=False
    ).run()
    q_o, n_pairs = _oracle(
        pos, ga.ix, gb.ix, 4.0, method, 1.8, 5.0
    )
    assert nc.results.n_native == n_pairs
    np.testing.assert_allclose(nc.results.q, q_o, atol=1e-9)
    if method in ("hard", "radius"):
        assert nc.results.q[0] == 1.0  # reference frame


def test_native_contacts_r0_and_pairs():
    F, n = 2, 20
    pos = rng.random((F, n, 3)) * BOX
    u = _universe(pos)
    ga, gb = u.atoms[:10], u.atoms[10:]
    nc = NativeContacts(ga, gb, 4.5, verbose=False).run()
    a, b = nc.results.pairs.T
    d = np.linalg.norm(
        _min_image(pos[0][gb.ix[b]] - pos[0][ga.ix[a]]), axis=1
    )
    np.testing.assert_allclose(nc.results.r0, d, atol=1e-12)
    assert (d < 4.5).all()


def test_explicit_reference_and_self_group():
    F, n = 3, 24
    pos = rng.random((F, n, 3)) * BOX
    ref = rng.random((n, 3)) * BOX
    u = _universe(pos)
    nc = NativeContacts(
        u.atoms, radius=3.5, reference=(ref, ref),
        method="soft", verbose=False,
    ).run()
    # self-group: same-atom pairs excluded, q finite in (0, 1]
    assert np.isfinite(nc.results.q).all()
    assert (nc.results.q > 0).all()
    assert (
        u.atoms.ix[nc.results.pairs[:, 0]]
        != u.atoms.ix[nc.results.pairs[:, 1]]
    ).all()


def test_host_pipeline_matches_device(monkeypatch):
    F, n = 4, 26
    pos = rng.random((F, n, 3)) * BOX
    results = {}
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        u = _universe(pos)
        nc = NativeContacts(
            u.atoms[:13], u.atoms[13:], 4.5, method="soft",
            verbose=False,
        ).run()
        assert nc._host_pipeline is (knob == "1")
        results[knob] = nc.results.q
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    np.testing.assert_allclose(
        results["0"], results["1"], atol=1e-9
    )


def test_parallel_matches_serial():
    F, n = 8, 24
    pos = rng.random((F, n, 3)) * BOX
    u = _universe(pos)
    serial = NativeContacts(
        u.atoms[:12], u.atoms[12:], 4.5, verbose=False
    ).run()
    u2 = _universe(pos)
    par = NativeContacts(
        u2.atoms[:12], u2.atoms[12:], 4.5, parallel=True,
        verbose=False,
    ).run()
    np.testing.assert_allclose(
        par.results.q, serial.results.q, atol=1e-12
    )


def test_validation():
    pos = rng.random((2, 12, 3)) * BOX
    u = _universe(pos)
    with pytest.raises(ValueError, match="radius"):
        NativeContacts(u.atoms, radius=-1, verbose=False)
    with pytest.raises(ValueError, match="method"):
        NativeContacts(u.atoms, method="fuzzy", verbose=False)
    # no contacts in the reference
    far = np.zeros((1, 4, 3))
    far[0] = np.array(
        [[0, 0, 0], [5, 0, 0], [0, 5, 0], [0, 0, 5]], float
    )
    uf = _universe(far)
    with pytest.raises(ValueError, match="No native contacts"):
        NativeContacts(
            uf.atoms[:2], uf.atoms[2:], 1.0, verbose=False
        ).run()

"""Cluster / aggregation analysis vs a union-find NumPy oracle —
beyond-reference capability (gmx clustsize family)."""

import numpy as np
import pytest

from mdhelper_tpu.analysis.cluster import ClusterSizeDistribution
from mdhelper_tpu.core.universe import Universe

rng = np.random.default_rng(7)


def _box_matrix(dims):
    a, b, c = dims[:3]
    al, be, ga = np.deg2rad(dims[3:6])
    bx, by = b * np.cos(ga), b * np.sin(ga)
    cx = c * np.cos(be)
    cy = c * (np.cos(al) - np.cos(be) * np.cos(ga)) / np.sin(ga)
    cz = np.sqrt(c**2 - cx**2 - cy**2)
    return np.array([[a, 0, 0], [bx, by, 0], [cx, cy, cz]])


def _min_image_d2(pts, h):
    """Brute-force 27-image squared distance matrix (float64)."""

    delta = pts[:, None, :] - pts[None, :, :]
    if h.ndim == 1:
        delta -= h * np.round(delta / h)
        return (delta**2).sum(-1)
    frac = delta @ np.linalg.inv(h)
    frac -= np.round(frac)
    base = frac @ h
    d2 = np.full(base.shape[:2], np.inf)
    for sx in (-1, 0, 1):
        for sy in (-1, 0, 1):
            for sz in (-1, 0, 1):
                cand = base + np.array([sx, sy, sz], float) @ h
                d2 = np.minimum(d2, (cand**2).sum(-1))
    return d2


class _UnionFind:
    def __init__(self, n):
        self.parent = list(range(n))

    def find(self, i):
        while self.parent[i] != i:
            self.parent[i] = self.parent[self.parent[i]]
            i = self.parent[i]
        return i

    def union(self, i, j):
        ri, rj = self.find(i), self.find(j)
        if ri != rj:
            self.parent[max(ri, rj)] = min(ri, rj)


def _oracle_frame(adj):
    """Cluster sizes from a boolean adjacency via union-find."""

    n = adj.shape[0]
    uf = _UnionFind(n)
    for i, j in zip(*np.nonzero(np.triu(adj, 1))):
        uf.union(int(i), int(j))
    roots = np.array([uf.find(i) for i in range(n)])
    _, sizes = np.unique(roots, return_counts=True)
    hist = np.bincount(sizes - 1, minlength=n)
    return hist, len(sizes), sizes.max()


def test_cluster_atoms_oracle_ortho():
    box = np.array([12.0, 12.0, 12.0])
    F, n = 5, 40
    pos = rng.random((F, n, 3)) * box
    u = Universe.from_arrays(
        pos, box, types=np.array(["A"] * n, dtype=object)
    )
    cutoff = 2.1
    cl = ClusterSizeDistribution(
        u.atoms, cutoff, verbose=False
    ).run()

    total = np.zeros(n, dtype=np.int64)
    for f in range(F):
        d2 = _min_image_d2(pos[f], box)
        hist, n_cl, largest = _oracle_frame(d2 <= cutoff**2)
        total += hist
        assert cl.results.n_clusters[f] == n_cl
        assert cl.results.largest[f] == largest
    np.testing.assert_array_equal(cl.results.size_counts, total)

    # distribution + averages
    dist = total / total.sum()
    s = np.arange(1, n + 1, dtype=float)
    np.testing.assert_allclose(
        cl.results.size_distribution, dist, rtol=1e-12
    )
    np.testing.assert_allclose(
        cl.results.number_average, (s * dist).sum(), rtol=1e-12
    )
    np.testing.assert_allclose(
        cl.results.weight_average,
        (s * s * dist).sum() / (s * dist).sum(),
        rtol=1e-12,
    )

    # parallel=True bit-equality
    par = ClusterSizeDistribution(
        u.atoms, cutoff, parallel=True, verbose=False
    ).run()
    np.testing.assert_array_equal(
        par.results.size_counts, cl.results.size_counts
    )
    np.testing.assert_array_equal(
        par.results.n_clusters, cl.results.n_clusters
    )


def test_cluster_pbc_wrap_joins():
    """Two atoms straddling the boundary cluster together."""

    box = np.array([10.0, 10.0, 10.0])
    pos = np.array(
        [[[0.2, 5.0, 5.0], [9.9, 5.0, 5.0], [5.0, 5.0, 5.0]]]
    )
    u = Universe.from_arrays(
        pos, box, types=np.array(["A"] * 3, dtype=object)
    )
    cl = ClusterSizeDistribution(u.atoms, 1.0, verbose=False).run()
    np.testing.assert_array_equal(
        cl.results.size_counts, [1, 1, 0]
    )
    assert cl.results.n_clusters[0] == 2
    assert cl.results.largest[0] == 2


def test_cluster_molecules_closest_and_com():
    """Residue clustering: any-atom contact vs COM criterion give
    different answers for elongated molecules; both match oracles."""

    box = np.array([20.0, 20.0, 20.0])
    # two 3-atom rods, end-to-end close but COMs far
    mol_a = np.array([[5.0, 5, 5], [6.5, 5, 5], [8.0, 5, 5]])
    mol_b = np.array([[9.0, 5, 5], [10.5, 5, 5], [12.0, 5, 5]])
    mol_c = np.array([[5.0, 15, 15], [6.5, 15, 15], [8.0, 15, 15]])
    pos = np.concatenate([mol_a, mol_b, mol_c])[None]
    u = Universe.from_arrays(
        pos, box,
        types=np.array(["C"] * 9, dtype=object),
        resindices=np.repeat(np.arange(3), 3),
        masses=np.ones(9),
    )
    cutoff = 1.6  # a-b end gap = 1.0 < cutoff; COM gap = 4.0 > cutoff
    closest = ClusterSizeDistribution(
        u.atoms, cutoff, "residues", verbose=False
    ).run()
    np.testing.assert_array_equal(
        closest.results.size_counts, [1, 1, 0]
    )
    com = ClusterSizeDistribution(
        u.atoms, cutoff, "residues", criterion="com", verbose=False
    ).run()
    np.testing.assert_array_equal(
        com.results.size_counts, [3, 0, 0]
    )


def test_cluster_triclinic_oracle():
    dims = np.array([9.0, 10.0, 11.0, 75.0, 85.0, 100.0])
    h = _box_matrix(dims)
    F, n = 4, 30
    pos = (rng.random((F * n, 3)) @ h).reshape(F, n, 3)
    u = Universe.from_arrays(
        pos, dims, types=np.array(["A"] * n, dtype=object)
    )
    cutoff = 2.4
    cl = ClusterSizeDistribution(u.atoms, cutoff, verbose=False).run()
    total = np.zeros(n, dtype=np.int64)
    for f in range(F):
        d2 = _min_image_d2(pos[f], h)
        hist, n_cl, largest = _oracle_frame(d2 <= cutoff**2)
        total += hist
        assert cl.results.n_clusters[f] == n_cl
        assert cl.results.largest[f] == largest
    np.testing.assert_array_equal(cl.results.size_counts, total)


def test_cluster_chain_topology():
    """A linear chain of touching atoms is ONE cluster — exercises
    the pointer-jumping convergence on a diameter-N graph."""

    n = 64
    box = np.array([200.0, 50.0, 50.0])
    pos = np.zeros((1, n, 3))
    pos[0, :, 0] = 10.0 + np.arange(n) * 1.0  # spacing 1.0
    pos[0, :, 1] = 25.0
    pos[0, :, 2] = 25.0
    u = Universe.from_arrays(
        pos, box, types=np.array(["A"] * n, dtype=object)
    )
    cl = ClusterSizeDistribution(u.atoms, 1.05, verbose=False).run()
    assert cl.results.n_clusters[0] == 1
    assert cl.results.largest[0] == n
    expected = np.zeros(n, dtype=np.int64)
    expected[n - 1] = 1
    np.testing.assert_array_equal(cl.results.size_counts, expected)


def test_cluster_scrambled_chain_regression():
    """Chain clusters whose entity indices are scrambled along the
    chain need label flow across many hops — the fixed-round label
    propagation this regression guards against reported 2 clusters
    for a connected 7-atom line (contact path 1-4-3-2-5-6-0)."""

    order = [1, 4, 3, 2, 5, 6, 0]
    n = len(order)
    box = np.array([50.0, 50.0, 50.0])
    pos = np.zeros((1, n, 3))
    for hop, atom in enumerate(order):
        pos[0, atom] = [5.0 + hop * 1.0, 25.0, 25.0]
    u = Universe.from_arrays(
        pos, box, types=np.array(["A"] * n, dtype=object)
    )
    cl = ClusterSizeDistribution(u.atoms, 1.05, verbose=False).run()
    assert cl.results.n_clusters[0] == 1
    assert cl.results.largest[0] == n


def test_cluster_randomized_graphs_vs_union_find():
    """200 random sparse geometries (chains, rings, blobs, mixed
    densities) against the union-find oracle — exact cluster counts
    and size histograms for arbitrary topologies and index orders."""

    r = np.random.default_rng(53)
    box = np.array([30.0, 30.0, 30.0])
    sizes = (7, 12, 23, 34)  # few distinct shapes -> jit cache hits
    for trial in range(200):
        n = sizes[int(r.integers(len(sizes)))]
        kind = trial % 4
        pts = np.empty((n, 3))
        if kind == 0:  # scrambled chain
            perm = r.permutation(n)
            for hop, atom in enumerate(perm):
                pts[atom] = [2.0 + hop * 1.1, 15.0, 15.0]
        elif kind == 1:  # ring (wraps the box for n large)
            theta = 2 * np.pi * np.arange(n) / n
            perm = r.permutation(n)
            rad = 1.1 * n / (2 * np.pi)
            for hop, atom in enumerate(perm):
                pts[atom] = [
                    15 + rad * np.cos(theta[hop]),
                    15 + rad * np.sin(theta[hop]),
                    15.0,
                ]
        else:  # random gas / blobs
            pts = r.random((n, 3)) * box
        cutoff = (1.15, 1.8, 2.6)[int(r.integers(3))]
        u = Universe.from_arrays(
            pts[None] % box, box,
            types=np.array(["A"] * n, dtype=object),
        )
        cl = ClusterSizeDistribution(
            u.atoms, cutoff, verbose=False
        ).run()
        d2 = _min_image_d2(pts % box, box)
        hist, n_cl, largest = _oracle_frame(d2 <= cutoff**2)
        assert cl.results.n_clusters[0] == n_cl, (trial, kind)
        assert cl.results.largest[0] == largest, (trial, kind)
        np.testing.assert_array_equal(
            cl.results.size_counts, hist, err_msg=f"{trial} {kind}"
        )


def test_cluster_validation():
    box = np.array([10.0, 10.0, 10.0])
    pos = rng.random((1, 4, 3)) * box
    u = Universe.from_arrays(
        pos, box, types=np.array(["A"] * 4, dtype=object)
    )
    with pytest.raises(ValueError):
        ClusterSizeDistribution(u.atoms, -1.0, verbose=False)
    with pytest.raises(ValueError):
        ClusterSizeDistribution(
            u.atoms, 1.0, "molecules", verbose=False
        )
    with pytest.raises(ValueError):
        ClusterSizeDistribution(
            u.atoms, 1.0, criterion="nearest", verbose=False
        )


def test_cluster_host_pipeline_equals_device(monkeypatch):
    """Host-pipeline clustering (KD-tree + union-find; the large-N
    path) matches the device label-propagation path bit-for-bit —
    atoms and molecule criteria, orthorhombic and triclinic."""

    local = np.random.default_rng(71)

    def run_both(u, *args, **kwargs):
        out = []
        for knob in ("0", "1"):
            monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
            a = ClusterSizeDistribution(
                u.atoms, *args, verbose=False, **kwargs
            )
            a._chunk_bytes = 3 * u.atoms.n_atoms * 3 * 8
            out.append(a.run())
        monkeypatch.delenv("MDTPU_HOST_PIPELINE")
        device, host = out
        assert host._host_pipeline and not device._host_pipeline
        np.testing.assert_array_equal(
            host.results.size_counts, device.results.size_counts
        )
        np.testing.assert_array_equal(
            host.results.n_clusters, device.results.n_clusters
        )
        np.testing.assert_array_equal(
            host.results.largest, device.results.largest
        )

    box = np.array([12.0, 12.0, 12.0])
    pos = local.random((5, 30, 3)) * box
    u = Universe.from_arrays(
        pos, box, types=np.array(["A"] * 30, dtype=object)
    )
    run_both(u, 2.4)

    # molecules: closest + com criteria
    n_mol = 8
    u_mol = Universe.from_arrays(
        pos[:, : 3 * n_mol], box,
        types=np.array(["A"] * (3 * n_mol), dtype=object),
        masses=np.ones(3 * n_mol),
        resindices=np.repeat(np.arange(n_mol), 3),
    )
    run_both(u_mol, 3.0, "residues")
    run_both(u_mol, 3.0, "residues", criterion="com")

    # triclinic
    dims = np.array([9.0, 10.0, 11.0, 75.0, 85.0, 100.0])
    h = _box_matrix(dims)
    tric = Universe.from_arrays(
        (local.random((4 * 24, 3)) @ h).reshape(4, 24, 3), dims,
        types=np.array(["A"] * 24, dtype=object),
    )
    run_both(tric, 2.2)


def test_cluster_slab_box_host_equals_device(monkeypatch):
    """Mixed-periodicity (slab) boxes: zero-length axes are
    aperiodic on BOTH paths (regression: the host KD-tree dropped
    periodicity entirely when any axis was zero)."""

    local = np.random.default_rng(79)
    box = np.array([12.0, 12.0, 0.0])  # 2D-periodic slab
    pos = local.random((4, 24, 3)) * np.array([12.0, 12.0, 8.0])
    u = Universe.from_arrays(
        pos, box, types=np.array(["A"] * 24, dtype=object)
    )
    out = []
    for knob in ("0", "1"):
        monkeypatch.setenv("MDTPU_HOST_PIPELINE", knob)
        a = ClusterSizeDistribution(u.atoms, 2.4, verbose=False)
        out.append(a.run())
    monkeypatch.delenv("MDTPU_HOST_PIPELINE")
    device, host = out
    np.testing.assert_array_equal(
        host.results.n_clusters, device.results.n_clusters
    )
    np.testing.assert_array_equal(
        host.results.size_counts, device.results.size_counts
    )
    # and against the brute-force oracle with per-axis folding
    total = np.zeros(24, dtype=np.int64)
    for f in range(4):
        delta = pos[f][:, None, :] - pos[f][None, :, :]
        delta[..., :2] -= 12.0 * np.round(delta[..., :2] / 12.0)
        d2 = (delta**2).sum(-1)
        hist, n_cl, largest = _oracle_frame(d2 <= 2.4**2)
        total += hist
        assert device.results.n_clusters[f] == n_cl
    np.testing.assert_array_equal(device.results.size_counts, total)

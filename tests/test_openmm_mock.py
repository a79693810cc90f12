"""Exercise add_image_charges' mirroring/exclusion bookkeeping on a
mock OpenMM (VERDICT round-1 item 7): positions mirrored across the
electrode plane, image charges scaled by gamma (zeroed on walls),
exceptions/exclusions replicated per cell, wall-image-wall
interactions removed, topology/system particle counts doubled.
Parity target: ``/root/reference/src/mdhelper/openmm/system.py:410-878``.
"""

import types

import numpy as np
import pytest

from mdhelper_tpu.openmm import system as msys


# -- minimal fake OpenMM ------------------------------------------------------


def _val(x):
    return x.v if isinstance(x, FQ) else x


class FQ:
    """Fake openmm.unit.Quantity: wraps a value, all unit ops are
    identity."""

    __array_ufunc__ = None

    def __init__(self, v):
        self.v = v

    def value_in_unit(self, u):
        return self.v

    def in_units_of(self, u):
        return self

    def __mul__(self, o):
        return FQ(self.v * _val(o))

    __rmul__ = __mul__

    def __truediv__(self, o):
        return FQ(self.v / _val(o))

    def __rtruediv__(self, o):
        return FQ(_val(o) / self.v)

    def __pow__(self, p):
        return FQ(self.v**p)

    def __getitem__(self, i):
        return FQ(self.v[i])

    def __setitem__(self, i, value):
        self.v[i] = _val(value)

    def __float__(self):
        return float(self.v)


class FU:
    """Fake unit symbol: composes to FU, attaches to values as FQ."""

    __array_ufunc__ = None

    def __mul__(self, o):
        return FU() if isinstance(o, FU) else FQ(o)

    def __rmul__(self, o):
        return FQ(o)

    def __truediv__(self, o):
        return FU()

    __rtruediv__ = __truediv__

    def __pow__(self, p):
        return FU()


fake_unit = types.SimpleNamespace(
    Quantity=FQ,
    nanometer=FU(),
    elementary_charge=FU(),
    kilojoule_per_mole=FU(),
    AVOGADRO_CONSTANT_NA=FQ(6.02214076e23),
)


class FakeExternalForce:
    def __init__(self, energy):
        self.energy = energy
        self.global_params = {}
        self.per_params = []
        self.particles = []

    def addGlobalParameter(self, name, value):
        self.global_params[name] = value

    def addPerParticleParameter(self, name):
        self.per_params.append(name)

    def addParticle(self, index, params):
        self.particles.append((index, tuple(params)))


class FakeCVForce:
    def __init__(self, energy):
        self.energy = energy
        self.cvs = {}
        self.global_params = {}

    def addCollectiveVariable(self, name, force):
        self.cvs[name] = force

    def addGlobalParameter(self, name, value):
        self.global_params[name] = value

    def setEnergyFunction(self, energy):
        self.energy = energy


fake_openmm = types.SimpleNamespace(
    CustomExternalForce=FakeExternalForce,
    CustomCVForce=FakeCVForce,
)


class FakeSystem:
    def __init__(self, n):
        self.n = n
        self.pbv = [
            np.array([4.0, 0, 0]),
            np.array([0, 4.0, 0]),
            np.array([0, 0, 6.0]),
        ]
        self.forces = []

    def getDefaultPeriodicBoxVectors(self):
        return self.pbv

    def setDefaultPeriodicBoxVectors(self, *pbv):
        self.pbv = list(pbv)

    def addParticle(self, mass):
        self.n += 1

    def getNumParticles(self):
        return self.n

    def addForce(self, force):
        self.forces.append(force)


class _Obj:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class FakeTopology:
    def __init__(self, n, dims):
        self._dims = np.asarray(dims, dtype=float)
        self._chains = [_Obj(index=0)]
        self._residues = [
            _Obj(index=i, name=f"R{i}", chain=self._chains[0])
            for i in range(n)
        ]
        self._atoms = [
            _Obj(name=f"A{i}", element=None, residue=self._residues[i])
            for i in range(n)
        ]

    def getUnitCellDimensions(self):
        return FQ(self._dims)

    def setUnitCellDimensions(self, dims):
        self._dims = np.asarray(_val(dims), dtype=float)

    def getNumChains(self):
        return len(self._chains)

    def atoms(self):
        return iter(self._atoms)

    def residues(self):
        return iter(self._residues)

    def addChain(self):
        chain = _Obj(index=len(self._chains))
        self._chains.append(chain)
        return chain

    def addResidue(self, name, chain):
        residue = _Obj(index=len(self._residues), name=name,
                       chain=chain)
        self._residues.append(residue)
        return residue

    def addAtom(self, name, element, residue):
        atom = _Obj(name=name, element=element, residue=residue)
        self._atoms.append(atom)
        return atom


class FakeNonbondedForce:
    def __init__(self, charges):
        self.params = [(q, 1.0, 0.5) for q in charges]
        self.exceptions = []

    def getParticleParameters(self, i):
        return self.params[i]

    def addParticle(self, charge, sigma, epsilon):
        self.params.append((charge, sigma, epsilon))

    def getNumParticles(self):
        return len(self.params)

    def getNumExceptions(self):
        return len(self.exceptions)

    def getExceptionParameters(self, i):
        return self.exceptions[i]

    def addException(self, i, j, qq, sigma, epsilon):
        self.exceptions.append((i, j, qq, sigma, epsilon))


class FakeCustomNonbondedForce:
    def __init__(self, params_per_particle):
        self.params = [tuple(p) for p in params_per_particle]
        self.exclusions = []

    def getParticleParameters(self, i):
        return self.params[i]

    def addParticle(self, params):
        self.params.append(tuple(params))

    def getExclusionParticles(self, i):
        return self.exclusions[i]

    def addExclusion(self, i, j):
        self.exclusions.append((i, j))


class FakeIntegrator:
    def __init__(self, temp, fric, dt, n_cells):
        self.args = (temp, fric, dt, n_cells)


@pytest.fixture()
def patched(monkeypatch):
    monkeypatch.setattr(msys, "openmm", fake_openmm)
    monkeypatch.setattr(msys, "unit", fake_unit)
    monkeypatch.setattr(msys, "ICLangevinIntegrator", FakeIntegrator)
    monkeypatch.setattr(msys, "FOUND_ICPLUGIN", True)
    monkeypatch.setattr(msys, "VACUUM_PERMITTIVITY", 8.8541878128e-12)


N = 6
LZ = 6.0
# atoms 0 and 5 are electrode (wall) atoms at z = 0 and z = LZ.
POSITIONS = np.array(
    [
        [0.5, 0.5, 0.0],
        [1.0, 1.0, 1.5],
        [2.0, 2.0, 3.0],
        [3.0, 1.0, 4.0],
        [1.0, 3.0, 5.0],
        [0.5, 0.5, LZ],
    ]
)
CHARGES = [0.5, 1.0, -1.0, 1.0, -1.0, -0.5]


def _build():
    system = FakeSystem(N)
    topology = FakeTopology(N, [4.0, 4.0, LZ])
    nbforce = FakeNonbondedForce(CHARGES)
    nbforce.exceptions.append((1, 2, 0.25, 0.0, 0.0))  # bonded pair
    nbforce.exceptions.append((0, 1, 0.10, 0.0, 0.0))  # involves wall
    return system, topology, nbforce


def test_image_charge_bookkeeping(patched):
    system, topology, nbforce = _build()
    cnb = FakeCustomNonbondedForce(
        [(q, 0.3) for q in CHARGES]
    )
    cnb.exclusions.append((1, 2))
    cnb.exclusions.append((0, 1))
    positions, integrator = msys.add_image_charges(
        system, topology, POSITIONS.copy(), 300.0, 1.0, 0.01,
        nbforce=nbforce,
        cnbforces={cnb: {"charge": 0, "zero": [1]}},
    )
    positions = np.asarray(_val(positions))

    # Integrator carries (temp, fric, dt, n_cells).
    assert integrator.args == (300.0, 1.0, 0.01, 2)

    # Positions: image cell is the z-mirror.
    assert positions.shape == (2 * N, 3)
    np.testing.assert_allclose(
        positions[N:], POSITIONS * np.array([1, 1, -1])
    )

    # Box doubled along z (topology + system PBVs).
    np.testing.assert_allclose(topology._dims, [4.0, 4.0, 2 * LZ])
    np.testing.assert_allclose(system.pbv[2], [0, 0, 2 * LZ])

    # System/topology particle bookkeeping.
    assert system.getNumParticles() == 2 * N
    assert len(topology._atoms) == 2 * N
    assert topology._atoms[N].name == "A0_ic" or topology._atoms[
        N
    ].name.startswith("IC_")

    # Image charges: gamma = -1 flips non-wall charges, zeroes walls,
    # and zeroes LJ (sigma=eps=0).
    wall = {0, 5}
    for i in range(N):
        q, sigma, epsilon = nbforce.getParticleParameters(N + i)
        expected = 0.0 if i in wall else -CHARGES[i]
        assert q == expected
        assert sigma == 0 and epsilon == 0

    # Custom force image params: charge scaled, "zero" column zeroed.
    for i in range(N):
        params = cnb.getParticleParameters(N + i)
        expected = 0.0 if i in wall else -CHARGES[i]
        assert float(params[0]) == expected
        assert float(params[1]) == 0.0

    # Non-wall exception mirrored into the image cell; the exception
    # involving wall atom 0 is not.
    assert (N + 1, N + 2, 0.25, 0, 0) in nbforce.exceptions
    assert not any(
        e[:2] == (N + 0, N + 1) for e in nbforce.exceptions
    )
    assert (N + 1, N + 2) in cnb.exclusions

    # Wall-image-wall self interactions removed (exclude=False:
    # diagonal only).
    assert (0, N + 0, 0, 0, 0) in nbforce.exceptions
    assert (5, N + 5, 0, 0, 0) in nbforce.exceptions
    assert (0, N + 0) in cnb.exclusions
    assert (5, N + 5) in cnb.exclusions
    assert not any(e[:2] == (0, N + 5) for e in nbforce.exceptions)

    # gamma = -1 and electroneutral: no correction force needed.
    assert system.forces == []


def test_image_charge_exclude_all_wall_pairs(patched):
    system, topology, nbforce = _build()
    _, _ = msys.add_image_charges(
        system, topology, POSITIONS.copy(), 300.0, 1.0, 0.01,
        nbforce=nbforce, exclude=True,
    )
    # exclude=True removes every (wall, image-wall) pair, not just the
    # diagonal.
    for i in (0, 5):
        for j in (0, 5):
            assert (i, N + j, 0, 0, 0) in nbforce.exceptions


def test_image_charge_gamma_corrections(patched):
    system, topology, nbforce = _build()
    positions, integrator = msys.add_image_charges(
        system, topology, POSITIONS.copy(), 300.0, 1.0, 0.01,
        gamma=0.5, nbforce=nbforce,
    )
    # gamma != +-1 with electroneutral charges: correction CVForce with
    # the beta ladder term and the M_z^2 term.
    assert len(system.forces) == 1
    corr = system.forces[0]
    assert corr.energy == "coef1*E_corr*M_z+coef2*M_z^2"
    assert {"E_corr", "M_z"} <= set(corr.cvs)
    assert "coef1" in corr.global_params
    assert "coef2" in corr.global_params
    # Image charges scaled by gamma.
    for i in (1, 2, 3, 4):
        assert nbforce.getParticleParameters(N + i)[0] == pytest.approx(
            0.5 * CHARGES[i]
        )


def test_image_charge_four_cells(patched):
    system, topology, nbforce = _build()
    positions, integrator = msys.add_image_charges(
        system, topology, POSITIONS.copy(), 300.0, 1.0, 0.01,
        n_cells=4, nbforce=nbforce,
    )
    positions = np.asarray(_val(positions))
    assert integrator.args[-1] == 4
    assert positions.shape == (4 * N, 3)
    # Cell 1: z -> -z; cell 2: z -> z - 2 Lz; cell 3: z -> -z - 2 Lz.
    np.testing.assert_allclose(positions[N:2 * N, 2],
                               -POSITIONS[:, 2])
    np.testing.assert_allclose(positions[2 * N:3 * N, 2],
                               POSITIONS[:, 2] - 2 * LZ)
    np.testing.assert_allclose(positions[3 * N:, 2],
                               -POSITIONS[:, 2] - 2 * LZ)
    # Alternating cells carry gamma^(cell parity) = -1, +1, -1.
    assert nbforce.getParticleParameters(N + 1)[0] == -CHARGES[1]
    assert nbforce.getParticleParameters(2 * N + 1)[0] == CHARGES[1]
    assert nbforce.getParticleParameters(3 * N + 1)[0] == -CHARGES[1]


def test_image_charge_validation(patched):
    system, topology, nbforce = _build()
    with pytest.raises(ValueError, match="slab correction"):
        msys.add_image_charges(
            system, topology, POSITIONS.copy(), 300.0, 1.0, 0.01,
            gamma=0.0, nbforce=nbforce,
        )
    with pytest.raises(ValueError, match="n_cells"):
        msys.add_image_charges(
            system, topology, POSITIONS.copy(), 300.0, 1.0, 0.01,
            gamma=0.5, n_cells=4, nbforce=nbforce,
        )
    with pytest.raises(ValueError, match="charge information"):
        msys.add_image_charges(
            system, topology, POSITIONS.copy(), 300.0, 1.0, 0.01,
        )

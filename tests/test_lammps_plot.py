"""Tests for the LAMMPS data writer and plot helpers."""

import numpy as np

from mdhelper_tpu.lammps.topology import write_data
from mdhelper_tpu.plot.color import adjust_lightness
from mdhelper_tpu.plot.rcparam import FIGURE_SIZE_LIMITS, update


def test_write_data(tmp_path):
    path = str(tmp_path / "system.data")
    pos_a = np.array([[0.0, 0, 0], [1, 0, 0]])
    pos_b = np.array([[0.0, 1, 0]])
    bonds = [np.array([[1, 2]])]
    write_data(
        path,
        (pos_a, pos_b),
        bonds=bonds,
        dimensions=np.array([10.0, 10.0, 10.0]),
        charges=np.array([0.5, -1.0]),
        masses=np.array([1.0, 16.0]),
    )
    text = open(path).read()
    assert "3 atoms" in text
    assert "2 atom types" in text
    assert "1 bonds" in text
    assert "0 10 xlo xhi" in text
    assert "Masses" in text and "2 16" in text
    assert "Atoms # full" in text
    # Atom line: id mol type q x y z.
    assert "1 1 1 0.5 0 0 0" in text
    assert "3 3 2 -1 0 1 0" in text
    assert "Bonds" in text and "1 1 1 2" in text


def test_write_data_flat_charges(tmp_path):
    path = str(tmp_path / "flat.data")
    write_data(
        path,
        (np.zeros((2, 3)), np.ones((2, 3))),
        charges=np.array([0.1, 0.2, 0.3, 0.4]),
    )
    text = open(path).read()
    assert "1 1 1 0.1" in text
    assert "4 4 2 0.4" in text


def test_adjust_lightness():
    darker = adjust_lightness("red", 0.5)
    assert max(darker) <= 1 and min(darker) >= 0
    lighter = adjust_lightness((1.0, 0.0, 0.0), 1.5)
    assert lighter[1] > 0  # moved toward white
    pair = adjust_lightness(["red", "#0000ff"], 0.8)
    assert len(pair) == 2


def test_rcparam_update():
    import matplotlib as mpl

    update("acs", font_scaling=2, **{"text.usetex": False})
    assert mpl.rcParams["font.size"] == 18
    assert mpl.rcParams["figure.figsize"][0] == (
        FIGURE_SIZE_LIMITS["acs"]["max_single_width"]
    )
    assert mpl.rcParams["text.usetex"] is False


def test_tabular_legend():
    from mdhelper_tpu.plot.axis import set_up_tabular_legend

    out = set_up_tabular_legend(["r1", "r2"], ["c1", "c2", "c3"])
    assert out["ncol"] == 4
    assert "r1" in out["labels"] and "c3" in out["labels"]
    assert len(out["handles"]) == len(out["labels"])

"""aztocore native host runtime: formatting and parsing round-trips."""

import numpy as np
import pytest

from aztotmd_tpu import native


pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE,
                                reason="no C++ toolchain")


def test_row_formatting_matches_printf(tmp_path):
    p = str(tmp_path / "rows.dat")
    f = native.NativeRowFile(p)
    f.write_str("h\n")
    # (exact .5e-7 ties round differently from C's round-to-even —
    # immaterial for MD output, excluded here)
    vals = [0.0, 1.5, -2.25, 1234567.875, 1e-7, -3.4e-6]
    f.write_row(0.123456789, 42, vals)
    f.close()
    lines = open(p).read().splitlines()
    expect = "\t".join(["0.123457", "42"] + [f"{v:.6f}" for v in vals])
    assert lines[1] == expect


def test_traj_row_layout(tmp_path):
    p = str(tmp_path / "traj.dat")
    f = native.NativeRowFile(p)
    pos = np.array([[1.0, 2.0, 3.0], [4.5, 5.5, 6.5]], np.float32)
    types = np.array([0, 1], np.int32)
    ptypes = np.array([-1, 0], np.int32)
    f.write_traj_row(0.5, 7, pos, types, ptypes)
    f.close()
    row = open(p).read().lstrip("\n").split("\t")
    assert row[0] == "0.500000" and row[1] == "7"
    assert row[2:7] == ["1.000000", "2.000000", "3.000000",
                        "0.000000", "-1.000000"]


def test_xyz_parse_roundtrip(tmp_path):
    names = ["Ar", "Na+", "Cl-"] * 100
    pos = np.round(np.random.default_rng(0).uniform(0, 50, (300, 3)), 6)
    text = "".join(f"{nm} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n"
                   for nm, p in zip(names, pos))
    out_names, out_pos = native.parse_xyz_rows(text, 300)
    assert out_names == names
    np.testing.assert_allclose(out_pos, pos, atol=1e-12)


def test_xyz_parse_whitespace_agnostic():
    # fscanf semantics: arbitrary whitespace, multiple atoms per line
    names, pos = native.parse_xyz_rows("A 1 2 3 B\t4\t5\t6\nC 7 8 9", 3)
    assert names == ["A", "B", "C"]
    np.testing.assert_allclose(pos, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])

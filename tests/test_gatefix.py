"""Gate-3/4 file-system fixtures (tools/gatefix.py) through the CLI.

Small-size CPU mirror of the bench gate runs: the same generator, format
writers, YAML schema, and CLI lifecycle, at 12^3 so the suite stays fast.
(Readers ref: src/HypreSystem.cpp:1613-1969, 1021-1318.)
"""

import os
import sys

import numpy as np
import scipy.sparse as sp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


class TestGateFixtures:
    def test_pressure_spd_and_consistent(self):
        from gatefix import make_system
        r, c, v, b, n = make_system(6, 6, 6, seed=1)
        A = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
        assert abs(A - A.T).max() == 0.0
        assert np.abs(A @ np.ones(n) - b).max() < 1e-12

    def test_momentum_nonsym_consistent(self):
        from gatefix import make_system
        r, c, v, b, n = make_system(6, 6, 6, seed=1, nonsym=0.35)
        A = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
        assert abs(A - A.T).max() > 0.01
        assert np.abs(A @ np.ones(n) - b).max() < 1e-12
        d = np.abs(A.diagonal())
        offsum = np.abs(A).sum(axis=1).A1 - d
        assert (d >= offsum * 0.999).all()

    def test_gate3_cli_end_to_end(self, mesh8, tmp_path, capsys):
        import gatefix
        m, r, s, n = gatefix.write_pressure_mm(str(tmp_path), 12, 12, 12)
        y = tmp_path / "gate3.yaml"
        y.write_text(gatefix.GATE3_YAML.format(mat=m, rhs=r, sln=s))
        from tpusolve.harness import cli
        rc = cli.main([str(y)])
        out = capsys.readouterr().out
        assert rc == 0, out[-800:]
        assert "Check solution: PASSED" in out

    def test_gate4_cli_end_to_end(self, mesh8, tmp_path, capsys):
        import gatefix
        m, r, s, n = gatefix.write_momentum_ij(str(tmp_path), 10, 10, 10)
        y = tmp_path / "gate4.yaml"
        y.write_text(gatefix.GATE4_YAML.format(mat=m, rhs=r, sln=s,
                                               nfiles=2))
        from tpusolve.harness import cli
        rc = cli.main([str(y)])
        out = capsys.readouterr().out
        assert rc == 0, out[-800:]
        assert "Check solution: PASSED" in out

    def test_gate4_3component_cli(self, mesh8, tmp_path, capsys):
        """Segregated 3-RHS momentum (x/y/z) through the CLI — the
        reference's multi-component path (src/HypreSystem.cpp:1636-1645)."""
        import gatefix
        m, rs, ss, n = gatefix.write_momentum_ij(str(tmp_path), 8, 8, 8,
                                                 ncomp=3)
        y = tmp_path / "gate4c.yaml"
        y.write_text(gatefix.GATE4_YAML_3COMP.format(
            mat=m, rhs0=rs[0], rhs1=rs[1], rhs2=rs[2],
            sln0=ss[0], sln1=ss[1], sln2=ss[2], nfiles=2))
        from tpusolve.harness import cli
        rc = cli.main([str(y)])
        out = capsys.readouterr().out
        assert rc == 0, out[-800:]
        assert "Check solution: PASSED" in out
        assert out.count("Solve") >= 3   # three component solves reported

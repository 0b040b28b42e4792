import io
import numpy as np
import pytest
import scipy.sparse as sp

from tpusolve.config import parse_config, load_config
from tpusolve.formats import mmio, ij
from tpusolve.harness.system import LinearSystem
from tpusolve.harness.check import check_solution
from tpusolve.timers import Timers, CsvProfile
from tpusolve.mesh import row_decomposition
from tests.test_amg import laplace_2d


def _write_mm_system(tmp_path, n=64, rng=None):
    """SPD system + rhs + reference solution as MatrixMarket files."""
    A = laplace_2d(8, 8)
    rng = rng or np.random.default_rng(0)
    x = rng.standard_normal(n)
    b = A @ x
    Ac = A.tocoo()
    mmio.write_matrix(tmp_path / "A.mm", Ac.row, Ac.col, Ac.data, A.shape)
    mmio.write_vector(tmp_path / "b.mm", b)
    mmio.write_vector(tmp_path / "x.mm", x)
    return A, b, x


BASE_YAML = """
linear_system:
  type: matrix_market
  matrix_file: "{mat}"
  rhs_file: "{rhs}"
  sln_file: "{sln}"
  rtol: 1.0e-6
  atol: 1.0e-8

solver_settings:
  method: {method}
  preconditioner: {precond}
  tolerance: 1.0e-10
  max_iterations: 500
  kspace: 20
  precision: double

boomeramg_settings:
  strong_threshold: 0.25
  max_coarse_size: 16
  num_sweeps: 1
"""


def _run(tmp_path, mesh, method="gmres", precond="boomeramg", extra=""):
    _write_mm_system(tmp_path)
    import yaml
    doc = yaml.safe_load(BASE_YAML.format(
        mat=tmp_path / "A.mm", rhs=tmp_path / "b.mm", sln=tmp_path / "x.mm",
        method=method, precond=precond) + extra)
    cfg = parse_config(doc)
    sys_ = LinearSystem(mesh, cfg, verbose=False)
    sys_.setup_precon_and_solver()
    sys_.load()
    sys_.solve()
    ok = sys_.check_solution()
    sys_.output_linear_system()
    return sys_, ok


class TestLifecycle:
    @pytest.mark.parametrize("method,precond", [
        ("gmres", "boomeramg"),
        ("cg", "boomeramg"),
        ("bicg", "ilu"),
        ("cogmres", "none"),
        ("fgmres", "boomeramg"),
        ("boomeramg", "none"),
    ])
    def test_mm_solve_and_check(self, mesh8, tmp_path, method, precond):
        sys_, ok = _run(tmp_path, mesh8, method, precond)
        assert ok, f"{method}+{precond} failed golden check"
        assert all(bool(r.converged) for r in sys_.solve_results)

    def test_rcm_ordering_golden_check(self, mesh8, tmp_path, rng):
        """matrix_ordering: rcm — system solved in the permuted basis, the
        golden check and the written solution stay consistent with the
        original ordering."""
        n = 4096
        A = laplace_2d(64, 64)
        perm_scramble = rng.permutation(n)
        A = A[perm_scramble][:, perm_scramble].tocoo()   # scrambled input
        x = rng.standard_normal(n)
        b = sp.csr_matrix(A) @ x
        mmio.write_matrix(tmp_path / "A.mm", A.row, A.col, A.data, A.shape)
        mmio.write_vector(tmp_path / "b.mm", b)
        mmio.write_vector(tmp_path / "x.mm", x)
        import yaml
        doc = yaml.safe_load(BASE_YAML.format(
            mat=tmp_path / "A.mm", rhs=tmp_path / "b.mm",
            sln=tmp_path / "x.mm", method="cg", precond="boomeramg"))
        doc["solver_settings"]["matrix_ordering"] = "rcm"
        cfg = parse_config(doc)
        sys_ = LinearSystem(mesh8, cfg, verbose=False)
        sys_.setup_precon_and_solver()
        sys_.load()
        assert sys_._perm is not None
        sys_.solve()
        assert sys_.check_solution()
        # written solution is in the ORIGINAL ordering
        import os
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            sys_.config.linear_system.write_solution = True
            sys_.output_linear_system()
            back = ij.read_dense_vector("IJV0.sln", mesh8.devices.size, n)
        finally:
            os.chdir(cwd)
        np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-7)

    def test_stencil_lifecycle(self, mesh8):
        import yaml
        doc = yaml.safe_load("""
linear_system:
  type: build_27pt_stencil
  nx: 4
  ny: 4
  nz: 4
solver_settings:
  method: cg
  preconditioner: boomeramg
  tolerance: 1.0e-10
  max_iterations: 200
  precision: double
boomeramg_settings:
  strong_threshold: 0.25
  max_coarse_size: 32
""")
        cfg = parse_config(doc)
        sys_ = LinearSystem(mesh8, cfg, verbose=False)
        sys_.setup_precon_and_solver()
        sys_.load()
        sys_.solve()
        assert sys_.check_solution()

    def test_timer_names_match_reference(self, mesh8, tmp_path):
        sys_, _ = _run(tmp_path, mesh8, "cg", "none")
        names = [n for n, _ in sys_.timers.entries]
        # exact reference names (src/HypreSystem.cpp emit sites)
        for expected in ["Matrix market : determine system size",
                         "Matrix market : read and build matrix",
                         "Matrix market : read and build vector",
                         "Initialize system", "Assemble system",
                         "Preconditioner setup", "Solve", "Check solution"]:
            assert expected in names, f"missing timer {expected}"

    def test_invalid_method_raises(self, mesh8, tmp_path):
        with pytest.raises(ValueError, match="Invalid method"):
            _run(tmp_path, mesh8, method="notasolver")

    def test_write_outputs_roundtrip(self, mesh8, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        sys_, ok = _run(tmp_path, mesh8, "cg", "none",
                        extra="")
        sys_.config.linear_system.write_outputs = True
        sys_.output_linear_system()
        # written IJ files must round-trip through the IJ reader
        nparts = mesh8.devices.size
        r, c, v = ij.read_matrix("IJM.mat", nparts)
        A2 = sp.coo_matrix((v, (r, c)), shape=sys_.A.shape).toarray()
        # A_host is dropped when the preconditioner is "none" (memory);
        # the writer falls back to the device reconstruction
        np.testing.assert_allclose(A2, sys_.A.to_scipy().toarray(),
                                   rtol=1e-12)

    def test_multi_component_segregated(self, mesh8, tmp_path, rng):
        A, _, _ = _write_mm_system(tmp_path)
        xs = [rng.standard_normal(64) for _ in range(2)]
        for i, x in enumerate(xs):
            mmio.write_vector(tmp_path / f"b{i}.mm", A @ x)
            mmio.write_vector(tmp_path / f"x{i}.mm", x)
        import yaml
        doc = yaml.safe_load(f"""
linear_system:
  type: matrix_market
  matrix_file: "{tmp_path}/A.mm"
  num_components: 2
  segregated_solve: true
  rhs_file0: "{tmp_path}/b0.mm"
  rhs_file1: "{tmp_path}/b1.mm"
  sln_file0: "{tmp_path}/x0.mm"
  sln_file1: "{tmp_path}/x1.mm"
solver_settings:
  method: gmres
  preconditioner: none
  tolerance: 1.0e-11
  max_iterations: 500
  kspace: 30
  precision: double
""")
        cfg = parse_config(doc)
        sys_ = LinearSystem(mesh8, cfg, verbose=False)
        sys_.setup_precon_and_solver()
        sys_.load()
        sys_.solve()
        assert len(sys_.sln) == 2
        assert sys_.check_solution()

    def test_multi_component_coupled_vmap(self, mesh8, tmp_path, rng):
        A, _, _ = _write_mm_system(tmp_path)
        xs = [rng.standard_normal(64) for _ in range(2)]
        for i, x in enumerate(xs):
            mmio.write_vector(tmp_path / f"b{i}.mm", A @ x)
            mmio.write_vector(tmp_path / f"x{i}.mm", x)
        import yaml
        doc = yaml.safe_load(f"""
linear_system:
  type: matrix_market
  matrix_file: "{tmp_path}/A.mm"
  num_components: 2
  segregated_solve: false
  rhs_file0: "{tmp_path}/b0.mm"
  rhs_file1: "{tmp_path}/b1.mm"
  sln_file0: "{tmp_path}/x0.mm"
  sln_file1: "{tmp_path}/x1.mm"
solver_settings:
  method: cg
  preconditioner: none
  tolerance: 1.0e-11
  max_iterations: 500
  precision: double
""")
        cfg = parse_config(doc)
        sys_ = LinearSystem(mesh8, cfg, verbose=False)
        sys_.setup_precon_and_solver()
        sys_.load()
        sys_.solve()
        assert sys_.check_solution()

    def test_complex_mm_system(self, mesh8, tmp_path, rng):
        n = 16
        Ad = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
        Ad += 2 * n * np.eye(n)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        b = Ad @ x
        r, c = np.nonzero(Ad)
        mmio.write_matrix(tmp_path / "A.mm", r, c, Ad[r, c], (n, n))
        mmio.write_vector(tmp_path / "b.mm", b)
        mmio.write_vector(tmp_path / "x.mm", x)
        import yaml
        doc = yaml.safe_load(f"""
linear_system:
  type: matrix_market
  matrix_file: "{tmp_path}/A.mm"
  rhs_file: "{tmp_path}/b.mm"
  sln_file: "{tmp_path}/x.mm"
  complex_numbers: true
solver_settings:
  method: gmres
  preconditioner: none
  tolerance: 1.0e-12
  max_iterations: 300
  kspace: 32
  precision: double
""")
        cfg = parse_config(doc)
        sys_ = LinearSystem(mesh8, cfg, verbose=False)
        sys_.setup_precon_and_solver()
        sys_.load()
        assert sys_.A.shape == (2 * n, 2 * n)
        sys_.solve()
        assert sys_.check_solution()


class TestCheck:
    def test_pass(self):
        x = np.array([1.0, 2.0, 3.0])
        ok, nbad = check_solution(x, x + 1e-12, verbose=False)
        assert ok and nbad == 0

    def test_fail_counts(self):
        x = np.array([1.0, 2.0, 3.0])
        y = np.array([1.0, 2.5, 3.0])
        ok, nbad = check_solution(x, y, verbose=False)
        assert not ok and nbad == 1

    def test_atol_dominates_near_zero(self):
        ok, _ = check_solution(np.array([0.0]), np.array([5e-9]),
                               rtol=1e-6, atol=1e-8, verbose=False)
        assert ok


class TestTimers:
    def test_span_and_summary(self):
        t = Timers()
        with t.span("phase a"):
            pass
        with t.span("phase a"):
            pass
        with t.span("phase b"):
            pass
        assert len(t.entries) == 3
        d = t.as_dict()
        assert set(d) == {"phase a", "phase b"}
        assert "Timing summary" in t.summarize()

    def test_csv_profile(self, tmp_path):
        prof = CsvProfile()
        for _ in range(3):
            t = Timers()
            t.add("Solve", 1.5)
            t.add("Assemble system", 0.5)
            prof.append(t)
        path = tmp_path / "prof.csv"
        prof.write(str(path))
        lines = path.read_text().strip().splitlines()
        assert len(lines) == 4  # header + 3 tests
        assert "Solve" in lines[0]


class TestCLI:
    def test_cli_end_to_end(self, mesh8, tmp_path, capsys, monkeypatch):
        _write_mm_system(tmp_path)
        cfg_file = tmp_path / "run.yaml"
        cfg_file.write_text(BASE_YAML.format(
            mat=tmp_path / "A.mm", rhs=tmp_path / "b.mm",
            sln=tmp_path / "x.mm", method="gmres", precond="boomeramg")
            + f"\nsolver_settings_extra: 0\n")
        # patch make_mesh to the 8-dev mesh (CLI uses all devices by default,
        # which is what we have under the forced CPU count)
        from tpusolve.harness import cli
        rc = cli.main([str(cfg_file)])
        out = capsys.readouterr().out
        assert rc == 0
        assert "Check solution: PASSED" in out
        assert "Total time" in out

    def test_cli_usage_error(self, capsys):
        from tpusolve.harness import cli
        assert cli.main([]) == 1

    def test_cli_csv_profile(self, mesh8, tmp_path, capsys):
        _write_mm_system(tmp_path)
        cfg_file = tmp_path / "run.yaml"
        cfg_file.write_text(BASE_YAML.format(
            mat=tmp_path / "A.mm", rhs=tmp_path / "b.mm",
            sln=tmp_path / "x.mm", method="cg", precond="none")
            + f"""
solver_settings2: 0
""")
        import yaml
        doc = yaml.safe_load(cfg_file.read_text())
        doc["solver_settings"]["num_tests"] = 2
        doc["solver_settings"]["csv_profile_file"] = str(tmp_path / "p.csv")
        cfg_file.write_text(yaml.safe_dump(doc))
        from tpusolve.harness import cli
        rc = cli.main([str(cfg_file)])
        assert rc == 0
        lines = (tmp_path / "p.csv").read_text().strip().splitlines()
        assert len(lines) == 3


class TestMixedPrecision:
    def test_mixed_reaches_tight_tolerance(self, mesh8, rng):
        import yaml
        from tests.test_harness import _write_mm_system
        import tempfile, os
        # mixed precision on the stencil: f32 compute + IR to 1e-9
        doc = yaml.safe_load("""
linear_system:
  type: build_27pt_stencil
  nx: 4
  ny: 4
  nz: 4
  rtol: 1.0e-7
  atol: 1.0e-9
solver_settings:
  method: cg
  preconditioner: boomeramg
  tolerance: 1.0e-9
  max_iterations: 300
  precision: mixed
boomeramg_settings:
  strong_threshold: 0.25
  max_coarse_size: 32
""")
        from tpusolve.config import parse_config
        from tpusolve.harness.system import LinearSystem
        cfg = parse_config(doc)
        sys_ = LinearSystem(mesh8, cfg, verbose=False)
        sys_.setup_precon_and_solver()
        sys_.load()
        assert sys_.A_lo is not None and sys_.A_lo.dtype == np.float32
        assert sys_.A.dtype == np.float64
        sys_.solve()
        res = sys_.solve_results[0]
        assert bool(res.converged)
        assert float(res.relres) <= 1e-9
        assert sys_.check_solution()

    def test_print_level_history(self, mesh8, tmp_path, capsys):
        sys_, ok = _run(tmp_path, mesh8, "cg", "none")
        sys_.config.solver.print_level = 4
        sys_.verbose = True
        # re-log from stored results
        for res in sys_.solve_results:
            assert res.history is not None
            h = np.asarray(res.history)
            assert h[0] > 0          # initial residual recorded
            assert (h >= 0).sum() == int(res.iters) + 1

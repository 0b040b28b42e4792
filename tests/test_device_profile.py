"""Device-aware kernel-selection calibration (runtime.device_profile).

The reference's analog is the per-vendor exec-policy/SpMV toggles
(src/main.cpp:127-156); here the device generation keys the HBM rate used
by the assembly-time layout models, so selection stays sane off-v5e.
"""

import numpy as np
import pytest

from tpusolve import runtime
from tpusolve.kernels import bdia
from tpusolve.matrix.sharded import ShardedMatrix
from tests.test_bdia import _clustered


class TestDeviceProfile:
    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("TPUSOLVE_DEVICE_KIND", "TPU v5p")
        kind, bw = runtime.device_profile()
        assert bw == 2765.0
        monkeypatch.setenv("TPUSOLVE_DEVICE_KIND", "TPU v6 lite")
        assert runtime.hbm_gbps() == 1640.0

    def test_unknown_kind_conservative(self, monkeypatch):
        monkeypatch.setenv("TPUSOLVE_DEVICE_KIND", "TPU v99 hyper")
        assert runtime.hbm_gbps() == 819.0

    def test_model_stream_term_scales(self, monkeypatch):
        # isolate the stream term (zero out issue overheads): it must use
        # the per-device HBM rate
        monkeypatch.setenv("TPUSOLVE_OVERHEAD_SCALE", "1e-9")
        args = (4096, 16, 2048, 4)
        monkeypatch.setenv("TPUSOLVE_DEVICE_KIND", "v5e")
        t_v5e = bdia.model_time_s(*args)
        monkeypatch.setenv("TPUSOLVE_DEVICE_KIND", "v5p")
        t_v5p = bdia.model_time_s(*args)
        assert t_v5p == pytest.approx(t_v5e * 819.0 / 2765.0, rel=1e-6)

    def test_overhead_stays_clockbound(self, monkeypatch):
        # overhead-bound shape (rolled loop, tiny R): per-slot ns do NOT
        # shrink with the bandwidth ratio — v5p time equals v5e time here
        args = (64, 128, 128, 4)
        monkeypatch.setenv("TPUSOLVE_DEVICE_KIND", "v5e")
        t_v5e = bdia.model_time_s(*args)
        monkeypatch.setenv("TPUSOLVE_DEVICE_KIND", "v5p")
        assert bdia.model_time_s(*args) == pytest.approx(t_v5e, rel=1e-6)
        monkeypatch.setenv("TPUSOLVE_OVERHEAD_SCALE", "0.5")
        assert bdia.model_time_s(*args) == pytest.approx(0.5 * t_v5e,
                                                         rel=1e-6)

    def test_selection_sane_under_v5p(self, rng, mesh8, monkeypatch):
        # the clustered-band fixture must still pick BDIA over BELL with a
        # v5p profile (both models now use the same per-device HBM rate;
        # mis-ranking would only come from one side keeping v5e numbers)
        monkeypatch.setenv("TPUSOLVE_DEVICE_KIND", "TPU v5p")
        n = 160_000
        r, c, v = _clustered(rng, n)
        A = ShardedMatrix.from_coo(mesh8, (n, n), r, c, v,
                                   dtype=np.float64, allow_dia=False)
        assert A.uses_bdia

from tpusolve.formats import mmio, ij

__all__ = ["mmio", "ij"]

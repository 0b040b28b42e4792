from tpusolve.harness.system import LinearSystem

__all__ = ["LinearSystem"]

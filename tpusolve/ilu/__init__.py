from tpusolve.ilu.ilu import ilu_setup, ILUPreconditioner

__all__ = ["ilu_setup", "ILUPreconditioner"]

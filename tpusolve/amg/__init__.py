from tpusolve.amg.builder import boomeramg_setup, AMGPreconditioner

__all__ = ["boomeramg_setup", "AMGPreconditioner"]

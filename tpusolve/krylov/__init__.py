from tpusolve.krylov.common import SolveResult, as_matvec
from tpusolve.krylov.cg import pcg_setup, pcg
from tpusolve.krylov.gmres import gmres_setup, gmres, cogmres_setup, fgmres_setup
from tpusolve.krylov.bicgstab import bicgstab_setup, bicgstab

__all__ = [
    "SolveResult", "as_matvec",
    "pcg_setup", "pcg",
    "gmres_setup", "gmres", "cogmres_setup", "fgmres_setup",
    "bicgstab_setup", "bicgstab",
]

from .rootfind import batched_brent, batched_bisection, expand_brackets, RootResult
from .tridiag import thomas_solve
from .interp import hermite, linear_interp, exp_interp

__all__ = [
    "batched_brent", "batched_bisection", "expand_brackets", "RootResult",
    "thomas_solve", "hermite", "linear_interp", "exp_interp",
]

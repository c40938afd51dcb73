"""Native (C++) components and their ctypes bindings.

The reference consumes its QP/SOCP solvers as native C libraries (OSQP,
ECOS) behind Julia bindings; here the native layer is an independent C++
dense ADMM QP solver used as a foreign-codebase oracle in the test suite
(and available as a host-side fallback solver). Built on demand with g++.
"""
from .qp import NativeQPSolution, available, solve_conic, solve_qp

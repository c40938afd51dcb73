from .altro import Solution, Stats, solve
from .options import SolverOptions

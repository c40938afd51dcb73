from .altro import Solution, Stats, check_status, print_summary, solve
from .options import SolverOptions

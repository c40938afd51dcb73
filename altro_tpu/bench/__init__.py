from .harness import BenchResult, benchmark_fn, save_results, load_results

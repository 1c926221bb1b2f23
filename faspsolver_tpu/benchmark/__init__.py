from .harness import BenchResult, compute_lmvu, run_benchmark, score_problem

__all__ = ["BenchResult", "compute_lmvu", "run_benchmark", "score_problem"]

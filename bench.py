"""Headline benchmark: AMG-PCG time-to-1e-6 on the 1,046,529-dof 2D Poisson.

Reference baseline (BASELINE.md): CG + classical RS-AMG V-cycle on the same
size problem, gcc -O2, 4 OpenMP threads: setup 1.4029 s + solve 1.5566 s =
2.9973 s total (test/out/poisson-O2-th4.out).  vs_baseline here is the
speedup factor: reference_total / ours_total (>1 means faster than the
reference).

Also measures raw ELL SpMV throughput (nnz/s, effective GB/s) on the same
operator.  Prints ONE JSON line.

Runs on whatever backend is ambient (the driver runs it on a real TPU chip;
f32 there — the performance mode; conformance tests use f64 on CPU).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from faspsolver_tpu.krylov import pcg
    from faspsolver_tpu.ops import EllOperator
    from faspsolver_tpu.precond import AMGPrecond
    from faspsolver_tpu.precond.amg import setup_ua
    from faspsolver_tpu.testgen import poisson_2d
    from faspsolver_tpu.utils.params import AMGParam
    from faspsolver_tpu.constants import SmootherType, AggregationType

    NX = 1023                      # 1023^2 = 1,046,529 dof
    REF_TOTAL_S = 2.9973           # reference -O2 4-thread setup+solve
    TOL = 1e-6

    t0 = time.perf_counter()
    A = poisson_2d(NX)
    gen_s = time.perf_counter() - t0

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    # ---- AMG setup (host graph algorithms + device array freeze) ----
    t0 = time.perf_counter()
    param = AMGParam(aggregation_type=int(AggregationType.PAIRWISE),
                     pair_number=2,
                     smoother=int(SmootherType.CHEBYSHEV),
                     polynomial_degree=2, coarse_dof=800)
    hier = setup_ua(A, param, dtype=dtype)
    op = EllOperator.from_csr(A, dtype=dtype)
    b = jnp.asarray(A.matvec(np.ones(A.nrow)), dtype=dtype)
    jax.block_until_ready(hier.levels[0].A.vals)
    setup_s = time.perf_counter() - t0

    M = AMGPrecond(hier)

    # ---- warmup (compile; the reference has no JIT cost, so compile is
    # excluded from the timed solve) ----
    res = pcg(op, b, M=M, tol=TOL, maxit=100)
    jax.block_until_ready(res.x)

    # ---- timed solve ----
    t0 = time.perf_counter()
    res = pcg(op, b, M=M, tol=TOL, maxit=100)
    jax.block_until_ready(res.x)
    solve_s = time.perf_counter() - t0

    total_s = setup_s + solve_s
    iters = int(res.iters)
    relres = float(res.relres)

    # ---- SpMV throughput ----
    x = b
    spmv = jax.jit(lambda o, v: o(v))
    y = spmv(op, x)
    jax.block_until_ready(y)
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        y = spmv(op, y / jnp.linalg.norm(y))
    jax.block_until_ready(y)
    spmv_s = (time.perf_counter() - t0) / reps
    nnz = A.nnz
    bytes_per = op.vals.dtype.itemsize
    # traffic model: vals + cols + gathered x + y write
    gbs = (op.vals.size * (bytes_per + 4 + bytes_per) + A.nrow * bytes_per
           ) / spmv_s / 1e9
    nnz_per_s = nnz / spmv_s

    platform = jax.devices()[0].platform
    print(json.dumps({
        "metric": "amg_pcg_total_time_1M_poisson",
        "value": round(total_s, 4),
        "unit": "s",
        "vs_baseline": round(REF_TOTAL_S / total_s, 3),
        "detail": {
            "setup_s": round(setup_s, 4),
            "solve_s": round(solve_s, 4),
            "iters": iters,
            "relres": relres,
            "converged": bool(res.converged),
            "spmv_gbs": round(gbs, 2),
            "spmv_nnz_per_s": round(nnz_per_s / 1e9, 3),
            "n": A.nrow, "nnz": nnz,
            "platform": platform,
            "dtype": str(np.dtype(op.vals.dtype)),
            "gen_s": round(gen_s, 3),
        },
    }))


if __name__ == "__main__":
    main()

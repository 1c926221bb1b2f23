"""Multi-device scaling / parity check for the sharded structured solver.

Runs the same AMG-PCG solve on 1, 2, 4, and 8 devices of a mesh and
asserts identical iteration counts (the correctness contract of the
distribution layer), reporting per-configuration wall times.

On this dev setup only one real TPU chip exists, so run on the virtual
CPU mesh:

    python tools/scaling_check.py [n]

On a real multi-chip TPU slice the same script gives true scaling numbers
(timings there are meaningful; on the virtual CPU mesh only parity is).
"""
import os
import sys
import time

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)   # parity needs f64 depth
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faspsolver_tpu.krylov import pcg
from faspsolver_tpu.parallel import (dist_dia_operator, make_mesh,
                                     shard_hierarchy, shard_vector)
from faspsolver_tpu.precond import AMGPrecond
from faspsolver_tpu.precond.amg import setup_structured
from faspsolver_tpu.testgen import poisson_2d
from faspsolver_tpu.utils.params import AMGParam


def main(n: int = 256) -> int:
    A = poisson_2d(n)                       # n^2 dof
    b = A.matvec(np.ones(A.nrow))
    hier = setup_structured(A, AMGParam(coarse_dof=400), smooth_p=True)
    assert hier is not None

    ndev = len(jax.devices())
    results = {}
    for k in (1, 2, 4, 8):
        if k > ndev or A.nrow % k:
            continue
        mesh = make_mesh(k)
        op = dist_dia_operator(A, mesh)
        hs = shard_hierarchy(hier, mesh, min_size=n)
        bd = shard_vector(jnp.asarray(b, dtype=op.dtype), mesh)
        r = pcg(op, bd, M=AMGPrecond(hs), tol=1e-10, maxit=200)
        float(jnp.sum(r.x))                 # sync
        t0 = time.perf_counter()
        r = pcg(op, bd, M=AMGPrecond(hs), tol=1e-10, maxit=200)
        float(jnp.sum(r.x))
        dt = time.perf_counter() - t0
        results[k] = (int(r.iters), dt, bool(r.converged))
        print(f"{k} device(s): iters={int(r.iters):3d} "
              f"t={dt*1e3:8.1f} ms converged={bool(r.converged)}")

    iters = {v[0] for v in results.values()}
    ok = len(iters) == 1 and all(v[2] for v in results.values())
    print("PARITY", "OK" if ok else "FAILED", "- iteration counts:", iters)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 256))

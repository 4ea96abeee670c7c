"""Multi-controller (multi-host) dryrun: 2 OS processes, one global mesh.

The reference is single-process by construction (SURVEY.md section 2: no
tf.distribute / MPI / NCCL anywhere); a TPU *pod* is multi-controller -- one
Python process per host, each seeing only its local chips, with
``jax.distributed.initialize`` stitching them into one global device list.
This script proves that execution path FOR REAL on the CPU backend (gloo
collectives), not with mocks:

* ``init_multihost`` across 2 processes (4 virtual CPU devices each ->
  8-device global ray mesh spanning processes);
* the pod data path: each process samples only ITS rays and contributes them
  via ``shard_rays_from_local`` (``jax.make_array_from_process_local_data``)
  -- no process ever holds the global batch;
* the forward ``parallel_trace`` on the cross-process mesh;
* a full ``Optimizer(mesh=...)`` training step whose gradient psum rides the
  cross-process collective layer.

Both workers must print identical losses, and the launcher cross-checks them
against a single-process 8-device run of the same program: multi-controller
execution changes WHERE shards live, never the math.

Run:  python examples/multiprocess_dryrun.py            # launcher (spawns 2 workers)
"""

import argparse
import os
import re
import subprocess
import sys

N_LOCAL_DEV = 4
N_PROCS = 2
RAYS_PER_DEV = 8
BOUNCES = 3


def _free_port():
    """An OS-assigned free TCP port for the coordinator (a fixed port would
    collide when two dryruns run concurrently, e.g. parallel test jobs)."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _force_cpu_env(n_devices, env=None):
    """Force a CPU backend with ``n_devices`` virtual devices on ``env``
    (default: this process's os.environ).  Shared by the worker (its own
    env, before jax import) and the launcher (child envs)."""
    env = os.environ if env is None else env
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", ""))
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    return env


def worker(process_id, num_processes, coordinator):
    """Per-process program -- the exact shape of a per-host pod script."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from tensorflowraytrace_tpu import (
        FINISHED, RaySet, Scene3D, TraceConfig, TriangleSet, trace,
    )
    from tensorflowraytrace_tpu.optim import Optimizer
    from tensorflowraytrace_tpu.ops import materials as mats
    from tensorflowraytrace_tpu.parallel import sharding as par

    if num_processes > 1:
        rank = par.init_multihost(coordinator_address=coordinator,
                                  num_processes=num_processes,
                                  process_id=process_id)
        assert jax.process_count() == num_processes
    else:
        rank = 0

    n_dev = len(jax.devices())
    mesh = par.ray_mesh()
    F64 = jnp.float64

    half = 5.0
    mirror = TriangleSet.make(
        [[1.0, -half, -half], [1.0, half, half]],
        [[1.0, half, -half], [1.0, -half, half]],
        [[1.0, half, half], [1.0, -half, -half]], mat_in=1, dtype=F64)
    target = TriangleSet.make(
        [[-1.0, -half * 9, -half * 9], [-1.0, half * 9, half * 9]],
        [[-1.0, half * 9, -half * 9], [-1.0, -half * 9, half * 9]],
        [[-1.0, half * 9, half * 9], [-1.0, -half * 9, -half * 9]],
        dtype=F64)
    scene = Scene3D.build(optical=[mirror], targets=[target])
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=BOUNCES)

    # ---- pod data path: each process builds ONLY its slice of the global
    # ray batch, indexed by global ray id so the math is process-layout
    # independent
    n_global = n_dev * RAYS_PER_DEV
    n_local = n_global // num_processes
    gids = np.arange(rank * n_local, (rank + 1) * n_local)
    rng_rows = np.stack([np.sin(0.37 * gids), np.cos(0.53 * gids)], axis=1)
    starts = np.zeros((n_local, 3))
    starts[:, 1:] = rng_rows
    ends = starts + np.asarray([1.0, 0.1, 0.0])
    local_rays = RaySet.make(jnp.asarray(starts, F64), jnp.asarray(ends, F64),
                             500.0, dtype=F64)
    grays = par.shard_rays_from_local(local_rays, mesh)
    gscene = par.replicate_from_host(scene, mesh)

    res = par.parallel_trace(grays, gscene, materials, cfg, mesh)
    fwd = float(jax.jit(
        lambda r: jnp.sum(jnp.where(r.state == FINISHED,
                                    r.p1[:, 1] ** 2, 0.0)))(res.rays))

    # ---- full-pipeline data-parallel training step (one psum over gloo)
    def local_loss(params, key):
        shift = params[0]
        p0 = jax.random.uniform(key, (RAYS_PER_DEV, 3), F64, -1.0, 1.0) \
            * jnp.asarray([0.0, 1.0, 1.0], F64)
        p1 = p0 + jnp.asarray([1.0, 0.0, 0.0], F64)
        rays = RaySet.make(p0, p1 + shift, 500.0, dtype=F64)
        r = trace(rays, scene, materials, cfg)
        fin = r.rays.state == FINISHED
        return jnp.sum(jnp.where(fin, r.rays.p1[:, 1] ** 2, 0.0))

    opt = Optimizer(local_loss, [jnp.full((3,), 0.05, F64)],
                    learning_rate=0.05, momentum=0.9, grad_clip=0.5,
                    mesh=mesh, key=jax.random.PRNGKey(0))
    step_loss = opt.single_step()
    p_new = np.asarray(opt.parameters[0])

    print(f"MPDRYRUN proc {rank}/{num_processes} ndev={n_dev}: "
          f"fwd={fwd:.12f} step_loss={step_loss:.12f} "
          f"p0={p_new[0]:.12f} OK", flush=True)


def launch():
    """Spawn 2 workers + 1 single-process control; compare their numbers."""
    here = os.path.abspath(__file__)
    repo = os.path.dirname(os.path.dirname(here))

    coordinator = f"localhost:{_free_port()}"

    def run(pid, nprocs, n_dev):
        env = _force_cpu_env(n_dev, dict(os.environ))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        return subprocess.Popen(
            [sys.executable, here, "--process-id", str(pid),
             "--num-processes", str(nprocs), "--coordinator", coordinator],
            env=env, text=True, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)

    procs = [run(pid, N_PROCS, N_LOCAL_DEV) for pid in range(N_PROCS)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        sys.stdout.write(out)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}")

    control = run(0, 1, N_PROCS * N_LOCAL_DEV)
    cout = control.communicate(timeout=600)[0]
    sys.stdout.write(cout)
    if control.returncode != 0:
        raise RuntimeError(f"control failed rc={control.returncode}")

    pat = re.compile(r"fwd=([-\d.]+) step_loss=([-\d.]+) p0=([-\d.]+)")
    vals = [tuple(map(float, pat.search(o).groups())) for o in outs + [cout]]
    for got in vals[1:]:
        for a, b in zip(vals[0], got):
            assert abs(a - b) < 1e-9, (vals, "processes disagree")
    print(f"multiprocess_dryrun: {N_PROCS} processes x {N_LOCAL_DEV} devices "
          f"== single-process control (fwd={vals[0][0]:.6f}, "
          f"step_loss={vals[0][1]:.6f}) OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=N_PROCS)
    ap.add_argument("--coordinator", default=None)
    a = ap.parse_args()
    if a.process_id is None:
        launch()
    else:
        _force_cpu_env(N_LOCAL_DEV if a.num_processes > 1
                       else N_PROCS * N_LOCAL_DEV)
        worker(a.process_id, a.num_processes, a.coordinator)

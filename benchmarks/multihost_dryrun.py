"""Multi-process (multi-host) bootstrap dryrun on local CPU devices.

The reference is strictly single-process (SURVEY.md §2's parallelism
checklist); our DCN story is ``parallel.mesh.initialize_distributed`` +
GSPMD over a global mesh.  Real multi-host TPU hardware is not available
in CI, but the *bootstrap path* — coordinator rendezvous, global device
enumeration, cross-process mesh construction, collective insertion — is
exactly what multi-host runs die on, so this dryrun executes it for real:

* the parent spawns 2 child processes pointing at one coordinator port;
* each child pins the CPU backend (4 local devices), calls
  ``initialize_distributed(coordinator_address=..., num_processes=2,
  process_id=i)``, and asserts ``jax.process_count() == 2`` with 8 global
  devices;
* each child runs one sample-sharded pendulum solve over the global
  ``(1, 8)`` mesh — the softmin psum crosses the process boundary — and
  compares it against a purely process-local unsharded solve (JAX's
  partitionable threefry RNG makes the noise identical for any mesh);
* the parent checks both children agree bitwise on the result checksum.

Run:  python benchmarks/multihost_dryrun.py
Prints one summary JSON line; exits non-zero on failure.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

NUM_PROCESSES = 2
LOCAL_DEVICES = 4


def _child(process_id: int, port: int) -> None:
    # Pin the CPU backend before ANY backend-initializing call.  The
    # image's sitecustomize force-registers a TPU plugin, so the env var
    # alone is not enough (tests/conftest.py documents the same trap).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)

    from mppi_playground_tpu.parallel.mesh import (
        initialize_distributed,
        make_mesh,
    )

    # must be the first backend-touching call (parallel/mesh.py:27-52)
    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=NUM_PROCESSES,
        process_id=process_id,
    )
    assert jax.process_count() == NUM_PROCESSES, jax.process_count()
    assert jax.device_count() == NUM_PROCESSES * LOCAL_DEVICES
    assert len(jax.local_devices()) == LOCAL_DEVICES

    import jax.numpy as jnp
    import numpy as np

    from mppi_playground_tpu.core.config import MPPIConfig
    from mppi_playground_tpu.core.solver import make_solver
    from mppi_playground_tpu.models import pendulum
    from mppi_playground_tpu.parallel.sharded import make_sharded_solver

    config = MPPIConfig(
        horizon=15,
        num_samples=512,
        dim_state=2,
        dim_control=1,
        u_min=pendulum.U_MIN,
        u_max=pendulum.U_MAX,
        sigmas=(1.0,),
        lambda_="ESSPS",
        store_rollouts=False,
    )

    # global (1, 8) mesh spanning both processes: K shards over samples
    mesh = make_mesh(mesh_shape=(1, NUM_PROCESSES * LOCAL_DEVICES))
    sharded = make_sharded_solver(
        config, pendulum.dynamics, pendulum.cost, mesh, donate_state=False
    )
    x0 = jnp.asarray([np.pi, 0.0], jnp.float32)
    state = sharded.init()
    result = sharded.solve(state, x0)
    jax.block_until_ready(result.action_seq)
    action = np.asarray(result.action_seq)  # replicated -> addressable

    # process-local unsharded oracle: partitionable threefry produces the
    # same noise for any mesh, so the sharded solve must match it up to
    # f32 reduction order
    local = make_solver(config, pendulum.dynamics, pendulum.cost,
                        donate_state=False)
    expected = np.asarray(local.solve(local.init(), x0).action_seq)
    max_err = float(np.max(np.abs(action - expected)))
    assert max_err < 5e-4, f"sharded vs local mismatch: {max_err}"
    assert np.isfinite(action).all()

    print(
        json.dumps(
            {
                "process_id": process_id,
                "process_count": jax.process_count(),
                "global_devices": jax.device_count(),
                "checksum": float(np.sum(np.abs(action), dtype=np.float64)),
                "max_err_vs_local": max_err,
                "ok": True,
            }
        ),
        flush=True,
    )


def _run_once() -> tuple[bool, list]:
    with socket.socket() as s:  # pick a free coordinator port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=_REPO,
        )
        for i in range(NUM_PROCESSES)
    ]
    reports = []
    ok = True
    for i, p in enumerate(procs):
        try:
            # a local-CPU rendezvous + tiny sharded solve takes seconds;
            # 180 s is generous and keeps the worst case (2 children x 3
            # attempts sequential) inside the caller's outer budget
            # (__graft_entry__.dryrun_multihost)
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            # one hung child means the rendezvous is dead: kill the whole
            # cohort so no deadlocked grandchildren outlive this attempt
            for q in procs:
                q.kill()
            out, err = p.communicate()
            ok = False
        lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
        if p.returncode != 0 or not lines:
            ok = False
            sys.stderr.write(f"child {i} rc={p.returncode}\n{err[-2000:]}\n")
            continue
        reports.append(json.loads(lines[-1]))

    if ok and len(reports) == NUM_PROCESSES:
        ok = all(r["ok"] for r in reports) and (
            reports[0]["checksum"] == reports[1]["checksum"]
        )
    else:
        ok = False
    return ok, reports


def main() -> int:
    # bind-then-close port picking leaves a TOCTOU window in which another
    # process can claim the port before the children rendezvous; retry on
    # a fresh port instead of reporting a spurious failure
    for attempt in range(3):
        ok, reports = _run_once()
        if ok:
            break
        sys.stderr.write(f"attempt {attempt} failed; retrying\n")

    summary = json.dumps(
        {
            "check": "multihost_dryrun",
            "ok": ok,
            "num_processes": NUM_PROCESSES,
            "reports": reports,
        }
    )
    print(summary)
    # persist the artifact so every driver round leaves a diffable record
    # (committed per round as MULTIHOST_r{N}.json; see BASELINE.md)
    try:
        with open(os.path.join(_REPO, "MULTIHOST_latest.json"), "w") as f:
            f.write(summary + "\n")
    except OSError:
        pass  # read-only checkouts still get the printed line
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]), int(sys.argv[3]))
    else:
        raise SystemExit(main())

# tests/distributed_worker.py
"""Worker entry point for the 2-OS-process ``jax.distributed`` test.

Launched by ``tests/test_distributed_multiprocess.py`` (and the 2-process
leg of ``__graft_entry__.dryrun_multichip``) as::

    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
        python -m tests.distributed_worker <pid> <nproc> <port> <outdir>

Each process owns 4 virtual CPU devices; together they form the 8-device
("dp", "tp") pod mesh. The script routes EVERYTHING through
``encodermap_tpu.parallel.distributed`` — ``initialize`` (explicit
coordinator), ``global_mesh``, ``process_local_slice`` +
``host_local_batch`` (host-local shard assembly via
``jax.make_array_from_process_local_data``), the uneven-shard guard, and
``primary_only`` gating — then runs the REAL sharded ADC train step and
dumps metrics + updated params for the parent test to compare against a
single-process run. The reference framework has no multi-process story at
all (SURVEY section 2.8, designed fresh); the pod semantics being proven
here are JAX's one-process-per-host SPMD model.
"""

import pathlib
import sys


def make_adc_cvs(n_res: int = 4, F: int = 64) -> dict:
    """The deterministic toy CV set shared with tests/test_sharding.py."""
    import numpy as np

    from tests.reference_impl import backmap_np

    rng = np.random.default_rng(42)
    n_atoms = 3 * n_res
    angles = rng.uniform(1.6, 2.4, (F, n_atoms - 2)).astype(np.float32)
    dihedrals = rng.uniform(
        -np.pi, np.pi, (F, n_atoms - 3)).astype(np.float32)
    distances = rng.uniform(
        0.13, 0.155, (F, n_atoms - 1)).astype(np.float32)
    cart = backmap_np(distances, angles, dihedrals).astype(np.float32)
    return dict(
        central_angles=angles,
        central_dihedrals=dihedrals,
        central_cartesians=cart,
        central_distances=distances,
        side_dihedrals=rng.uniform(
            -np.pi, np.pi, (F, 2 * n_res)).astype(np.float32),
    )


def build_model():
    """The tiny ADC model every participant (workers + parent) builds."""
    import encodermap_tpu as em
    from encodermap_tpu.train.adc_autoencoder import (
        AngleDihedralCartesianEncoderMap,
    )

    cvs = make_adc_cvs()
    p = em.ADCParameters(
        batch_size=32, use_backbone_angles=True, use_sidechains=True,
        n_neurons=[16, 16, 2], seed=7,
        cartesian_cost_scale_soft_start=(0, 4),
    )
    emap = AngleDihedralCartesianEncoderMap(cvs, p, read_only=True)
    order = ("central_angles", "central_dihedrals", "central_cartesians",
             "central_distances", "side_dihedrals")
    batch_np = tuple(cvs[k][:32] for k in order)
    return emap, batch_np


def main(pid: int, nproc: int, port: int, outdir: str) -> None:
    """Join the pod, run one sharded ADC step, dump the results."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from encodermap_tpu.parallel import (
        global_mesh,
        host_local_batch,
        initialize,
        is_primary,
        primary_only,
        process_local_slice,
    )

    initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    emap, batch_np = build_model()
    step = emap._make_train_step()
    mesh = global_mesh(tp=1)
    assert mesh.devices.size == 4 * nproc

    # the pod data path: every process loads ONLY its own rows, then the
    # shards are assembled into one global dp-sharded jax.Array
    n_global = batch_np[0].shape[0]
    rows = process_local_slice(n_global)
    assert rows == slice(pid * (n_global // nproc),
                         (pid + 1) * (n_global // nproc))
    local = tuple(a[rows] for a in batch_np)
    batch = host_local_batch(local, mesh, P("dp"), n_global=n_global)
    assert all(b.shape[0] == n_global for b in batch)

    # the uneven-shard guard must fire across real process boundaries too
    try:
        host_local_batch(local, mesh, P("dp"), n_global=n_global + 1)
    except ValueError as e:
        assert "evenly" in str(e)
    else:
        raise AssertionError("uneven n_global did not raise")

    # params/opt_state replicate (identical on every process by seed)
    replicated = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), replicated), emap.state
    )

    with mesh:
        out_state, metrics = jax.jit(step)(state, batch)

    # fully replicate what the parent will read so np.asarray is legal
    dump = {f"metric_{k}": v for k, v in metrics.items()}
    for i, layer in enumerate(
        out_state.params["encoder"] + out_state.params["decoder"]
    ):
        dump[f"kernel_{i}"] = layer["kernel"]
    dump = jax.jit(lambda t: t, out_shardings=replicated)(dump)
    dump = {k: np.asarray(v) for k, v in dump.items()}

    out = pathlib.Path(outdir)
    np.savez(out / f"worker_{pid}.npz", **dump)

    # primary_only gating under real process boundaries
    @primary_only
    def write_marker():
        (out / "primary_marker.txt").write_text(f"written by {pid}")
        return pid

    got = write_marker()
    assert (got == 0) == is_primary()
    print(f"worker {pid}/{nproc} OK", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

# tests/test_distributed_multiprocess.py
"""The pod path with REAL process boundaries.

Every ``MULTICHIP`` claim routes through
``encodermap_tpu/parallel/distributed.py``; until now it had only run as a
single-process no-op. Here two OS processes (4 virtual CPU devices each)
join one ``jax.distributed`` runtime through a localhost coordinator and
run the sharded ADC train step through ``initialize`` / ``global_mesh`` /
``process_local_slice`` / ``host_local_batch``, asserting metrics and
updated params match a single-process run of the same step — plus
``primary_only`` gating and the uneven-shard guard across actual process
boundaries. (The reference is strictly single-process; this validates OUR
pod design, SURVEY section 2.8.)
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch_workers(outdir: Path, nproc: int = 2, timeout: int = 900):
    """Start the worker pair and wait; returns per-process stdout."""
    port = _free_port()
    env = dict(os.environ)
    env.update(
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=str(REPO / ".jax_cache"),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.distributed_worker",
             str(i), str(nproc), str(port), str(outdir)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for i, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        outs.append(out)
        assert proc.returncode == 0, f"worker {i} failed:\n{out}"
    return outs


@pytest.mark.slow
class TestTwoProcessPod:
    @pytest.fixture(scope="class")
    def worker_runs(self, tmp_path_factory):
        outdir = tmp_path_factory.mktemp("pod")
        outs = launch_workers(outdir)
        return outdir, outs

    def test_workers_complete_and_agree(self, worker_runs):
        outdir, outs = worker_runs
        for i, out in enumerate(outs):
            assert f"worker {i}/2 OK" in out, out
        a = np.load(outdir / "worker_0.npz")
        b = np.load(outdir / "worker_1.npz")
        assert set(a.files) == set(b.files)
        # replicated outputs must be IDENTICAL on both processes
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_matches_single_process_step(self, worker_runs):
        """The 2-process sharded step reproduces the single-process loss
        and updated params (GSPMD + gloo only change layout/transport)."""
        import jax

        from tests.distributed_worker import build_model

        outdir, _ = worker_runs
        got = np.load(outdir / "worker_0.npz")

        emap, batch_np = build_model()
        step = emap._make_train_step()
        import jax.numpy as jnp

        batch = tuple(jnp.asarray(a) for a in batch_np)
        ref_state, ref_metrics = jax.jit(step)(emap.state, batch)

        for k, v in ref_metrics.items():
            assert float(got[f"metric_{k}"]) == pytest.approx(
                float(v), rel=1e-5, abs=1e-7
            ), k
        kernels = [
            layer["kernel"]
            for layer in ref_state.params["encoder"]
            + ref_state.params["decoder"]
        ]
        for i, ref_k in enumerate(kernels):
            np.testing.assert_allclose(
                got[f"kernel_{i}"], np.asarray(ref_k), atol=1e-5,
                err_msg=f"kernel_{i}",
            )

    def test_primary_only_gating_across_processes(self, worker_runs):
        outdir, _ = worker_runs
        marker = outdir / "primary_marker.txt"
        assert marker.exists()
        assert marker.read_text() == "written by 0"

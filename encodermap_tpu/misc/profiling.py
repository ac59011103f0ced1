# encodermap_tpu/misc/profiling.py
"""Profiling/tracing utilities.

The reference only has a TF1-era Chrome-trace profiler
(``/root/reference/encodermap/encodermap_tf1/autoencoder.py:410-422``). The
TPU-native equivalents: ``jax.profiler`` traces viewable in
TensorBoard/Perfetto, plus a blocking timer for quick throughput numbers.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional, Union

import jax

__all__ = ["trace", "block_timer", "profile_steps"]


@contextlib.contextmanager
def trace(logdir: Union[str, Path]) -> Iterator[None]:
    """Context manager: capture a jax profiler trace into ``logdir``.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def block_timer(name: str = "block", sync: Optional[object] = None
                ) -> Iterator[dict]:
    """Wall-clock a block; ``out['seconds']`` afterwards.

    Syncs via a HOST READ of ``sync``'s leaves — on the remote (axon) TPU
    platform ``jax.block_until_ready`` returns early, so a host read is
    the only reliable device sync (the same rule bench.py follows)."""
    import numpy as _np

    out: dict = {"name": name}
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        if sync is not None:
            for leaf in jax.tree_util.tree_leaves(sync):
                _np.asarray(leaf)
        out["seconds"] = time.perf_counter() - t0
        print(f"{name}: {out['seconds']*1000:.2f} ms")


def profile_steps(
    autoencoder, n_steps: int = 5, logdir: Union[str, Path] = "profile"
) -> str:
    """Run a few training chunks under the profiler — the analog of the TF1
    engine's ``Autoencoder.profile()``."""
    import numpy as np

    trainer = autoencoder._get_trainer()
    data = autoencoder._device_data()
    state = autoencoder.state
    try:
        # warmup/compile outside the trace
        state, metrics = trainer(state, data)
        float(np.asarray(metrics["loss"])[-1])
        with trace(logdir):
            for _ in range(n_steps):
                state, metrics = trainer(state, data)
            float(np.asarray(metrics["loss"])[-1])
    finally:
        # the trainer may donate its input state's buffers; always hand the
        # newest state back so the model never holds deleted buffers, even
        # when trace() or a chunk raises
        autoencoder.state = state
    return str(logdir)

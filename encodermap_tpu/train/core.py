# encodermap_tpu/train/core.py
"""The jitted training core: TrainState, optimizer, scan-chunked train loop.

TPU-first design decisions (vs the reference's Keras ``model.fit(epochs=n,
steps_per_epoch=1)`` loop, ``/root/reference/encodermap/autoencoder/
autoencoder.py:967-1029``):

* The *whole* step — forward, all losses, backward, Adam update — is one XLA
  computation (the reference's per-step Python dispatch would cap throughput
  at host speed).
* ``steps_per_scan`` optimizer steps run inside one ``jax.lax.scan`` per host
  call, with batches sampled *on device* from the device-resident dataset.
  One host→device sync per chunk instead of per step: this is what makes
  >1e5 samples/sec possible for a small MLP at batch 256.
* The global step and the RNG live in the (checkpointed) TrainState, so the
  soft-start cartesian schedule and batch sampling reproduce exactly across
  save/restore (the reference keeps the step in ``parameters.json`` for the
  same reason).
* Optimizer matches the reference: Adam with per-element gradient clipping to
  [-1, 1] (Keras ``clipvalue=1.0``, ``autoencoder.py:741``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = [
    "PrefetchSource",
    "TrainState",
    "make_optimizer",
    "make_scan_trainer",
]

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    """Everything that evolves during training, as one checkpointable pytree."""

    params: Any
    opt_state: Any
    step: Array  # int32 scalar, global optimizer step
    rng: Array  # jax PRNG key

    @classmethod
    def create(cls, params: Any, optimizer: optax.GradientTransformation,
               rng: Array, step: int = 0) -> "TrainState":
        return cls(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.asarray(step, jnp.int32),
            rng=rng,
        )


def make_optimizer(learning_rate, clip_value: float = 1.0
                   ) -> optax.GradientTransformation:
    """Adam with element-wise gradient clipping, matching the reference's
    ``Adam(lr, clipvalue=1.0)``. Keras Adam defaults to ``epsilon=1e-7``
    (optax's default is 1e-8) — matched explicitly so update trajectories
    agree with the reference where ``sqrt(v_hat)`` is small.

    ``learning_rate`` may be a float or an optax schedule (a callable
    ``step -> lr``) — the TPU-native equivalent of the reference's keras
    ``LearningRateScheduler`` callback (its customization tutorial 04):
    the schedule evaluates INSIDE the jitted step, so it works unchanged
    within ``lax.scan`` chunks."""
    return optax.chain(
        optax.clip(clip_value),
        optax.adam(learning_rate, eps=1e-7),
    )


def make_scan_trainer(
    train_step: Callable[[TrainState, Any], tuple[TrainState, dict]],
    batch_size: int,
    steps_per_scan: int,
    donate: bool = True,
    full_batch: bool = False,
) -> Callable[[TrainState, Any], tuple[TrainState, dict]]:
    """Wrap a single-step function into a jitted multi-step scan.

    Args:
        train_step: ``(state, batch) -> (state, metrics_dict)``; must be pure.
        batch_size: per-step batch size.
        steps_per_scan: optimizer steps per host call.
        donate: donate the input state buffers (halves HBM traffic).
        full_batch: train every step on the ENTIRE dataset instead of
            sampling ``batch_size`` rows — the reference's
            ``Parameters(batched=False)`` mode
            (``autoencoder/autoencoder.py:1001-1004``).

    Returns:
        A jitted ``(state, data) -> (state, metrics)`` where each metrics leaf
        is stacked along a leading ``steps_per_scan`` axis.
    """

    def chunk(state: TrainState, data: Any) -> tuple[TrainState, dict]:
        if full_batch:
            def body_full(st: TrainState, _):
                st, metrics = train_step(st, data)
                return st, metrics

            return jax.lax.scan(
                body_full, state, None, length=steps_per_scan
            )

        n = (data[0] if isinstance(data, (tuple, list)) else data).shape[0]

        # One RNG call for the whole chunk: generating per-step indices
        # inside the scan costs ~28 us/step in threefry hashing (measured on
        # v5e — 75% of the step!); one (steps, batch) draw amortizes it.
        rng, sub = jax.random.split(state.rng)
        idx = jax.random.randint(sub, (steps_per_scan, batch_size), 0, n)

        def body(st: TrainState, ix):
            if isinstance(data, (tuple, list)):
                batch = tuple(jnp.take(d, ix, axis=0) for d in data)
            else:
                batch = jnp.take(data, ix, axis=0)
            st, metrics = train_step(st, batch)
            return st, metrics

        return jax.lax.scan(body, state.replace(rng=rng), idx)

    return jax.jit(chunk, donate_argnums=(0,) if donate else ())


def make_streaming_trainer(
    train_step: Callable[[TrainState, Any], tuple[TrainState, dict]],
) -> Callable[[TrainState, Any], tuple[TrainState, dict]]:
    """Scan trainer consuming a pre-sampled host superbatch; the scan
    length is the superbatch's leading axis, set by the source.

    For datasets too large for device memory: the host (or an HDF5-backed
    source) samples ``steps_per_scan`` batches, uploads them as one
    ``(steps_per_scan, batch, ...)`` stack, and the jitted scan consumes one
    slice per optimizer step — one host->device transfer per chunk, so the
    transfer overlaps the previous chunk's compute under async dispatch.
    Replaces the reference's HDF5-generator ``tf.data`` streaming
    (``trajinfo/info_all.py:3080-3154``).
    """

    def chunk(state: TrainState, superbatch: Any) -> tuple[TrainState, dict]:
        def body(st: TrainState, batch):
            st, metrics = train_step(st, batch)
            return st, metrics

        return jax.lax.scan(body, state, superbatch)

    return jax.jit(chunk, donate_argnums=(0,))


class HDF5BatchSource:
    """Random-batch sampler reading CVs straight from an HDF5 file — the
    out-of-core path for million-frame ensembles (the reference streams the
    same way through an HDF5-generator ``tf.data`` pipeline,
    ``trajinfo/info_all.py:2870-3078``).

    Sampling is slab-based, matching the reference's contiguous-read
    design: per superbatch ``n_windows`` contiguous random windows
    totalling ``slab_frames`` rows are read per CV (at most two h5py
    reads each, for wrap-around), shuffled resident in RAM, and the
    ``steps_per_scan x batch`` samples are carved from them with numpy
    fancy-indexing. Per-sample scattered h5py gathers (the previous
    design) cost ~1000 seeks per chunk and capped streaming at ~180k
    samples/s; a handful of sequential window reads keeps the I/O
    pattern while successive superbatches draw new random windows, so
    training covers the whole file.

    ``n_windows`` exists because a SINGLE window correlates batches on
    time-ordered trajectories: every batch of a superbatch then comes
    from one contiguous stretch of simulation time. Measured on a
    worst-case smooth feature-space walk (8192 frames, slab 1/16 of the
    file), single-window training converged to a 9x worse full-data
    loss than uniform in-memory sampling; 8 windows recovers uniform
    quality within noise while keeping >95% of the single-window read
    throughput (``scripts/slab_stats_experiment.py``, numbers in
    BASELINE.md). The default is therefore 8 (capped so each window
    still holds at least one batch); pass ``n_windows=1`` to reproduce
    the pure single-slab read pattern.

    When the file (or slab) holds fewer rows than a batch needs, samples
    repeat (with-replacement semantics) instead of raising — the
    reference's ``replace`` flag behavior (``info_all.py:2870-2960``).

    Two on-disk layouts are supported:

    * flat: one group (default ``"CVs"``) holding one dataset per CV name;
    * ensemble: the layout :meth:`TrajEnsemble.save` writes — ``traj_N/CVs/
      <name>`` per member trajectory. The per-traj datasets are virtually
      concatenated along the frame axis (they must be width-aligned, which
      ``load_CVs(..., ensemble=True)`` guarantees).

    Yields tuples of ``(steps_per_scan, batch, ...)`` numpy stacks suitable
    for :func:`make_streaming_trainer`.
    """

    def __init__(self, path: str, cv_names, batch_size: int,
                 steps_per_scan: int, group: str = "CVs",
                 seed: Optional[int] = 0,
                 slab_frames: Optional[int] = None,
                 replace: bool = True,
                 skip_all_nan: bool = False,
                 n_windows: int = 8) -> None:
        """``seed=None`` draws OS entropy (non-reproducible streams).
        ``replace=False`` keeps samples unique within each batch (raising
        when a slab holds fewer valid rows than a batch, mirroring the
        reference's unique-index guard). ``skip_all_nan=True`` drops slab
        rows that are all-NaN for any CV (ragged NaN-aligned ensembles) —
        the training paths keep the default False because the models'
        sparse mode consumes NaN rows directly. ``n_windows`` splits each
        superbatch's slab into that many independent contiguous windows
        (see the class docstring for the statistics)."""
        import h5py
        import numpy as np

        self.path = str(path)
        self.cv_names = list(cv_names)
        self.batch_size = batch_size
        self.steps_per_scan = steps_per_scan
        self.group = group
        self.slab_frames = slab_frames
        self._h5 = h5py.File(path, "r")
        try:
            flat = bool(group) and group in self._h5
            if flat:
                # the explicitly-requested flat group wins — and is
                # resolved BEFORE scanning traj_* names, so an unrelated
                # top-level item like 'traj_joined' or a traj_0 DATASET
                # can't crash the scan below
                traj_groups: list = []
            else:
                def _is_member(k: str) -> bool:
                    if not k.startswith("traj_"):
                        return False
                    try:
                        int(k.split("_")[1])
                    except (IndexError, ValueError):
                        return False  # e.g. 'traj_joined'
                    node = self._h5[k]
                    return isinstance(node, h5py.Group) and "CVs" in node

                traj_groups = sorted(
                    (k for k in self._h5 if _is_member(k)),
                    key=lambda k: int(k.split("_")[1]),
                )
            if flat:
                self._dset_groups = [
                    [self._h5[group][n] for n in self.cv_names]
                ]
            elif traj_groups:
                self._dset_groups = [
                    [self._h5[f"{k}/CVs"][n] for n in self.cv_names]
                    for k in traj_groups
                ]
            else:
                if all(n in self._h5 for n in self.cv_names):
                    # flat file with top-level datasets (the group kwarg
                    # default "CVs" must not hide them behind a KeyError)
                    g = self._h5
                else:
                    raise KeyError(
                        f"{path} has no {group!r} group, no traj_* member "
                        f"groups, and its top level lacks {self.cv_names}"
                    )
                self._dset_groups = [[g[n] for n in self.cv_names]]
            if not self._dset_groups or not self._dset_groups[0]:
                raise KeyError(
                    f"no CV datasets found in {path} for {self.cv_names}"
                )
            lengths = [dsets[0].shape[0] for dsets in self._dset_groups]
        except Exception:
            # don't leak the open handle on ANY init failure (absent CVs,
            # oddly-named traj_* groups, empty cv_names, ...)
            self._h5.close()
            raise
        self._offsets = np.concatenate([[0], np.cumsum(lengths)])
        self.n_frames = int(self._offsets[-1])
        self._rng = np.random.default_rng(seed)
        self.replace = replace
        self.skip_all_nan = skip_all_nan
        self.n_windows = n_windows

    def __iter__(self):
        return self

    def _read_contiguous(self, k: int, start: int, length: int):
        """Rows ``[start, start + length)`` of CV #k across the
        virtually-concatenated groups — pure sequential h5py reads."""
        import numpy as np

        parts = []
        for gi, dsets in enumerate(self._dset_groups):
            lo, hi = self._offsets[gi], self._offsets[gi + 1]
            s, e = max(start, lo), min(start + length, hi)
            if s < e:
                parts.append(dsets[k][s - lo : e - lo])
        return parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)

    def _read_slab(self, k: int, start: int, length: int):
        """Contiguous slab with wrap-around at the end of the file."""
        import numpy as np

        if start + length <= self.n_frames:
            return self._read_contiguous(k, start, length)
        head = self._read_contiguous(k, start, self.n_frames - start)
        tail = self._read_contiguous(k, 0, length - (self.n_frames - start))
        return np.concatenate([head, tail], axis=0)

    def __next__(self):
        import numpy as np

        total = self.steps_per_scan * self.batch_size
        S = self.slab_frames if self.slab_frames else total
        S = max(1, min(S, self.n_frames))
        kw = max(1, int(self.n_windows))
        if S >= self.n_frames:
            kw = 1  # the slab already covers the whole file
        # each window should still hold at least one batch worth of rows
        kw = min(kw, max(1, S // self.batch_size))
        w = -(-S // kw)
        n_rows = kw * w
        for _ in range(8):
            starts = self._rng.integers(0, self.n_frames, size=kw)
            slabs = [
                np.concatenate(
                    [self._read_slab(c, int(s), w) for s in starts], axis=0
                ) if kw > 1 else self._read_slab(c, int(starts[0]), w)
                for c in range(len(self.cv_names))
            ]
            # global frame number of each slab row, for frame identity
            # (yield_index) and cross-window dedup
            global_rows = np.concatenate(
                [(int(s) + np.arange(w)) % self.n_frames for s in starts]
            )
            if self.skip_all_nan:
                valid = np.ones(n_rows, bool)
                for s in slabs:
                    if s.dtype.kind == "f":
                        valid &= ~np.all(
                            np.isnan(s.reshape(n_rows, -1)), axis=1
                        )
                rows = np.where(valid)[0]
            else:
                rows = np.arange(n_rows)
            if not self.replace and len(rows):
                # windows may overlap: keep one slab row per distinct frame
                # so unique-within-batch means unique FRAMES, not just rows
                _, first = np.unique(global_rows[rows], return_index=True)
                rows = rows[np.sort(first)]
            if len(rows):
                break
        else:
            raise ValueError(
                "no valid (non-all-NaN) rows found in 8 random slabs"
            )
        n_valid, B = len(rows), self.batch_size
        if not self.replace and n_valid < B:
            raise Exception(
                f"Can't find {B} unique indices among {n_valid} valid "
                f"frames in the slab. Pass replace=True."
            )
        if self.replace:
            # shuffled resident rows; repeats only when the slab holds
            # fewer valid rows than the superbatch consumes
            reps = -(-total // n_valid)
            idx_rows = np.concatenate(
                [self._rng.permutation(n_valid) for _ in range(reps)]
            )[:total]
        else:
            # duplicate-free batches: carve batch-sized chunks from
            # permutations WITHOUT crossing permutation boundaries (a
            # chunk straddling two permutations could repeat a row)
            per_perm = n_valid // B
            n_perm = -(-self.steps_per_scan // per_perm)
            idx_rows = np.concatenate(
                [
                    self._rng.permutation(n_valid)[: per_perm * B]
                    for _ in range(n_perm)
                ]
            )[:total]
        idx = rows[idx_rows].reshape(self.steps_per_scan, B)
        # global row numbers of the sampled frames, for consumers that
        # need frame identity (TrajEnsemble.batch_iterator yield_index)
        self.last_indices = global_rows[idx]
        return tuple(slab[idx] for slab in slabs)

    def read_prototype(self, n: int = 4):
        """First ``n`` frames of *every* member group, concatenated — a
        small deterministic sample that sees each topology (so NaN-aligned
        ensemble columns are visible for sparse-mode detection)."""
        import numpy as np

        out = []
        for k in range(len(self.cv_names)):
            parts = [
                dsets[k][: min(n, dsets[k].shape[0])]
                for dsets in self._dset_groups
            ]
            out.append(np.concatenate(parts, axis=0).astype(np.float32))
        return tuple(out)

    def close(self):
        self._h5.close()


class PrefetchSource:
    """Wrap a batch source with a background thread + bounded queue so host
    batch assembly (HDF5 reads, stacking) overlaps device compute — the
    TPU-side analog of the reference's ``tf.data ... .prefetch()`` input
    pipeline (``trajinfo/info_all.py:3080-3154``). h5py/numpy reads release
    the GIL, so a plain thread achieves real overlap.
    """

    def __init__(self, source, depth: int = 2) -> None:
        import queue
        import threading

        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._err: list = []
        self._stop = threading.Event()

        def put_with_stop(item) -> bool:
            """Blocking put that gives up when close() was requested."""
            while not self._stop.is_set():
                try:
                    self._queue.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in source:
                    if not put_with_stop(item):
                        return
            except Exception as e:  # propagate to the consumer
                self._err.append(e)
            finally:
                put_with_stop(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the worker and wait for it to fully exit.

        Must NOT return while the worker is mid-read: callers that own the
        underlying source (e.g. an HDF5 file) close it right after, and
        h5py is not safe against a concurrent close. The worker can finish
        its current item (it never blocks on put once the stop event is
        set), so joining to completion terminates promptly."""
        self._stop.set()
        while self._thread.is_alive():
            # drain so a blocked put can finish
            try:
                while True:
                    self._queue.get_nowait()
            except Exception:
                pass
            self._thread.join(timeout=0.2)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._sentinel:
            if self._err:
                raise self._err[0]
            raise StopIteration
        return item


def _upload_stage(source, put, n_steps: int):
    """Yield ``(n_optimizer_steps, device_superbatch)`` pairs, trimming the
    final chunk so training never runs past ``n_steps`` (the in-memory
    train() loop makes the same guarantee — otherwise ``state.step`` and
    soft-start schedules would overshoot the reported history). Runs the
    ``put`` uploads itself so a :class:`PrefetchSource` wrapped around this
    generator moves them off the consumer thread."""
    done = 0
    for superbatch in source:
        remaining = n_steps - done
        if remaining <= 0:
            return
        if isinstance(superbatch, tuple) and len(superbatch) == 1:
            # HDF5BatchSource always yields tuples; the plain-EncoderMap
            # train step takes a bare array — unwrap so the documented
            # EncoderMap(...).train_streaming(HDF5BatchSource(...)) call
            # works without a hand-written adapter
            superbatch = superbatch[0]
        if isinstance(superbatch, tuple):
            if superbatch[0].shape[0] > remaining:
                superbatch = tuple(x[:remaining] for x in superbatch)
            dev = tuple(put(x) for x in superbatch)
            n = int(superbatch[0].shape[0])
        else:
            if superbatch.shape[0] > remaining:
                superbatch = superbatch[:remaining]
            dev = put(superbatch)
            n = int(superbatch.shape[0])
        done += n
        yield n, dev


def run_streaming(autoencoder, source, n_steps: int, sharding=None,
                  prefetch: int = 2) -> dict:
    """Drive a streaming training loop for an autoencoder-like object
    (needs ._make_train_step(), .state, .p). Returns the metric history.

    ``source`` yields superbatches: a tuple of ``(steps_per_scan, batch,
    ...)`` arrays (or a single array for plain EncoderMap data).

    ``sharding``: optional ``NamedSharding`` applied to each uploaded
    superbatch (e.g. ``P(None, "dp")`` to shard the batch axis over a mesh)
    — the BASELINE config-5 combination of out-of-core streaming with
    data-parallel training.

    ``prefetch``: depth of the background host-side prefetch queue (0
    disables; 2 double-buffers batch assembly against device compute).
    """
    import numpy as np

    def put(x):
        if sharding is not None:
            return jax.device_put(jnp.asarray(x), sharding)
        return jnp.asarray(x)

    trainer = make_streaming_trainer(autoencoder._make_train_step())
    # callbacks + per-step metric writing run here exactly like the
    # in-memory train() loop (train/autoencoder.py) — streaming training
    # must not silently lose NaNInterrupt / CheckpointSaver / ImageCallback
    # / progress reporting. The same step-labeling contract holds:
    # JSONL rows are first_step + i + 1.
    cbs = (autoencoder._setup_callbacks()
           if hasattr(autoencoder, "_setup_callbacks") else [])
    read_only = getattr(autoencoder, "read_only", True)
    if not read_only:
        from ..misc.summaries import MetricsWriter

        if getattr(autoencoder, "_metrics_writer", None) is not None:
            autoencoder._metrics_writer.close()
        autoencoder._metrics_writer = MetricsWriter(
            autoencoder.p.main_path,
            tensorboard=getattr(autoencoder.p, "tensorboard", False),
        )
    for cb in cbs:
        cb.on_train_begin(autoencoder)
    autoencoder._streaming_nan_stop = False
    if prefetch:
        source = PrefetchSource(source, depth=prefetch)
    # Second pipeline stage: chunk k+1's host->device transfer runs in a
    # background thread while chunk k computes. On bandwidth-limited links
    # (the dev tunnel: ~35 MB/s) the transfer dominates the chunk, so
    # overlapping it is worth ~2.3x end-to-end (measured 0.7M -> 1.65M
    # samples/s at batch 256 x 1000-step chunks).
    uploads = _upload_stage(source, put, n_steps)
    stream = PrefetchSource(uploads, depth=1) if prefetch else uploads
    history: dict[str, list] = {}
    done = 0
    stop = False
    # ONE host read before the loop; per-chunk step labels advance by the
    # chunk sizes. Reading state.step inside the loop would sync the host
    # with the device every chunk and break the upload/compute overlap
    # this pipeline exists for.
    step0 = int(autoencoder.state.step)
    try:
        for n, dev in stream:
            first_step = step0 + done
            autoencoder.state, metrics = trainer(autoencoder.state, dev)
            metrics = jax.device_get(metrics)
            for k, v in metrics.items():
                history.setdefault(k, []).append(v)
            writer = getattr(autoencoder, "_metrics_writer", None)
            if writer is not None:
                stride = max(1, getattr(autoencoder.p, "summary_step", 1))
                for i in range(n):
                    step_i = first_step + i + 1
                    if step_i % stride == 0:
                        writer.write_scalars(
                            step_i, {k: v[i] for k, v in metrics.items()}
                        )
            for cb in cbs:
                if cb.on_chunk_end(first_step, metrics) is False:
                    stop = True
                    # same contract as train(): a NaN abort must not reach
                    # CheckpointSaver with the diverged parameters
                    # (isinstance, not the class NAME — a user's
                    # NaNInterrupt subclass must keep the protection)
                    from .callbacks import NaNInterrupt

                    autoencoder._streaming_nan_stop = isinstance(
                        cb, NaNInterrupt
                    )
                    break
            done += n
            if stop or done >= n_steps:
                break
    finally:
        for cb in cbs:
            cb.on_train_end(autoencoder)
        writer = getattr(autoencoder, "_metrics_writer", None)
        if writer is not None:
            writer.close()
            autoencoder._metrics_writer = None
        if isinstance(stream, PrefetchSource):
            stream.close()
        if isinstance(source, PrefetchSource):
            source.close()
    # host bookkeeping: metrics were device_get above, so concatenate on
    # the host (jnp here would round-trip every metric through the device
    # — a remote dispatch per key on the axon platform)
    return {
        k: np.concatenate([np.asarray(x) for x in v])[:n_steps]
        for k, v in history.items()
    }

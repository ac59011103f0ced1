# encodermap_tpu/misc/saving.py
"""Checkpointing: pytree <-> npz files, plus parameters.json sidecar.

Functional replacement for the reference's Keras ``.keras`` checkpoints
(``/root/reference/encodermap/misc/saving_loading_models.py:201-628``):
a checkpoint directory contains

* ``saved_model_{step}.npz``  — flattened model params (path-keyed arrays)
* ``saved_model_{step}.opt.npz`` — optimizer state (optional but written by
  default so resume continues Adam moments exactly)
* ``parameters.json``         — the Parameters sidecar with
  ``current_training_step`` updated, mirroring the reference's resume logic.

No pickle anywhere: keys are JSON-encoded pytree paths, values are arrays.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Optional, Union

import jax
import numpy as np

__all__ = [
    "save_pytree",
    "load_pytree",
    "save_checkpoint",
    "latest_checkpoint",
    "load_checkpoint",
    "load_checkpoint_rng",
    "save_model",
    "load_model",
]


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = json.dumps([_path_elem(p) for p in path])
        flat[key] = np.asarray(leaf)
    return flat


def _path_elem(p: Any):
    if isinstance(p, jax.tree_util.DictKey):
        return ["d", p.key]
    if isinstance(p, jax.tree_util.SequenceKey):
        return ["s", p.idx]
    if isinstance(p, jax.tree_util.GetAttrKey):
        return ["a", p.name]
    return ["r", repr(p)]


def save_pytree(tree: Any, path: Union[str, Path]) -> str:
    """Save an arbitrary (dict/list/array) pytree to one .npz file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **_flatten(tree))
    return str(path)


def load_pytree(path: Union[str, Path]) -> Any:
    """Rebuild the nested dict/list structure from a .npz written by
    :func:`save_pytree`."""
    data = np.load(path, allow_pickle=False)
    root: Any = None

    def ensure(container, elem, nxt_container):
        kind, key = elem
        if kind == "d" or kind == "a":
            if key not in container:
                container[key] = nxt_container
            return container[key]
        if kind == "s":
            while len(container) <= key:
                container.append(None)
            if container[key] is None:
                container[key] = nxt_container
            return container[key]
        raise ValueError(f"unsupported path element {elem}")

    entries = []
    for key in data.files:
        path_elems = json.loads(key)
        entries.append((path_elems, data[key]))

    def make_container(elem):
        kind, _ = elem
        return [] if kind == "s" else {}

    if not entries:
        return {}
    root = make_container(entries[0][0][0]) if entries[0][0] else None
    for path_elems, value in entries:
        if not path_elems:
            return value
        node = root
        for i, elem in enumerate(path_elems[:-1]):
            node = ensure(node, elem, make_container(path_elems[i + 1]))
        kind, key = path_elems[-1]
        if kind == "s":
            while len(node) <= key:
                node.append(None)
            node[key] = value
        else:
            node[key] = value
    return root


def save_checkpoint(
    main_path: Union[str, Path],
    params: Any,
    step: int,
    opt_state: Any = None,
    parameters: Any = None,
    prefix: str = "saved_model",
    rng: Any = None,
) -> str:
    """Write ``{prefix}_{step}.npz`` (+ ``.opt.npz``, ``.rng.npy``) and
    refresh ``parameters.json`` with the current step.

    ``rng`` (the TrainState PRNG key) makes resumed training reproduce an
    uninterrupted run *exactly* — on-device batch sampling continues the
    same key chain."""
    main_path = Path(main_path)
    main_path.mkdir(parents=True, exist_ok=True)
    ckpt = main_path / f"{prefix}_{step}.npz"
    save_pytree(params, ckpt)
    if opt_state is not None:
        save_pytree(opt_state, main_path / f"{prefix}_{step}.opt.npz")
    if rng is not None:
        np.save(main_path / f"{prefix}_{step}.rng.npy", np.asarray(rng))
    if parameters is not None:
        parameters.current_training_step = int(step)
        # backup=False: a periodic checkpoint only bumps
        # current_training_step — one _back_ file per checkpoint would be
        # clutter (the reference writes no parameters.json here at all)
        parameters.save(main_path / "parameters.json", backup=False)
    return str(ckpt)


def latest_checkpoint(
    main_path: Union[str, Path], prefix: str = "saved_model"
) -> Optional[tuple[str, int]]:
    """Find the newest checkpoint by step number, like the reference's
    ``load_model`` checkpoint sorting (``saving_loading_models.py:333-430``)."""
    main_path = Path(main_path)
    best = None
    pattern = re.compile(rf"{re.escape(prefix)}_(\d+)\.npz$")
    for f in main_path.glob(f"{prefix}_*.npz"):
        m = pattern.match(f.name)
        if m:
            step = int(m.group(1))
            if best is None or step > best[1]:
                best = (str(f), step)
    return best


def _sibling(path: Path, suffix: str) -> "Optional[Path]":
    """The ``.opt.npz``/``.rng.npy`` sibling of a checkpoint file.

    Derived ONLY for real ``*.npz`` checkpoints — blindly chopping 4
    characters off an arbitrary filename ("best_model", "x.npz.bak")
    would produce a garbage path whose non-existence silently skips
    optimizer/RNG restore. For non-.npz names we warn once so the user
    knows the sidecars were not looked up."""
    if path.suffix == ".npz" and not str(path).endswith(suffix):
        return Path(str(path)[: -len(".npz")] + suffix)
    import warnings

    warnings.warn(
        f"checkpoint {path.name!r} does not end in '.npz'; its "
        f"'{suffix}' sidecar (optimizer state / PRNG key) cannot be "
        f"derived and will not be restored. Keep the saved_model_N.npz "
        f"naming to resume exactly.",
        stacklevel=3,
    )
    return None


def load_checkpoint(
    path: Union[str, Path], prefix: str = "saved_model",
    n_encoder: Optional[int] = None,
) -> tuple[Any, Optional[Any], int]:
    """Load ``(params, opt_npz_path_or_None, step)`` from a checkpoint file
    or the newest checkpoint in a directory.

    The second element is the PATH of the sibling ``.opt.npz`` file (or
    None) — NOT a reconstructed optimizer state: optax states are
    NamedTuple trees whose node types cannot be rebuilt from the file
    alone. Feed it to :func:`load_pytree_into` with a freshly-initialized
    state as the template (``train/autoencoder.py`` does exactly that).
    See :func:`load_checkpoint_rng` for the stored PRNG key."""
    path = Path(path)
    if path.suffix == ".keras":
        # a reference-format checkpoint given explicitly. n_encoder (the
        # caller's known encoder-stack depth, len(p.n_neurons)) lets
        # files whose Dense layers are NOT named Encoder_i/Decoder_i
        # split positionally instead of erroring.
        from .keras_import import import_keras_checkpoint

        params, step = import_keras_checkpoint(path, n_encoder=n_encoder)
        return params, None, step
    if path.is_dir():
        found = latest_checkpoint(path, prefix)
        if found is None:
            # reference-layout project directories (kondata downloads,
            # reference training runs) hold .keras checkpoints instead
            from .keras_import import latest_keras_checkpoint

            kfound = latest_keras_checkpoint(path)
            if kfound is not None:
                from .keras_import import import_keras_checkpoint

                params, step = import_keras_checkpoint(
                    Path(kfound[0]), n_encoder=n_encoder
                )
                return params, None, step
            raise FileNotFoundError(
                f"no {prefix}_*.npz or saved_model_*.keras checkpoints "
                f"in {path}"
            )
        path = Path(found[0])
    m = re.match(rf"{re.escape(prefix)}_(\d+)\.npz$", path.name)
    step = int(m.group(1)) if m else 0
    params = load_pytree(path)
    opt_file = _sibling(path, ".opt.npz")
    opt_state = str(opt_file) if opt_file is not None and opt_file.exists() \
        else None
    return params, opt_state, step


def load_checkpoint_rng(
    path: Union[str, Path], prefix: str = "saved_model"
) -> Optional[np.ndarray]:
    """The PRNG key stored next to a checkpoint, or None (old checkpoints
    without one fall back to a fresh seed-derived key)."""
    path = Path(path)
    if path.is_dir():
        found = latest_checkpoint(path, prefix)
        if found is None:
            return None
        path = Path(found[0])
    rng_file = _sibling(path, ".rng.npy")
    if rng_file is not None and rng_file.exists():
        return np.load(rng_file)
    return None


def load_pytree_into(template: Any, path: Union[str, Path]) -> Any:
    """Load leaves from a .npz into the *structure* of ``template``.

    Needed for optax optimizer states, whose NamedTuple node types can't be
    reconstructed from paths alone. The leaf count and order must match the
    saved file (guaranteed when the template is a freshly-initialized state of
    the same model)."""
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    saved = [data[k] for k in data.files]
    if len(saved) != len(leaves):
        raise ValueError(
            f"checkpoint {path} has {len(saved)} leaves, template has {len(leaves)}"
        )
    return jax.tree_util.tree_unflatten(treedef, saved)


def save_model(model, main_path=None, inp_class_name=None, step=None,
               print_message: bool = False) -> str:
    """Reference-named convenience (``saving_loading_models.py:201-330``):
    checkpoint an autoencoder instance. Delegates to ``model.save(step)``
    (params + optimizer state + PRNG + ``parameters.json`` sidecar) —
    ``main_path`` defaults to the model's own ``p.main_path`` and must
    match it otherwise (npz checkpoints are written where the parameters
    live so relocation repair keeps working).

    Returns the checkpoint path.
    """
    if main_path is not None and str(main_path) != str(model.p.main_path):
        raise ValueError(
            f"save_model writes into the model's own main_path "
            f"({model.p.main_path}); to save elsewhere set p.main_path "
            f"first (got main_path={main_path})"
        )
    out = model.save(step=step)
    if print_message and out is not None:
        name = inp_class_name or type(model).__name__
        print(f"Saved {name} checkpoint at {out}")
    return out


def load_model(autoencoder=None, checkpoint_path=None, trajs=None,
               sparse: bool = False, dataset=None,
               print_message: bool = False, submodel: str = None,
               use_previous_model: bool = False, train_data=None):
    """Reference-named convenience (``saving_loading_models.py:333-626``):
    reload an autoencoder from a checkpoint file or directory.

    Args:
        autoencoder: the class to instantiate (``EncoderMap``,
            ``DihedralEncoderMap``, ``AngleDihedralCartesianEncoderMap``)
            or None to infer it from the checkpoint's ``parameters.json``
            (ADC-specific keys -> ADC class).
        checkpoint_path: ``saved_model_{step}.npz`` file or a run directory
            (most recent checkpoint wins).
        trajs: TrajEnsemble for ADC models (source of CVs).
        dataset / train_data: pass-throughs to the class constructors.
        submodel: "encoder"/"decoder" returns just that bound callable.
        use_previous_model: allow loading an intermediate checkpoint.
        sparse: expect NaN-padded (ragged-ensemble) inputs.
    """
    import json as _json

    from pathlib import Path as _P

    if checkpoint_path is None:
        raise ValueError("load_model needs a checkpoint_path")
    ckpt = _P(checkpoint_path)
    directory = ckpt if ckpt.is_dir() else ckpt.parent

    cls = autoencoder
    if cls is None:
        pfile = directory / "parameters.json"
        keys = set()
        if pfile.exists():
            keys = set(_json.loads(pfile.read_text()))
        from ..train.adc_autoencoder import AngleDihedralCartesianEncoderMap
        from ..train.autoencoder import EncoderMap

        cls = (
            AngleDihedralCartesianEncoderMap
            if "cartesian_cost_scale" in keys or "use_backbone_angles" in keys
            else EncoderMap
        )

    from ..train.adc_autoencoder import AngleDihedralCartesianEncoderMap

    if issubclass(cls, AngleDihedralCartesianEncoderMap):
        out = cls.from_checkpoint(
            trajs, checkpoint_path, use_previous_model=use_previous_model,
            dataset=dataset,
        )
    else:
        if train_data is None and dataset is not None:
            train_data = dataset
        out = cls.from_checkpoint(
            checkpoint_path, train_data=train_data, sparse=sparse,
            use_previous_model=use_previous_model,
        )
    if print_message:
        print(f"Loaded {type(out).__name__} from {checkpoint_path}")
    if submodel is not None:
        if submodel not in ("encoder", "decoder"):
            raise ValueError(f"submodel must be 'encoder' or 'decoder', got {submodel!r}")
        return out.encode if submodel == "encoder" else out.decode
    return out

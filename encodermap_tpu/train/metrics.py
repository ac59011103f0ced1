# encodermap_tpu/train/metrics.py
"""User-facing metric classes (reference ``callbacks/metrics.py:250-581``).

The reference ships ``tf.keras.metrics.Metric`` subclasses that users attach
with ``emap.add_metric(MyMetric)``; each implements ``update(y_true, y_pred)``
returning a scalar that lands in the training history under
``"<ClassName> Metric"``. Here the same contract rides the functional
trainer: a metric object's :meth:`update` is traced into the jitted train
step (via each trainer's ``_metric_io`` which supplies the
``(y_true, y_pred)`` pair), so user metrics run on device at full speed and
appear in ``emap.history`` / the JSONL summary stream like any other term.

``(y_true, y_pred)`` layout:

* Base :class:`~encodermap_tpu.train.autoencoder.Autoencoder` family:
  ``y_true`` is the (densified) input batch, ``y_pred`` the decoded output —
  same as the reference's keras fit loop.
* ADC family: ``y_true`` is the input tuple ``(angles, dihedrals,
  cartesians, distances[, side_dihedrals])`` and ``y_pred`` is
  ``(out_angles, out_dihedrals, back_cartesians, inp_pair, out_pair[, ...])``
  — the backmapped coordinates are ALWAYS at index 2, for every ADC variant.
  (The reference's output list shifts the cartesians to index 3 when
  ``use_sidechains`` unpacks a third decoder head, ``models.py:974-986``,
  which makes its own ``ADCClashMetric`` read side-dihedrals as coordinates
  there, ``callbacks/metrics.py:502-516``. We keep the documented contract
  instead of the quirk.)

Cost note: metric objects run a second forward per step (on the
just-updated parameters). For the built-in clash/RMSD tracking prefer
``ADCParameters.track_clashes`` / ``track_RMSD``, which reuse the loss
forward's intermediates at zero extra cost.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parameters import ADCParameters, Parameters

__all__ = [
    "EncoderMapBaseMetric",
    "AngleDihedralCartesianEncoderMapBaseMetric",
    "OmegaAngleBaseMetric",
    "SidechainVsBackboneFrequencyBaseMetric",
    "ADCClashMetric",
    "ADCRMSDMetric",
    "rmsd_numpy",
]

Array = jax.Array

#: Per-backbone-triplet N, CA, C atom masses used by the reference's
#: weighted-Kabsch RMSD (``callbacks/metrics.py:63``). (The reference uses
#: 24.305 — magnesium — for both CA and C; kept verbatim so the numbers
#: match.)
WEIGHTS: tuple[float, float, float] = (14.0067, 24.305, 24.305)


def _backbone_weights(n_atoms: int) -> np.ndarray:
    reps = -(-n_atoms // 3)  # ceil: tolerate chains not divisible by 3
    return np.tile(np.asarray(WEIGHTS, np.float32), reps)[:n_atoms]


def rmsd_numpy(a: np.ndarray, b: np.ndarray, translate: bool = True) -> np.ndarray:
    """Batched weighted-Kabsch RMSD between coordinate sets, as numpy
    (reference ``callbacks/metrics.py:155-172``).

    Args:
        a, b: ``(batch, n_atoms, 3)`` coordinates.
        translate: kept for signature parity; the weighted Kabsch fit
            always removes the centroids, so the answer is identical
            either way (the reference pre-centers with an extra — buggy,
            per-coordinate-axis — translation step that the subsequent
            fit undoes).

    Returns:
        ``(batch,)`` RMSD values.
    """
    from ..ops.kabsch import rmsd as rmsd_op

    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    w = jnp.asarray(_backbone_weights(a.shape[1]))
    return np.asarray(rmsd_op(jnp.asarray(a), jnp.asarray(b), w))


class EncoderMapBaseMetric:
    """Base class for user metrics (reference ``callbacks/metrics.py:250``).

    Subclass and implement ``update(y_true, y_pred) -> scalar`` with JAX
    ops (it is traced into the jitted train step), then attach with
    ``emap.add_metric(MyMetric)``. The scalar appears in
    ``emap.history["<ClassName> Metric"]`` with one entry per step.

    Examples:
        >>> import encodermap_tpu as em
        >>> import numpy as np
        >>> class MyMetric(em.callbacks.EncoderMapBaseMetric):
        ...     def update(self, y_true, y_pred):
        ...         return 0.0
        >>> emap = em.EncoderMap(train_data=np.random.rand(100, 10),
        ...                      read_only=True)
        >>> emap.add_metric(MyMetric)
        >>> history = emap.train()                      # doctest: +SKIP
        >>> np.mean(history["MyMetric Metric"])         # doctest: +SKIP
        0.0
    """

    #: parity attribute (reference gates an ``update``-presence check on it)
    custom_update_state: bool = True

    def __init__(
        self,
        parameters: Optional[Parameters] = None,
        name: Optional[str] = None,
        current_training_step: Optional[int] = None,
        **kwargs: Any,
    ) -> None:
        if name is None:
            name = f"{type(self).__name__} Metric"
        self.name = name
        self.p = parameters if parameters is not None else self._default_parameters()
        if current_training_step is not None and parameters is not None:
            if current_training_step != parameters.current_training_step:
                raise Exception(
                    f"Instantiation of {type(self).__name__} got different "
                    f"values for current training steps. In parameters, the "
                    f"training step is {parameters.current_training_step}, in "
                    f"the arguments, I got {current_training_step}"
                )
        if type(self).update is EncoderMapBaseMetric.update:
            raise Exception(
                f"Please implement an `update` method, that returns a "
                f"scalar, when subclassing this metric "
                f"({type(self).__name__})."
            )

    @staticmethod
    def _default_parameters() -> Parameters:
        return Parameters()

    def update(self, y_true: Any, y_pred: Any) -> Array:
        """Override: return a scalar from the batch's inputs/outputs."""
        raise NotImplementedError

    def __call__(self, y_true: Any, y_pred: Any) -> Array:
        return self.update(y_true, y_pred)

    # -- serialization parity (reference metrics are keras-serializable) --
    def get_config(self) -> dict[str, Any]:
        return {"name": self.name, "parameters": self.p.to_dict()}

    @classmethod
    def from_config(cls, config: dict[str, Any], custom_objects: Any = None):
        config = dict(config)
        p = config.pop("parameters")
        if isinstance(p, dict):
            cls_p = ADCParameters if "cartesian_pwd_start" in p else Parameters
            p = cls_p(**p)
        return cls(parameters=p, **config)


class AngleDihedralCartesianEncoderMapBaseMetric(EncoderMapBaseMetric):
    """Base metric for the ADC family — defaults to :class:`ADCParameters`
    (reference ``callbacks/metrics.py:374``)."""

    @staticmethod
    def _default_parameters() -> ADCParameters:
        return ADCParameters()


class OmegaAngleBaseMetric(AngleDihedralCartesianEncoderMapBaseMetric):
    """Subclass hook for omega-angle tracking (reference
    ``callbacks/metrics.py:460`` — an empty base in the reference too)."""


class SidechainVsBackboneFrequencyBaseMetric(
    AngleDihedralCartesianEncoderMapBaseMetric
):
    """Subclass hook for sidechain-vs-backbone frequency tracking
    (reference ``callbacks/metrics.py:464``)."""


def _pred_cartesians(y_pred: Any) -> Array:
    if isinstance(y_pred, (tuple, list)):
        return y_pred[2]
    return y_pred


class ADCClashMetric(AngleDihedralCartesianEncoderMapBaseMetric):
    """Mean number of atom-pair clashes in the backmapped coordinates
    (reference ``callbacks/metrics.py:470-530``): pairs closer than 1 Å.

    Args:
        distance_unit: ``"nm"`` (clash below 0.1) or ``"ang"`` (below 1.0)
            — the framework's coordinates are nm.
    """

    def __init__(
        self,
        distance_unit: str = "nm",
        name: str = "ADCClashMetric",
        parameters: Optional[ADCParameters] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(parameters=parameters, name=name, **kwargs)
        if distance_unit == "nm":
            self.clash_distance = 0.1
        elif distance_unit == "ang":
            self.clash_distance = 1.0
        else:
            raise Exception(
                f"Argument `distance_unit` must be either 'nm' or 'ang'. "
                f"You provided {distance_unit=}."
            )

    def update(self, y_true: Any, y_pred: Any) -> Array:
        from ..ops.distances import pairwise_dist

        cart = _pred_cartesians(y_pred)
        d = pairwise_dist(cart, flat=True)
        clashes = jnp.sum((d < self.clash_distance).astype(jnp.float32), axis=-1)
        return jnp.mean(clashes)

    def get_config(self) -> dict[str, Any]:
        # the reference's get_config (callbacks/metrics.py:448-457) omits
        # distance_unit, so its from_config crashes on the then-missing
        # required argument; round-trip it properly here
        config = super().get_config()
        config["distance_unit"] = "nm" if self.clash_distance == 0.1 else "ang"
        return config


class ADCRMSDMetric(AngleDihedralCartesianEncoderMapBaseMetric):
    """Batch-mean weighted-Kabsch RMSD (nm) of the backmapped backbone vs
    the input coordinates (reference ``callbacks/metrics.py:533-581``; the
    reference stores the per-frame vector — the history here logs the batch
    mean, the natural scalar for the JSONL/TensorBoard stream)."""

    def __init__(
        self,
        name: str = "ADCRMSDMetric",
        parameters: Optional[ADCParameters] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(parameters=parameters, name=name, **kwargs)

    def update(self, y_true: Any, y_pred: Any) -> Array:
        from ..ops.kabsch import rmsd as rmsd_op

        pred = _pred_cartesians(y_pred)
        true = y_true[2] if isinstance(y_true, (tuple, list)) else y_true
        if getattr(self.p, "reconstruct_sidechains", False):
            # reconstruct mode backmaps ALL atoms (backbone + sidechain
            # branches), so the N-CA-C mass triplet pattern would land on
            # the wrong atoms — the reference's kabsch_tf tiles it
            # regardless (callbacks/metrics.py:176-177, silently wrong
            # there); uniform weights are the honest choice when atom
            # identities are unknown at this layer
            w = None
        else:
            w = jnp.asarray(_backbone_weights(int(pred.shape[1])))
        return jnp.mean(rmsd_op(true, pred, w))

# tests/test_pallas_scan.py
"""The fused VMEM quaternion-scan kernel matches the XLA oracle
(interpreter mode on CPU; the real-chip A/B lives in the module docstring)."""

import numpy as np
import pytest

import jax.numpy as jnp

from encodermap_tpu.ops.pallas_scan import (
    quat_chain_positions,
    quat_chain_positions_reference,
)


@pytest.mark.parametrize("B,n", [(4, 7), (8, 453), (3, 1), (16, 128)])
def test_matches_oracle(B, n, rng):
    d = rng.uniform(-np.pi, np.pi, (B, n)).astype(np.float32)
    ax = rng.standard_normal((B, n, 3)).astype(np.float32)
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    half = d / 2
    q = (jnp.asarray(np.cos(half)),) + tuple(
        jnp.asarray(np.sin(half) * ax[..., k]) for k in range(3)
    )
    bonds = tuple(
        jnp.asarray(rng.standard_normal((B, n + 1)).astype(np.float32))
        for _ in range(3)
    )
    ref = quat_chain_positions_reference(q, bonds)
    out = quat_chain_positions(q, bonds, interpret=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(a, b, atol=5e-4)

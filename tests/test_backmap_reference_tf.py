# tests/test_backmap_reference_tf.py
"""Backmap parity against the reference's OWN TensorFlow graph functions.

tests/test_backmap.py validates against a hand-written numpy oracle
(tests/reference_impl.py); this file goes one step further and extracts the
reference's actual TF functions from the read-only mount at test time
(AST-surgery — the full modules are unimportable here: they pull in mdtraj/
MDAnalysis/numba), then asserts:

  * forward parity: chain_in_plane and the full dihedrals->cartesian chain
    agree elementwise with our closed-form cumsum + quaternion
    associative-scan versions (``ops/backmap.py``), and
  * GRADIENT parity: tf.GradientTape through the reference's sequential
    rotation loop vs jax.grad through our scan with its hand-derived
    analytic VJP (``ops/backmap.py:367``) — the strongest available check
    of the SoA adjoint against an independent implementation.

Extracted functions: ``misc/backmapping.py:179`` (split_and_reverse_dihedrals),
``:217`` (split_and_reverse_cartesians), ``:259``
(dihedrals_to_cartesian_tf_layers), ``:1873``
(dihedral_to_cartesian_tf_one_way_layers — its stray numba decorator
stripped), ``:1950`` (rotation_matrix), and
``encodermap_tf1/backmapping.py:97`` (chain_in_plane).
"""

import ast
from math import pi
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = Path("/root/reference/encodermap")


@pytest.fixture(scope="module")
def tf():
    return pytest.importorskip("tensorflow")


def _extract_functions(source_path: Path, names: set, namespace: dict):
    """Compile just the named top-level function defs (decorators stripped)
    from a file into ``namespace``."""
    tree = ast.parse(source_path.read_text())
    picked = []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in names:
            node.decorator_list = []
            picked.append(node)
    found = {n.name for n in picked}
    assert found == names, f"missing from {source_path}: {names - found}"
    mod = ast.Module(body=picked, type_ignores=[])
    exec(compile(mod, str(source_path), "exec"), namespace)
    return namespace


@pytest.fixture(scope="module")
def ref_tf(tf):
    if not REF.exists():
        pytest.skip("reference not mounted")
    ns = {"tf": tf, "np": np, "pi": pi}
    _extract_functions(
        REF / "misc/backmapping.py",
        {
            "split_and_reverse_dihedrals",
            "split_and_reverse_cartesians",
            "dihedrals_to_cartesian_tf_layers",
            "dihedral_to_cartesian_tf_one_way_layers",
            "rotation_matrix",
        },
        ns,
    )
    _extract_functions(
        REF / "encodermap_tf1/backmapping.py", {"chain_in_plane"}, ns
    )
    return ns


def _sizes(n_atoms: int) -> tuple[int, int]:
    """The left/right iteration counters the reference's BackMapLayer
    computes from the central-cartesians shape (``models/layers.py:939``)."""
    n_dihedrals = n_atoms - 3
    middle = n_dihedrals // 2
    if n_dihedrals % 2 == 0:
        left, right = middle, n_dihedrals - middle
    else:
        left, right = middle + 1, n_dihedrals - middle - 1
    return left, right


class TestForwardParityVsReferenceTF:
    @pytest.mark.parametrize("n_atoms", [8, 9, 30])
    def test_chain_in_plane(self, tf, ref_tf, n_atoms):
        from encodermap_tpu.ops.backmap import chain_in_plane

        rng = np.random.default_rng(0)
        lengths = rng.uniform(0.1, 0.16, (6, n_atoms - 1)).astype(np.float32)
        angles = rng.uniform(1.5, 2.5, (6, n_atoms - 2)).astype(np.float32)
        theirs = np.asarray(ref_tf["chain_in_plane"](
            tf.convert_to_tensor(lengths), tf.convert_to_tensor(angles)
        ))
        ours = np.asarray(chain_in_plane(
            jnp.asarray(lengths), jnp.asarray(angles)
        ))
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    @pytest.mark.parametrize("n_atoms", [8, 9, 31, 60])
    def test_full_chain(self, tf, ref_tf, n_atoms):
        """chain_in_plane + both curled tails, even and odd dihedral
        counts, vs the reference's graph path."""
        from encodermap_tpu.ops.backmap import (
            chain_in_plane,
            dihedrals_to_cartesian,
        )

        rng = np.random.default_rng(1)
        batch = 4
        lengths = rng.uniform(0.1, 0.16, (batch, n_atoms - 1)).astype(
            np.float32
        )
        angles = rng.uniform(1.5, 2.5, (batch, n_atoms - 2)).astype(
            np.float32
        )
        dihedrals = rng.uniform(-pi, pi, (batch, n_atoms - 3)).astype(
            np.float32
        )

        chain = np.asarray(
            chain_in_plane(jnp.asarray(lengths), jnp.asarray(angles))
        )
        left, right = _sizes(n_atoms)
        theirs = np.asarray(ref_tf["dihedrals_to_cartesian_tf_layers"](
            tf.convert_to_tensor(dihedrals),
            tf.convert_to_tensor(chain),
            left,
            right,
        ))
        ours = np.asarray(dihedrals_to_cartesian(
            jnp.asarray(dihedrals), jnp.asarray(chain)
        ))
        np.testing.assert_allclose(ours, theirs, atol=3e-5)


class TestGradientParityVsReferenceTF:
    @pytest.mark.parametrize("n_atoms", [9, 30, 61])
    def test_grad_wrt_dihedrals_and_chain(self, tf, ref_tf, n_atoms):
        """d(scalar(xyz))/d(dihedrals, planar chain): reference TF loop vs
        our associative scan's analytic VJP. The scalar is a fixed random
        projection so every output coordinate contributes with a distinct
        weight (a plain sum would zero out internal cancellation bugs)."""
        from encodermap_tpu.ops.backmap import (
            chain_in_plane,
            dihedrals_to_cartesian,
        )

        rng = np.random.default_rng(2)
        batch = 4
        lengths = rng.uniform(0.1, 0.16, (batch, n_atoms - 1)).astype(
            np.float32
        )
        angles = rng.uniform(1.5, 2.5, (batch, n_atoms - 2)).astype(
            np.float32
        )
        dihedrals = rng.uniform(-pi, pi, (batch, n_atoms - 3)).astype(
            np.float32
        )
        weights = rng.standard_normal((n_atoms, 3)).astype(np.float32)

        chain = np.asarray(
            chain_in_plane(jnp.asarray(lengths), jnp.asarray(angles))
        )

        # ---- reference gradient
        left, right = _sizes(n_atoms)
        td = tf.Variable(dihedrals)
        tc = tf.Variable(chain)
        with tf.GradientTape() as tape:
            xyz = ref_tf["dihedrals_to_cartesian_tf_layers"](
                td, tc, left, right
            )
            loss = tf.reduce_sum(xyz * weights)
        g_d_ref, g_c_ref = tape.gradient(loss, [td, tc])

        # ---- ours
        def scalar(d, c):
            return jnp.sum(dihedrals_to_cartesian(d, c) * weights)

        g_d, g_c = jax.grad(scalar, argnums=(0, 1))(
            jnp.asarray(dihedrals), jnp.asarray(chain)
        )

        for ours, theirs, tag in [
            (np.asarray(g_d), np.asarray(g_d_ref), "dihedrals"),
            (np.asarray(g_c), np.asarray(g_c_ref), "chain"),
        ]:
            scale = max(np.abs(theirs).max(), 1e-8)
            err = np.abs(ours - theirs).max() / scale
            assert err < 2e-3, f"{tag}: rel grad err {err:.2e}"

    def test_grad_through_full_backmap(self, tf, ref_tf):
        """End-to-end: d/d(lengths, angles, dihedrals) through mean-length
        reduction + chain_in_plane + both tails — the exact program the ADC
        train step differentiates (``ops/backmap.py::backmap``)."""
        from encodermap_tpu.ops.backmap import backmap

        n_atoms = 30
        rng = np.random.default_rng(3)
        batch = 6
        lengths = rng.uniform(0.1, 0.16, (batch, n_atoms - 1)).astype(
            np.float32
        )
        angles = rng.uniform(1.5, 2.5, (batch, n_atoms - 2)).astype(
            np.float32
        )
        dihedrals = rng.uniform(-pi, pi, (batch, n_atoms - 3)).astype(
            np.float32
        )
        weights = rng.standard_normal((n_atoms, 3)).astype(np.float32)

        # ---- reference: replicate BackMapLayer's call sequence
        # (``models/layers.py:913-987``) from its extracted pieces
        left, right = _sizes(n_atoms)
        tl = tf.Variable(lengths)
        ta = tf.Variable(angles)
        td = tf.Variable(dihedrals)
        with tf.GradientTape() as tape:
            mean_lengths = tf.reduce_mean(tl, axis=0, keepdims=True)
            mean_lengths = tf.tile(mean_lengths, [batch, 1])
            chain = ref_tf["chain_in_plane"](mean_lengths, ta)
            xyz = ref_tf["dihedrals_to_cartesian_tf_layers"](
                td + pi, chain, left, right
            )
            loss = tf.reduce_sum(xyz * weights)
        g_ref = tape.gradient(loss, [tl, ta, td])

        def scalar(le, an, di):
            return jnp.sum(backmap(le, an, di) * weights)

        g_ours = jax.grad(scalar, argnums=(0, 1, 2))(
            jnp.asarray(lengths), jnp.asarray(angles), jnp.asarray(dihedrals)
        )

        for ours, theirs, tag in zip(
            g_ours, g_ref, ("lengths", "angles", "dihedrals")
        ):
            ours, theirs = np.asarray(ours), np.asarray(theirs)
            scale = max(np.abs(theirs).max(), 1e-8)
            err = np.abs(ours - theirs).max() / scale
            assert err < 2e-3, f"{tag}: rel grad err {err:.2e}"

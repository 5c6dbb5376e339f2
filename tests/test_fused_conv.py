"""Fused Pallas Cayley-conv kernel: interpret-mode parity with the XLA
dense-DFT path (value + gradient), batch padding, and the layer env gate."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fiode_tpu.ops.cayley import apply_freq_matrices, cayley_conv_kernel
from fiode_tpu.ops.fused_cayley_conv import fused_freq_apply


def _case(co, ci, k, n, B, seed=0):
    rng = np.random.default_rng(seed)
    W = jnp.asarray(rng.normal(0, 0.1, (co, ci, k, k)).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1, (B, ci, n, n)).astype(np.float32))
    Q = cayley_conv_kernel(W, jnp.float32(1.1), n)
    return x, Q


class TestFusedCayleyConv:
    @pytest.mark.parametrize(
        "co,ci,k,n,B",
        [(5, 3, 3, 8, 8), (4, 6, 2, 8, 16), (8, 4, 3, 16, 4)],
    )
    def test_matches_dft_path(self, co, ci, k, n, B):
        x, Q = _case(co, ci, k, n, B)
        ref = apply_freq_matrices(x, Q, impl="dft")
        out = fused_freq_apply(x, Q, 4, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_batch_padding(self):
        # B=7 with block_b=4 pads to 8 and slices back
        x, Q = _case(5, 3, 3, 8, 7)
        ref = apply_freq_matrices(x, Q, impl="dft")
        out = fused_freq_apply(x, Q, 4, True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_gradients_match_reference_path(self):
        x, Q = _case(4, 6, 2, 8, 8)

        gf = jax.grad(lambda x_: fused_freq_apply(x_, Q, 4, True).sum())(x)
        gr = jax.grad(
            lambda x_: apply_freq_matrices(x_, Q, impl="dft").sum()
        )(x)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-5)

    def test_layer_env_gate(self, monkeypatch):
        # FIODE_FUSED_CONV routes CayleyConv through the kernel; under the
        # interpret-mode override the layer output must be unchanged
        from jax.experimental.pallas.tpu import force_tpu_interpret_mode

        from fiode_tpu.models.layers import CayleyConv

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(0, 1, (4, 3, 8, 8)).astype(np.float32))
        layer = CayleyConv(6, 3)
        p = layer.init(jax.random.PRNGKey(0), x)
        ref = layer.apply(p, x)
        monkeypatch.setenv("FIODE_FUSED_CONV", "1")
        with force_tpu_interpret_mode():
            out = layer.apply(p, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )

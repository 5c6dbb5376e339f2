"""Fused-RHS oracles: padded reference matches the flax dynamics exactly,
gradients match the unfused path, and the fused solve reproduces the
unfused solution and NFE (CPU uses the jnp reference implementation;
the Pallas kernel itself runs on TPU in bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fiode_tpu.models.dynamics import SimplexDynamics
from fiode_tpu.models.ivp import NeuralODEClassifier
from fiode_tpu.models.backbones import TinyMLPBackbone
from fiode_tpu.ops.fused_rhs import (
    LANE,
    FusedRhsParams,
    fused_rhs,
    masked_cone_project,
    pack_rhs_params,
    rhs_reference,
)
from fiode_tpu.ops.simplex_qp import simplex_cone_project


def make_model(n=10, x_dim=10, mlp=32, scale_nominal=False):
    dyn = SimplexDynamics(
        n_hidden=n, mlp_size=mlp, x_dim=x_dim, dropout=0.0,
        alpha_1=100.0, alpha_2=20.0, sigma_1=0.02,
        scale_nominal=scale_nominal, cayley=True,
    )
    model = NeuralODEClassifier(
        backbone=TinyMLPBackbone(out_dim=x_dim, hidden=16,
                                 mu=(0.5,), std=(0.25,)),
        dynamics=dyn, n_classes=n,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (6, 1, 8, 8))
    params = model.init(jax.random.PRNGKey(1), x)
    return model, params, x


class TestMaskedProjection:
    def test_matches_unmasked(self):
        key = jax.random.PRNGKey(0)
        n = 10
        h = jax.random.uniform(key, (8, n))
        h = h / h.sum(-1, keepdims=True)
        lower = -100.0 * (jnp.exp(0.02 * h) - 1.0)
        nominal = jax.random.normal(jax.random.PRNGKey(1), (8, n))
        v_ref = simplex_cone_project(lower, nominal, 40)

        low_p = jnp.zeros((8, LANE)).at[:, :n].set(lower)
        nom_p = jnp.zeros((8, LANE)).at[:, :n].set(nominal)
        mask = (jnp.arange(LANE) < n)[None, :] & jnp.ones((8, 1), bool)
        v_pad = masked_cone_project(low_p, nom_p, mask, 40)
        np.testing.assert_allclose(
            np.asarray(v_pad[:, :n]), np.asarray(v_ref), atol=1e-4
        )
        assert np.abs(np.asarray(v_pad[:, n:])).max() == 0.0

    def test_masked_gradients_match(self):
        key = jax.random.PRNGKey(2)
        n = 6
        h = jax.random.uniform(key, (4, n))
        h = h / h.sum(-1, keepdims=True)
        lower = -100.0 * (jnp.exp(0.02 * h) - 1.0)
        nominal = jax.random.normal(jax.random.PRNGKey(3), (4, n))
        w = jnp.arange(1.0, n + 1.0)

        g_ref = jax.grad(
            lambda nom: jnp.sum(
                jnp.sin(simplex_cone_project(lower, nom, 40)) * w
            )
        )(nominal)

        low_p = jnp.zeros((4, LANE)).at[:, :n].set(lower)
        mask = jnp.broadcast_to((jnp.arange(LANE) < n)[None, :], (4, LANE))

        def loss_pad(nom):
            nom_p = jnp.zeros((4, LANE)).at[:, :n].set(nom)
            v = masked_cone_project(low_p, nom_p, mask, 40)
            return jnp.sum(jnp.sin(v[:, :n]) * w)

        g_pad = jax.grad(loss_pad)(nominal)
        np.testing.assert_allclose(np.asarray(g_pad), np.asarray(g_ref),
                                   atol=1e-4)


class TestFusedVsFlax:
    @pytest.mark.parametrize("scale_nominal", [False, True])
    def test_rhs_matches_flax_dynamics(self, scale_nominal):
        model, params, x = make_model(scale_nominal=scale_nominal)
        n = model.dynamics.n_hidden
        feats = model.features(params, x)
        h = model.h0(x.shape[0]) + 0.01 * jax.random.normal(
            jax.random.PRNGKey(5), (x.shape[0], n)
        )
        h = jnp.abs(h) / jnp.abs(h).sum(-1, keepdims=True)
        f_flax = model.eval_dot(params, h, feats,
                                scale_nominal=scale_nominal)

        p, xc_pad = model._fused_setup(params, feats)
        h_pad = jnp.zeros((x.shape[0], LANE)).at[:, :n].set(h)
        f_pad = fused_rhs(
            h_pad, xc_pad, p, n, 100.0, 0.02, 20.0, scale_nominal, 30
        )
        np.testing.assert_allclose(
            np.asarray(f_pad[:, :n]), np.asarray(f_flax), atol=2e-4
        )

    def test_fused_solve_matches_unfused(self):
        model, params, x = make_model()
        s1 = jax.jit(lambda p, x: model.solve(p, x, mode="while"))(params, x)
        s2 = jax.jit(
            lambda p, x: model.solve(p, x, mode="while", fused=True)
        )(params, x)
        np.testing.assert_allclose(
            np.asarray(s1.ys[-1]), np.asarray(s2.ys[-1]), atol=1e-3
        )
        # identical step-control decisions => identical NFE
        assert int(s1.nfe) == int(s2.nfe)

    def test_fused_scan_gradients(self):
        model, params, x = make_model()
        y = jnp.asarray([0, 1, 2, 3, 4, 5])

        def loss(params, fused):
            sol = model.solve(params, x, mode="scan", fused=fused)
            probs = sol.ys[-1]
            p_y = jnp.take_along_axis(
                jnp.clip(probs, 1e-12), y[:, None], axis=-1
            )
            return -jnp.mean(jnp.log(p_y))

        g1 = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
        g2 = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3
            )


class TestPallasKernels:
    """Run the ACTUAL Pallas kernels (interpret mode on CPU) against the jnp
    reference — forward and the fused backward (grad parity, VERDICT r1
    item 9)."""

    def _packed(self, n=10, mlp=32, B=37, seed=0):
        # B deliberately not a multiple of the block size: exercises the
        # ragged-last-block row guard in the backward kernel
        k = jax.random.PRNGKey(seed)
        ks = jax.random.split(k, 6)
        W1 = 0.3 * jax.random.normal(ks[0], (mlp, n))
        W2 = 0.3 * jax.random.normal(ks[1], (mlp, mlp))
        W3 = 0.3 * jax.random.normal(ks[2], (n, mlp))
        b2 = 0.1 * jax.random.normal(ks[3], (mlp,))
        b3 = 0.1 * jax.random.normal(ks[4], (n,))
        p = pack_rhs_params(W1, W2, W3, b2, b3)
        h = jax.random.uniform(ks[5], (B, n))
        h = h / h.sum(-1, keepdims=True)
        h_pad = jnp.zeros((B, LANE)).at[:, :n].set(h)
        xc = 0.5 * jax.random.normal(jax.random.PRNGKey(9), (B, mlp))
        xc_pad = jnp.zeros((B, LANE)).at[:, :mlp].set(xc)
        return h_pad, xc_pad, p, n

    def test_forward_kernel_interpret_matches_reference(self):
        from fiode_tpu.ops.fused_rhs import _make_pallas_forward

        h_pad, xc_pad, p, n = self._packed()
        fwd = _make_pallas_forward(n, 100.0, 0.02, 20.0, False, 30,
                                   block=16, interpret=True)
        got = jax.jit(fwd)(h_pad, xc_pad, p)
        want = rhs_reference(h_pad, xc_pad, p, n, 100.0, 0.02, 20.0, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_backward_kernel_interpret_matches_jnp_vjp(self):
        from fiode_tpu.ops.fused_rhs import _make_pallas_backward

        h_pad, xc_pad, p, n = self._packed()
        g = jax.random.normal(jax.random.PRNGKey(3), h_pad.shape)
        g = g * (jnp.arange(LANE) < n)[None, :]

        bwd = _make_pallas_backward(n, 100.0, 0.02, 30, block=16,
                                    interpret=True)
        dh, dxc, dW1, dW2, dW3, db2, db3 = jax.jit(bwd)(h_pad, xc_pad, g, p)

        _, vjp = jax.vjp(
            lambda h, xc, pp: rhs_reference(h, xc, pp, n, 100.0, 0.02, 20.0,
                                            False, 30),
            h_pad, xc_pad, p,
        )
        rh, rxc, rp = vjp(g)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(rh), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dxc), np.asarray(rxc), atol=1e-4)
        for got, want in ((dW1, rp.W1), (dW2, rp.W2), (dW3, rp.W3),
                          (db2[0], rp.b2), (db3[0], rp.b3)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-4)


class TestFusedEnvGate:
    def test_env_var_flips_default(self, monkeypatch):
        from fiode_tpu.models.ivp import _fused_default

        monkeypatch.delenv("FIODE_FUSED", raising=False)
        assert _fused_default() is False
        monkeypatch.setenv("FIODE_FUSED", "1")
        assert _fused_default() is True
        monkeypatch.setenv("FIODE_FUSED", "0")
        assert _fused_default() is False

    def test_env_default_solve_matches_explicit(self, monkeypatch):
        model, params, x = make_model()
        monkeypatch.setenv("FIODE_FUSED", "1")
        s_env = jax.jit(lambda p, x: model.solve(p, x, mode="while"))(params, x)
        monkeypatch.delenv("FIODE_FUSED")
        s_exp = jax.jit(
            lambda p, x: model.solve(p, x, mode="while", fused=True)
        )(params, x)
        np.testing.assert_allclose(
            np.asarray(s_env.ys[-1]), np.asarray(s_exp.ys[-1]), atol=1e-6
        )

"""Golden dopri5 fixtures on the REAL simplex dynamics vs a float64 scipy
oracle — the accuracy-parity proxy for this box (BASELINE.md: no network
egress, so real-data accuracy parity is blocked; instead we pin the solver
behaviour that accuracy depends on).

Two oracles:
  * endpoint value: scipy ``solve_ivp`` (RK45, float64, rtol=1e-9) on a
    numpy float64 reimplementation of the projected simplex RHS (exact dual
    root via brentq instead of fixed-iteration bisection) — the dopri5
    endpoint at rtol=atol=1e-3 must agree to tolerance-commensurate error
    (torchdiffeq semantics, reference models.py:236-241).
  * step-sequence fixture: NFE / accepted / rejected counts at
    rtol=atol=1e-3 are pinned to golden values (computed once on CPU
    float32) so any silent change to step-size control, error norm or
    accept/reject accounting fails loudly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fiode_tpu.models.backbones import TinyMLPBackbone
from fiode_tpu.models.dynamics import SimplexDynamics, densify_dynamics_params
from fiode_tpu.models.ivp import NeuralODEClassifier

# golden step-sequence fixture for THIS model/seed/tolerance (see
# test_golden_nfe_trace; recompute deliberately if solver semantics change)
GOLDEN = {"nfe": 20, "n_accepted": 3, "n_rejected": 0}


def make_model(n=10, x_dim=10, mlp=32):
    dyn = SimplexDynamics(
        n_hidden=n, mlp_size=mlp, x_dim=x_dim, dropout=0.0,
        alpha_1=100.0, alpha_2=20.0, sigma_1=0.02,
        scale_nominal=False, cayley=True,
    )
    model = NeuralODEClassifier(
        backbone=TinyMLPBackbone(out_dim=x_dim, hidden=16,
                                 mu=(0.5,), std=(0.25,)),
        dynamics=dyn, n_classes=n,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 1, 8, 8))
    params = model.init(jax.random.PRNGKey(1), x)
    return model, params, x


def rhs_f64(dense, feats64, a1=100.0, s1=0.02):
    """Float64 numpy oracle of SimplexDynamics.eval_dot (scale_nominal=False):
    relu MLP + barrier + EXACT cone projection (brentq dual root)."""
    from scipy.optimize import brentq

    W1 = np.asarray(dense["hidden_to_mlp"]["kernel"], np.float64)
    b1 = np.asarray(dense["hidden_to_mlp"]["bias"], np.float64)
    U = np.asarray(dense["U_x"]["kernel"], np.float64)
    bU = np.asarray(dense["U_x"]["bias"], np.float64)
    W2 = np.asarray(dense["mlp_to_mlp"]["kernel"], np.float64)
    b2 = np.asarray(dense["mlp_to_mlp"]["bias"], np.float64)
    W3 = np.asarray(dense["mlp_to_hidden"]["kernel"], np.float64)
    b3 = np.asarray(dense["mlp_to_hidden"]["bias"], np.float64)
    xc = feats64 @ U.T + bU + b1  # (B, mlp)

    def f(h):  # h (B, n) -> (B, n)
        z = np.maximum(h @ W1.T + xc, 0.0)
        z = np.maximum(z @ W2.T + b2, 0.0)
        ft = z @ W3.T + b3
        lower = -a1 * (np.exp(s1 * h) - 1.0)
        out = np.empty_like(ft)
        for b in range(ft.shape[0]):
            nom, lb = ft[b], lower[b]

            def s(mu):
                return np.sum(np.maximum(nom - mu, lb))

            lo = np.min(nom) - 1.0
            hi = np.max(nom - lb) + 1.0
            mu = brentq(s, lo, hi, xtol=1e-14)
            out[b] = np.maximum(nom - mu, lb)
        return out

    return f


class TestGoldenDopri5:
    @pytest.fixture(scope="class")
    def setup(self):
        model, params, x = make_model()
        feats = np.asarray(jax.jit(model.features)(params, x), np.float64)
        dense = densify_dynamics_params(params["dynamics"])
        return model, params, x, feats, dense

    def test_endpoint_matches_scipy_float64(self, setup):
        from scipy.integrate import solve_ivp

        model, params, x, feats, dense = setup
        sol = jax.jit(
            lambda p, x: model.solve(p, x, mode="while", rtol=1e-3, atol=1e-3)
        )(params, x)
        end = np.asarray(sol.ys[-1], np.float64)  # (B, n)

        f = rhs_f64(dense, feats)
        B, n = end.shape
        h0 = np.full((B, n), 1.0 / n)

        def flat_rhs(t, y):
            return f(y.reshape(B, n)).reshape(-1)

        ref = solve_ivp(flat_rhs, (0.0, float(model.t_max)),
                        h0.reshape(-1), method="RK45",
                        rtol=1e-9, atol=1e-12)
        assert ref.success
        ref_end = ref.y[:, -1].reshape(B, n)
        # rtol=atol=1e-3 global error budget (torchdiffeq-comparable)
        err = np.abs(end - ref_end).max()
        assert err < 5e-3, err
        # both endpoints live on the simplex
        np.testing.assert_allclose(end.sum(-1), 1.0, atol=1e-4)
        np.testing.assert_allclose(ref_end.sum(-1), 1.0, atol=1e-6)

    def test_golden_step_sequence(self, setup):
        model, params, x, feats, dense = setup
        stats = {}
        for mode in ("while", "scan"):
            sol = jax.jit(
                lambda p, x, m=mode: model.solve(
                    p, x, mode=m, rtol=1e-3, atol=1e-3)
            )(params, x)
            stats[mode] = (int(sol.nfe), int(sol.n_accepted),
                           int(sol.n_rejected))
        # while and scan must walk the identical accept/reject sequence
        assert stats["while"] == stats["scan"], stats
        nfe, nacc, nrej = stats["while"]
        # torchdiffeq accounting for an FSAL tableau: 2 startup + 6 per
        # attempt — a rejected attempt re-evaluates stages 2..7 too, only
        # the saved first-stage eval is reused (integrate.py FSAL branch)
        assert nfe == 2 + 6 * (nacc + nrej), stats
        golden = (GOLDEN["nfe"], GOLDEN["n_accepted"], GOLDEN["n_rejected"])
        assert stats["while"] == golden, (stats, golden)

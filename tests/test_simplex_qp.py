"""Oracles for the simplex-cone projection QP.

Feasibility, optimality (exact bisection oracle), and gradcheck of the
closed-form active-set VJP against finite differences — the test strategy
derived from the reference's own diagnostics (residual warnings in
barrier_projection.py:264-266 and the KKT backward at :272-311).

Everything is jitted once and reused: on this host eager dispatch triggers a
fresh XLA compile per call, so tests must stay inside a handful of
compilations.
"""
import numpy as np
import jax
import jax.numpy as jnp

from fiode_tpu.ops.simplex_qp import (
    simplex_cone_project,
    simplex_box_project,
)

N = 6


def exact_cone_project(lower, nominal):
    """Exact solution via long-running numpy bisection (oracle)."""
    out = np.zeros_like(nominal)
    for b in range(nominal.shape[0]):
        nom, low = nominal[b], lower[b]
        lo, hi = np.min(nom) - 1.0, np.max(nom - low) + 1.0
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if np.sum(np.maximum(nom - mid, low)) > 0:
                lo = mid
            else:
                hi = mid
        mu = 0.5 * (lo + hi)
        out[b] = np.maximum(nom - mu, low)
    return out


def make_problem(rng, batch=16, n=N, alpha_1=100.0, sigma_1=0.02):
    h = rng.exponential(size=(batch, n))
    h = h / h.sum(-1, keepdims=True)
    lower = -alpha_1 * (np.exp(sigma_1 * h) - 1.0)
    nominal = rng.normal(size=(batch, n)).astype(np.float32)
    return lower.astype(np.float32), nominal.astype(np.float32)


_cone = jax.jit(lambda l, n: simplex_cone_project(l, n))
_box = jax.jit(lambda l, u, n: simplex_box_project(l, u, n))

_w = jnp.arange(1.0, N + 1.0)


@jax.jit
def _cone_loss(low, nom):
    v = simplex_cone_project(low, nom, 40)
    return jnp.sum(jnp.sin(v) * _w)


_cone_grad = jax.jit(jax.grad(_cone_loss, argnums=(0, 1)))


@jax.jit
def _box_loss(low, up, nom):
    v = simplex_box_project(low, up, nom, 40)
    return jnp.sum(jnp.cos(v) * _w)


_box_grad = jax.jit(jax.grad(_box_loss, argnums=(0, 1, 2)))


class TestConeProjection:
    def test_unrolled_bisection_bitwise_equal(self):
        # unroll=True flattens the same iteration sequence into the graph
        # (used by the certification sweep); values and grads must match
        rng = np.random.default_rng(7)
        lower, nominal = make_problem(rng, batch=32)
        a = np.asarray(_cone(lower, nominal))
        b = np.asarray(
            jax.jit(lambda l, n: simplex_cone_project(l, n, 30, True))(
                lower, nominal
            )
        )
        np.testing.assert_array_equal(a, b)
        g0 = jax.grad(
            lambda l, n: jnp.sum(jnp.sin(simplex_cone_project(l, n)) * _w)
        )(jnp.asarray(lower), jnp.asarray(nominal))
        g1 = jax.grad(
            lambda l, n: jnp.sum(
                jnp.sin(simplex_cone_project(l, n, 30, True)) * _w
            )
        )(jnp.asarray(lower), jnp.asarray(nominal))
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))

    def test_feasibility_optimality_idempotence(self):
        rng = np.random.default_rng(0)
        lower, nominal = make_problem(rng, batch=64)
        v = np.asarray(_cone(lower, nominal))
        np.testing.assert_allclose(v.sum(-1), 0.0, atol=2e-4)
        assert np.all(v >= lower - 1e-6)
        v_exact = exact_cone_project(lower, nominal)
        np.testing.assert_allclose(v, v_exact, atol=5e-4)
        # idempotence: a feasible point projects to itself
        v2 = np.asarray(_cone(lower, v))
        np.testing.assert_allclose(v, v2, atol=5e-4)

    def test_vjp_matches_finite_differences(self):
        rng = np.random.default_rng(3)
        lower, nominal = make_problem(rng, batch=6)
        g_low, g_nom = _cone_grad(lower, nominal)
        eps, rtol = 1e-3, 0.08
        for arg in (0, 1):
            target = [lower, nominal][arg]
            g = [g_low, g_nom][arg]
            for _ in range(10):
                i = rng.integers(target.shape[0])
                j = rng.integers(target.shape[1])
                d = np.zeros_like(target)
                d[i, j] = eps
                args_p = [lower, nominal]
                args_m = [lower, nominal]
                args_p[arg] = target + d
                args_m[arg] = target - d
                fd = (_cone_loss(*args_p) - _cone_loss(*args_m)) / (2 * eps)
                an = g[i, j]
                assert abs(fd - an) <= rtol * max(1.0, abs(fd)), (
                    f"arg{arg}[{i},{j}]: fd={fd:.5f} analytic={an:.5f}"
                )

    def test_jvp_of_outer_fn_with_projected_tangent(self):
        # the v_ndot pattern: jvp of V along the projected dynamics must be
        # differentiable wrt parameters feeding the tangent
        rng = np.random.default_rng(4)
        lower, nominal = make_problem(rng, batch=4)

        @jax.jit
        @jax.grad
        def gfun(w):
            f = simplex_cone_project(lower, nominal * w)
            h = jnp.asarray(nominal)
            _, vdot = jax.jvp(lambda h_: jnp.sum(h_ ** 2), (h,), (f,))
            return vdot

        g = gfun(jnp.ones((N,)))
        assert np.all(np.isfinite(np.asarray(g)))


class TestBoxProjection:
    def test_feasibility_and_optimality(self):
        rng = np.random.default_rng(6)
        lower, nominal = make_problem(rng, batch=32)
        h = -lower / 100.0
        upper = (20.0 * (1.0 - h)).astype(np.float32)
        v = np.asarray(_box(lower, upper, nominal))
        np.testing.assert_allclose(v.sum(-1), 0.0, atol=2e-4)
        assert np.all(v >= lower - 1e-6)
        assert np.all(v <= upper + 1e-6)
        v2 = np.asarray(_box(lower, upper, v))
        np.testing.assert_allclose(v, v2, atol=5e-4)

    def test_vjp_matches_finite_differences(self):
        rng = np.random.default_rng(7)
        lower, nominal = make_problem(rng, batch=5)
        h = -lower / 100.0
        upper = (5.0 * (1.0 - h)).astype(np.float32)
        grads = _box_grad(lower, upper, nominal)
        eps, rtol = 1e-3, 0.08
        args0 = [lower, upper, nominal]
        for arg in range(3):
            for _ in range(6):
                i = rng.integers(lower.shape[0])
                j = rng.integers(lower.shape[1])
                d = np.zeros_like(args0[arg])
                d[i, j] = eps
                ap = list(args0)
                am = list(args0)
                ap[arg] = args0[arg] + d
                am[arg] = args0[arg] - d
                fd = (_box_loss(*ap) - _box_loss(*am)) / (2 * eps)
                an = grads[arg][i, j]
                assert abs(fd - an) <= rtol * max(1.0, abs(fd)), (
                    f"arg{arg}[{i},{j}]: fd={fd:.5f} analytic={an:.5f}"
                )

    def test_vjp_matches_fd_with_both_bounds_active(self):
        """Rows clamping against BOTH bounds: every active coordinate pushes
        mu onto the free set only, so all three VJP blocks share the
        mean-over-free correction.  (The reference's backward normalizes by
        |~L|/|~U| instead, which finite differences refute on such rows —
        barrier_projection.py:178,196-209; we ship the exact Jacobian.)"""
        rng = np.random.default_rng(11)
        n = 6  # matches the _box_loss weight vector
        # two far-above-upper, two far-below-lower, two mid-box coordinates
        # per row => both bounds active AND a strict free set (asymmetric
        # bounds keep the solution away from degenerate exact-boundary
        # kinks, where the projection is genuinely non-differentiable)
        lower = np.full((4, n), -0.35, np.float32)
        upper = np.full((4, n), 0.25, np.float32)
        base = np.array([2.0, 1.5, -2.0, -1.7, 0.08, -0.05], np.float32)
        nominal = base + rng.normal(scale=0.02, size=(4, n)).astype(
            np.float32
        )
        v = np.asarray(_box(lower, upper, nominal))
        la = (v <= lower + 1e-6).sum(-1)
        ua = (v >= upper - 1e-6).sum(-1)
        assert (la > 0).all() and (ua > 0).all(), "fixture lost mixed rows"
        assert ((la + ua) < n).all(), "fixture lost free coordinates"
        grads = _box_grad(lower, upper, nominal)
        eps, rtol = 1e-3, 0.08
        args0 = [lower, upper, nominal]
        for arg in range(3):
            for i in range(4):
                for j in range(n):
                    d = np.zeros_like(args0[arg])
                    d[i, j] = eps
                    ap = list(args0)
                    am = list(args0)
                    ap[arg] = args0[arg] + d
                    am[arg] = args0[arg] - d
                    fd = (_box_loss(*ap) - _box_loss(*am)) / (2 * eps)
                    an = grads[arg][i, j]
                    assert abs(fd - an) <= rtol * max(1.0, abs(fd)), (
                        f"arg{arg}[{i},{j}]: fd={fd:.5f} analytic={an:.5f}"
                    )


import pytest


@pytest.mark.parametrize("method", ["exact", "sort"])
class TestExactConeMethod:
    """Closed-form rank-rule mu (pairwise and sort variants) vs oracles."""

    def test_matches_long_bisection_oracle(self, method):
        rng = np.random.default_rng(7)
        lower, nominal = make_problem(rng, batch=64)
        f = jax.jit(lambda l, n: simplex_cone_project(l, n, method=method))
        v = np.asarray(f(lower, nominal))
        np.testing.assert_allclose(v, exact_cone_project(lower, nominal),
                                   atol=2e-6)
        np.testing.assert_allclose(v.sum(-1), 0.0, atol=2e-6)
        assert np.all(v >= lower - 1e-6)

    def test_matches_bisect_method(self, method):
        rng = np.random.default_rng(8)
        lower, nominal = make_problem(rng, batch=32)
        fb = jax.jit(lambda l, n: simplex_cone_project(l, n))
        fe = jax.jit(lambda l, n: simplex_cone_project(l, n, method=method))
        np.testing.assert_allclose(np.asarray(fb(lower, nominal)),
                                   np.asarray(fe(lower, nominal)), atol=5e-6)

    def test_ties_and_degenerate_cases(self, method):
        # duplicated nominal values (rank ties) and s == 0 (all bounds
        # active: the only feasible point is v == lower == 0)
        lower = np.full((3, N), -0.5, np.float32)
        nominal = np.stack([
            np.full(N, 0.3, np.float32),                  # all tied
            np.array([1, 1, 1, -1, -1, -1], np.float32),  # two tie groups
            np.arange(N).astype(np.float32),
        ])
        f = jax.jit(lambda l, n: simplex_cone_project(l, n, method=method))
        v = np.asarray(f(lower, nominal))
        np.testing.assert_allclose(
            v, exact_cone_project(lower, nominal), atol=2e-6)
        z = np.zeros((2, N), np.float32)
        v0 = np.asarray(f(z, z + np.array([0.0, 1.0])[:, None]))
        np.testing.assert_allclose(v0, np.zeros_like(v0), atol=1e-6)

    def test_vjp_flows_through_exact_method(self, method):
        rng = np.random.default_rng(9)
        lower, nominal = make_problem(rng, batch=4)
        g = jax.jit(jax.grad(
            lambda n: jnp.sum(
                simplex_cone_project(lower, n, method=method) ** 2)
        ))(jnp.asarray(nominal))
        gb = jax.jit(jax.grad(
            lambda n: jnp.sum(simplex_cone_project(lower, n) ** 2)
        ))(jnp.asarray(nominal))
        np.testing.assert_allclose(np.asarray(g), np.asarray(gb), atol=2e-5)


def test_qp_method_env_resolution(monkeypatch):
    from fiode_tpu.ops.simplex_qp import qp_method_from_env

    monkeypatch.delenv("FIODE_QP_METHOD", raising=False)
    monkeypatch.delenv("FIODE_QP_EXACT", raising=False)
    assert qp_method_from_env() == "bisect"
    monkeypatch.setenv("FIODE_QP_EXACT", "1")
    assert qp_method_from_env() == "exact"
    monkeypatch.setenv("FIODE_QP_METHOD", "sort")  # explicit method wins
    assert qp_method_from_env() == "sort"
    monkeypatch.setenv("FIODE_QP_METHOD", "nonsense")  # falls through
    assert qp_method_from_env() == "exact"

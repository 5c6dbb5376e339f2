"""Control workload oracles: plant sanity (energy/jacobian/simulation),
interval soundness of the dynamics enclosure, LQR stabilisation, and a small
end-to-end train->certify run (SURVEY.md §4: segway closed loop stays in the
level band)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fiode_tpu.control.controllers import (
    ConstantController,
    LinearController,
    NNController,
    lqr_gain,
)
from fiode_tpu.control.certify_segway import certify_segway, vdot_cell_bounds
from fiode_tpu.control.lyapunov_ctrl import LyaQuadratic
from fiode_tpu.control.samplers import (
    SamplingPhiPhiDot,
    grid_uniform_3d,
    random_polytope,
    reject_sampling,
)
from fiode_tpu.control.systems import Segway
from fiode_tpu.control.train_segway import SegwayTrainConfig, train_segway
from fiode_tpu.verify.interval import IV


class TestSegwayPlant:
    def test_equilibrium(self):
        sys = Segway()
        x0 = jnp.zeros((1, 3))
        f = np.asarray(sys(x0, jnp.zeros((1, 1))))
        np.testing.assert_allclose(f, 0.0, atol=1e-6)

    def test_upright_unstable(self):
        sys = Segway()
        A, B = sys.jacobian(jnp.zeros((1, 3)), jnp.zeros((1, 1)))
        eig = np.linalg.eigvals(np.asarray(A[0]))
        assert eig.real.max() > 0.1, "inverted pendulum must be unstable"

    def test_lqr_stabilises(self):
        sys = Segway()
        K, _ = lqr_gain(sys, np.zeros(3), 10 * np.eye(3), np.eye(1))
        ctrl = LinearController(K)
        x0 = jnp.asarray([[0.1, 0.2, -0.1]])
        xs, _ = sys.simulate(x0, ctrl, np.linspace(0, 8, 20))
        final = np.asarray(xs[-1])
        assert np.abs(final).max() < 1e-2, final

    def test_interval_dynamics_sound(self):
        sys = Segway()
        key = jax.random.PRNGKey(0)
        c = jax.random.uniform(key, (16, 3), minval=-0.5, maxval=0.5)
        r = 0.05
        u_lo = -jnp.ones((16, 1))
        u_hi = jnp.ones((16, 1))
        f_iv = sys.dynamics_interval(IV(c - r, c + r), IV(u_lo, u_hi))
        for i in range(50):
            key, k1, k2 = jax.random.split(key, 3)
            x = c + jax.random.uniform(k1, c.shape, minval=-r, maxval=r)
            u = jax.random.uniform(k2, (16, 1), minval=-1.0, maxval=1.0)
            f = sys(x, u)
            assert bool(jnp.all(f >= f_iv.lo - 1e-4)), i
            assert bool(jnp.all(f <= f_iv.hi + 1e-4)), i


class TestControlSamplers:
    def test_polytope_sampler_in_polytope(self):
        key = jax.random.PRNGKey(1)
        etas = np.asarray(
            random_polytope(key, jnp.asarray([np.pi / 12]), 256)
        )
        phi, v, phi_dot = etas[:, 0], etas[:, 1], etas[:, 2]
        assert (np.abs(phi) <= np.pi / 12 + 1e-6).all()
        assert (phi_dot <= -2.0 * (v - 2.25) + 1e-4).all()

    def test_face_sampler(self):
        grid, rs = SamplingPhiPhiDot([10.0, 0.1, 2.0], [0.02, 0.05, 0.05], "lb")()
        assert grid is not None and len(grid) > 0
        phi, phi_dot = grid[:, 0], grid[:, 2]
        np.testing.assert_allclose(
            phi_dot, -10.0 * (phi + np.pi / 12), atol=1e-5
        )

    def test_reject_sampling(self):
        lya = LyaQuadratic(jnp.eye(3), jnp.zeros((1, 3)))
        g, *_ = grid_uniform_3d(np.array([0.5, 0.5, 0.5]), np.full(3, 0.1))
        kept = reject_sampling(g, lya, 0.1, 0.2)
        v = np.asarray(lya(jnp.asarray(kept)))[:, 0]
        assert ((v >= 0.1) & (v <= 0.2)).all()
        assert 0 < len(kept) < len(g)


class TestVdotBounds:
    def test_cell_bound_sound(self):
        key = jax.random.PRNGKey(2)
        ctrl = NNController.create(key, 3, 1, 8)
        Ws, bs = ctrl.dense_weights()
        sys = Segway()
        P = jnp.eye(3)
        cells = jax.random.uniform(
            jax.random.PRNGKey(3), (8, 3), minval=-0.3, maxval=0.3
        )
        hw = 0.01
        lb, ub = vdot_cell_bounds(sys, Ws, bs, P, cells, hw)
        lya = LyaQuadratic(P, jnp.zeros((1, 3)))
        for _ in range(30):
            key, k = jax.random.split(key)
            x = cells + jax.random.uniform(k, cells.shape, minval=-hw, maxval=hw)
            vd = lya.h_dot(x, sys(x, ctrl(x)))[:, 0]
            assert bool(jnp.all(vd <= ub + 1e-4))
            assert bool(jnp.all(vd >= lb - 1e-4))

    def test_cell_bound_sound_mixed_sign_P(self):
        """A trained P always has mixed-sign PᵀP rows — the regime where
        the old two-corner gradient interval under-covered and could
        certify violated cells."""
        key = jax.random.PRNGKey(7)
        ctrl = NNController.create(key, 3, 1, 8)
        Ws, bs = ctrl.dense_weights()
        sys = Segway()
        P = jnp.asarray([[1.2, -0.7, 0.3],
                         [0.0, 0.9, -0.5],
                         [0.2, 0.1, 1.1]])
        cells = jax.random.uniform(
            jax.random.PRNGKey(8), (8, 3), minval=-0.3, maxval=0.3
        )
        hw = 0.05
        lb, ub = vdot_cell_bounds(sys, Ws, bs, P, cells, hw)
        lya = LyaQuadratic(P, jnp.zeros((1, 3)))
        # corner sweep: for the bilinear Vdot the adversarial states
        # concentrate at cell corners
        import itertools

        for signs in itertools.product([-1.0, 1.0], repeat=3):
            x = cells + hw * jnp.asarray(signs)
            vd = lya.h_dot(x, sys(x, ctrl(x)))[:, 0]
            assert bool(jnp.all(vd <= ub + 1e-4)), "upper bound violated"
            assert bool(jnp.all(vd >= lb - 1e-4)), "lower bound violated"

    def test_iv_dot_sound_and_tight_for_linear_maps(self):
        from fiode_tpu.verify.interval import IV, iv_dot
        import itertools

        rng = np.random.default_rng(0)
        M = rng.normal(size=(4, 3)).astype(np.float32)
        lo = rng.normal(size=(5, 3)).astype(np.float32)
        hi = lo + rng.uniform(0.1, 1.0, size=(5, 3)).astype(np.float32)
        out = iv_dot(IV(jnp.asarray(lo), jnp.asarray(hi)), jnp.asarray(M))
        # a linear map attains its extremes at box corners: the exact range
        # is the corner min/max, and iv_dot must equal it
        corners = np.stack([
            np.where(np.asarray(s, bool), hi, lo)
            for s in itertools.product([0, 1], repeat=3)
        ])  # (8, 5, 3)
        imgs = corners @ M.T  # (8, 5, 4)
        np.testing.assert_allclose(np.asarray(out.lo), imgs.min(0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out.hi), imgs.max(0), rtol=1e-5)


class TestEndToEnd:
    def test_segway_resume_matches_uninterrupted(self, tmp_path):
        """A killed-and-resumed segway training replays the exact
        uninterrupted trajectory (full phase/iter/optimizer/PRNG state in
        SAVE.resume.pkl)."""
        small = dict(fit_lqr_iters=6, barrier_iters=8, grid_r=0.3,
                     batch_size=64, adv_train=True, eps=0.01)
        full = train_segway(
            SegwayTrainConfig(**small), verbose=False,
        )
        # "kill" after 4 barrier iters (checkpoint written at iter 4),
        # then resume to the full budget
        p = str(tmp_path / "seg.pkl")
        train_segway(
            SegwayTrainConfig(**{**small, "barrier_iters": 4}),
            save_path=p, verbose=False, checkpoint_every=4,
        )
        resumed = train_segway(
            SegwayTrainConfig(**small), save_path=p, verbose=False,
            resume=True, checkpoint_every=4,
        )
        assert resumed["best_loss"] == full["best_loss"]
        for a, b in zip(
            jax.tree_util.tree_leaves(full["ctrl"]),
            jax.tree_util.tree_leaves(resumed["ctrl"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(
            np.asarray(full["P"]), np.asarray(resumed["P"])
        )

    def test_train_and_certify_small(self, tmp_path):
        cfg = SegwayTrainConfig(
            fit_lqr_iters=60, barrier_iters=60, grid_r=0.15,
            batch_size=128, adv_train=True, eps=0.01,
        )
        result = train_segway(cfg, save_path=str(tmp_path / "segway.pkl"),
                              verbose=False)
        assert np.isfinite(result["best_loss"])
        res = certify_segway(
            str(tmp_path / "segway.pkl"), r=0.1,
            simulate_trajectories=True, verbose=False,
            plot_dir=str(tmp_path / "plots"),
        )
        assert res.n_cells > 0
        # certify-time figures (reference certify_segway.py:69-139)
        assert (tmp_path / "plots" / "segway_vdot_phase.png").exists()
        assert np.isfinite(res.ub_max)
        # the certificate itself may or may not pass after a tiny training
        # run; what must hold is consistency: if certified, simulated
        # trajectories starting below the level cannot blow far past it
        if res.certified and res.traj_max_level_drift is not None:
            assert res.traj_max_level_drift < 0.5

"""Simplex visualisation: project 3-class states to 2-D and plot samples /
trajectories (the reference's per-epoch wandb media for 3-class runs,
utils.py:30-140, pl_modules.py:508-523).

matplotlib-based (plotly is not in this image); every function degrades to a
no-op returning None when matplotlib is unavailable.  Figures can be saved
to the run directory by the caller or via ``save``.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _HAVE_MPL = True
except Exception:  # pragma: no cover
    _HAVE_MPL = False

__all__ = ["plot_samples_on_3_simplex", "plot_traj_on_3_simplex",
           "plot_segway_phase", "plot_segway_traj3d"]

# barycentric projection: vertex i of the 3-simplex -> 2-D corner
_TRANSFORM = np.array([[0.0, 0.5, 1.0], [0.0, np.sqrt(3) / 2, 0.0]])


def _project(h):
    return np.asarray(h) @ _TRANSFORM.T


def _draw_triangle(ax):
    corners = _project(np.eye(3))
    loop = np.vstack([corners, corners[:1]])
    ax.plot(loop[:, 0], loop[:, 1], "r-", lw=1)


def plot_samples_on_3_simplex(h_sample, labels=None, save: Optional[str] = None):
    """Scatter of (N, 3) simplex points inside the triangle."""
    if not _HAVE_MPL:
        return None
    pts = _project(h_sample)
    fig, ax = plt.subplots(figsize=(5, 4.5))
    if labels is not None:
        sc = ax.scatter(pts[:, 0], pts[:, 1], c=np.asarray(labels), s=6,
                        cmap="tab10")
        fig.colorbar(sc, ax=ax)
    else:
        ax.scatter(pts[:, 0], pts[:, 1], s=6)
    _draw_triangle(ax)
    ax.set_aspect("equal")
    ax.set_title("h samples on the 3-simplex")
    if save:
        fig.savefig(save, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_traj_on_3_simplex(traj, labels, save: Optional[str] = None):
    """Trajectories (T, N, 3) coloured by label."""
    if not _HAVE_MPL:
        return None
    traj = np.asarray(traj)
    labels = np.asarray(labels)
    fig, ax = plt.subplots(figsize=(5, 4.5))
    cmap = plt.get_cmap("tab10")
    for i in range(traj.shape[1]):
        pts = _project(traj[:, i])
        ax.plot(pts[:, 0], pts[:, 1], lw=0.8, color=cmap(int(labels[i]) % 10))
        ax.scatter(pts[-1:, 0], pts[-1:, 1], s=14, marker="s",
                   color=cmap(int(labels[i]) % 10))
    _draw_triangle(ax)
    ax.set_aspect("equal")
    ax.set_title("ODE trajectories on the 3-simplex")
    if save:
        fig.savefig(save, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_segway_phase(lya, vdot_fn, *, phi_region, region, level, level_lb,
                      level_ub, save: Optional[str] = None, n=80,
                      f_fn=None):
    """phi x phi_dot contour of Vdot with the level-band curves and (when
    ``f_fn`` is given) closed-loop streamlines on the v=0 slice
    (the reference's certify-time contour + streamline plots,
    certify_segway.py:69-101)."""
    if not _HAVE_MPL:
        return None
    import jax.numpy as jnp

    phi = np.linspace(-phi_region, phi_region, n)
    pd = np.linspace(-region, region, n)
    P, D = np.meshgrid(phi, pd)
    pts = np.stack([P.reshape(-1), np.zeros(P.size), D.reshape(-1)], 1)
    vd = np.asarray(vdot_fn(jnp.asarray(pts, jnp.float32))).reshape(P.shape)
    lv = np.asarray(lya(jnp.asarray(pts, jnp.float32)))[:, 0].reshape(P.shape)
    fig, ax = plt.subplots(figsize=(6, 5))
    c1 = ax.contourf(P, D, vd, levels=8, alpha=0.5, cmap="coolwarm")
    if f_fn is not None:
        # state ordering (phi, v, phi_dot): the phase-plane flow is
        # (dphi/dt, dphi_dot/dt) = (f[0], f[2])
        f = np.asarray(f_fn(jnp.asarray(pts, jnp.float32)))
        ax.streamplot(P, D, f[:, 0].reshape(P.shape),
                      f[:, 2].reshape(P.shape),
                      color="0.35", density=1.0, linewidth=0.6,
                      arrowsize=0.8)
    ax.contour(P, D, lv, [level], colors="k")
    ax.contour(P, D, lv, [level_lb, level_ub], colors="k",
               linestyles="dashed", linewidths=1.0)
    fig.colorbar(c1, ax=ax)
    ax.set_xlabel(r"$\phi$")
    ax.set_ylabel(r"$\dot\phi$")
    ax.set_title(r"$\dot V$ on the $v=0$ slice; level band dashed")
    if save:
        fig.savefig(save, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_segway_traj3d(xs, level_band_pts=None, save: Optional[str] = None):
    """3-D closed-loop trajectories (T, N, 3) with optional band-cell
    scatter (the reference's 3-D trajectory figure,
    certify_segway.py:103-139)."""
    if not _HAVE_MPL:
        return None
    xs = np.asarray(xs)
    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(projection="3d")
    if level_band_pts is not None:
        pts = np.asarray(level_band_pts)
        if len(pts) > 2000:
            pts = pts[:: max(1, len(pts) // 2000)]
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1, alpha=0.08,
                   color="tab:gray", label="certified band cells")
    cmap = plt.get_cmap("tab10")
    for i in range(xs.shape[1]):
        ax.plot(xs[:, i, 0], xs[:, i, 1], xs[:, i, 2], lw=1.0,
                color=cmap(i % 10))
        ax.scatter(*xs[0, i], marker="o", s=20, color=cmap(i % 10))
        ax.scatter(*xs[-1, i], marker="s", s=20, color=cmap(i % 10))
    ax.set_xlabel(r"$\phi$")
    ax.set_ylabel(r"$v$")
    ax.set_zlabel(r"$\dot\phi$")
    ax.set_title("closed-loop trajectories (o start, s end)")
    if save:
        fig.savefig(save, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig

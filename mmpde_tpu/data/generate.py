"""Dataset generation.

The reference consumes two pre-made datasets that are NOT shipped with it
(mesh/data/burgers_192.npy and mesh/data/cylinder_rot_tri, loaded at
mmpde.py:162-175 / mesh/dmm.py:71-81).  To keep the framework runnable
end-to-end we generate equivalents on device and cache them under ``data/``:

* Burgers 2-D: scalar viscous Burgers  u_t + u (u_x + u_y) = nu * lap(u)
  on the periodic unit square, pseudo-spectral (FFT) with integrating-factor
  RK4 time stepping, 100 trajectories x 31 snapshots x 192 x 192 — matching
  the reference file's layout (N, T, 192, 192).
* Cylinder: a synthetic rotating vortex-street field sampled on a fixed
  quasi-uniform scattered mesh of 2521 nodes with a circular hole,
  100 trajectories x 40 frames x 2521 nodes x 5 channels
  [x, y, field, vel_x, vel_y] with coords in [0, 0.5]^2 (the loader scales
  by 2, like the reference's ``data[:, :, :, :2] *= 2``, mmpde.py:164).

Generation is deterministic given the seed.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np


def _burgers_batch(key, n_traj: int, nt: int, s: int, tmax: float,
                   nu: float, sub_steps: int):
    """Solve a batch of 2-D Burgers trajectories on device. Returns [n,nt,s,s]."""
    import jax
    import jax.numpy as jnp

    kx = jnp.fft.fftfreq(s, 1.0 / s) * 2 * jnp.pi
    KX, KY = jnp.meshgrid(kx, kx, indexing="ij")
    K2 = KX ** 2 + KY ** 2
    # 2/3 dealiasing
    cutoff = s // 3
    dealias = ((jnp.abs(KX) / (2 * jnp.pi) < cutoff) &
               (jnp.abs(KY) / (2 * jnp.pi) < cutoff))

    dt = tmax / ((nt - 1) * sub_steps)
    efull = jnp.exp(-nu * K2 * dt)
    ehalf = jnp.exp(-nu * K2 * dt / 2.0)

    # complex values are built ON DEVICE from real parts (lax.complex):
    # the remote-TPU plugin cannot transfer complex literals (UNIMPLEMENTED),
    # which previously pinned generation to the host CPU — 1 core, ~2 h for
    # the full set vs minutes on the chip
    ikx = jax.lax.complex(jnp.zeros_like(KX), KX)
    iky = jax.lax.complex(jnp.zeros_like(KY), KY)

    def nonlinear(uh):
        u = jnp.fft.ifft2(uh).real
        ux = jnp.fft.ifft2(ikx * uh).real
        uy = jnp.fft.ifft2(iky * uh).real
        return -jnp.fft.fft2(u * (ux + uy)) * dealias

    def rk4_step(uh, _):
        # integrating-factor RK4 (diffusion handled exactly by the
        # exponential factors, Kassam-Trefethen style)
        k1 = nonlinear(uh)
        k2 = nonlinear((uh + 0.5 * dt * k1) * ehalf)
        k3 = nonlinear(uh * ehalf + 0.5 * dt * k2)
        k4 = nonlinear((uh * ehalf + dt * k3) * ehalf)
        uh_new = (uh * efull + dt / 6.0 *
                  (k1 * efull + 2 * (k2 + k3) * ehalf + k4))
        return uh_new, None

    def snapshot_step(uh, _):
        uh, _ = jax.lax.scan(rk4_step, uh, None, length=sub_steps)
        return uh, jnp.fft.ifft2(uh).real.astype(jnp.float32)

    def init_field(k):
        # random low-wavenumber Fourier field, amplitude ~0.2
        k1, k2 = jax.random.split(k)
        nmodes = 4
        amp = jax.random.normal(k1, (2 * nmodes + 1, 2 * nmodes + 1, 2))
        idx = jnp.arange(-nmodes, nmodes + 1)
        decay = jnp.exp(-0.5 * (idx[:, None] ** 2 + idx[None, :] ** 2) / 2.0**2)
        # scatter the low-mode block into REAL planes (complex scatter is
        # unimplemented on the TPU backend), combine with lax.complex
        re = jnp.zeros((s, s), jnp.float32).at[
            idx[:, None], idx[None, :]].set(amp[..., 0] * decay)
        im = jnp.zeros((s, s), jnp.float32).at[
            idx[:, None], idx[None, :]].set(amp[..., 1] * decay)
        u = jnp.fft.ifft2(jax.lax.complex(re, im)).real
        u = u / (jnp.std(u) + 1e-8) * 0.2
        return u

    keys = jax.random.split(key, n_traj)
    u0 = jax.vmap(init_field)(keys)
    uh0 = jnp.fft.fft2(u0)

    def solve_one(uh):
        _, snaps = jax.lax.scan(snapshot_step, uh, None, length=nt - 1)
        first = jnp.fft.ifft2(uh).real.astype(jnp.float32)
        return jnp.concatenate([first[None], snaps], axis=0)

    return jax.jit(jax.vmap(solve_one))(uh0)


def generate_burgers(n_traj: int = 100, nt: int = 31, s: int = 192,
                     tmax: float = 30.0, nu: float = 0.005,
                     sub_steps: int = 200, seed: int = 0,
                     batch: int = 20) -> np.ndarray:
    """Generate Burgers trajectories; returns float32 [n_traj, nt, s, s].

    Attempts the default accelerator first: every complex value in the
    solver is constructed on device from real parts (lax.complex) to
    sidestep the remote-TPU plugin's complex-literal transfer limitation.
    Falls back to the host CPU on any backend error (the remote axon
    backend still rejects parts of the complex FFT path as UNIMPLEMENTED);
    results are identical either way (same key derivation).
    """
    import jax

    # advective CFL floor: with |u| ~ 0.3 the integrating-factor RK4 goes
    # NaN when dt > ~dx/|u|; raise sub_steps so dt <= 0.5*dx/0.3.  The
    # full-size default (s=192, sub_steps=200) already satisfies this
    # (floor 116) — only under-resolved smoke-test configs are lifted.
    dt_max = 0.5 * (1.0 / s) / 0.3
    min_sub = int(np.ceil(tmax / (nt - 1) / dt_max))
    sub_steps = max(sub_steps, min_sub)

    def run(device):
        out = []
        with jax.default_device(device):
            # the key must be created INSIDE the device context: a key
            # resident on the remote TPU cannot be copied back to CPU
            # (UNIMPLEMENTED), which used to break the fallback path
            key = jax.random.PRNGKey(seed)
            for i in range(0, n_traj, batch):
                sub = min(batch, n_traj - i)
                out.append(np.asarray(_burgers_batch(
                    jax.random.fold_in(key, i), sub, nt, s, tmax, nu,
                    sub_steps)))
        return np.concatenate(out, axis=0)

    dev = jax.devices()[0]
    if dev.platform != "cpu":
        try:
            return run(dev)
        except Exception as e:  # pragma: no cover - backend-specific
            print(f"[mmpde_tpu] accelerator generation failed ({e!r}); "
                  "falling back to CPU")
    return run(jax.devices("cpu")[0])


def _cylinder_mesh(n_nodes: int, seed: int) -> np.ndarray:
    """Quasi-uniform scattered mesh on [0, 0.5]^2 with a circular hole."""
    rng = np.random.default_rng(seed)
    center = np.array([0.125, 0.25])
    radius = 0.04
    pts = []
    # jittered grid oversampled, then carve the hole and subsample
    m = int(np.ceil(np.sqrt(n_nodes * 1.4)))
    xs = (np.arange(m) + 0.5) / m * 0.5
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    cand = np.stack([gx.ravel(), gy.ravel()], -1)
    cand = cand + rng.uniform(-0.2, 0.2, cand.shape) * (0.5 / m)
    cand = np.clip(cand, 0.0, 0.5)
    dist = np.linalg.norm(cand - center, axis=-1)
    cand = cand[dist > radius]
    # ring of nodes on the cylinder surface
    n_ring = 40
    theta = np.linspace(0, 2 * np.pi, n_ring, endpoint=False)
    ring = center + (radius + 0.002) * np.stack(
        [np.cos(theta), np.sin(theta)], -1)
    pts = np.concatenate([ring, cand], axis=0)
    idx = rng.permutation(len(pts) - n_ring)[: n_nodes - n_ring] + n_ring
    pts = np.concatenate([pts[:n_ring], pts[idx]], axis=0)
    return pts.astype(np.float32)


def generate_cylinder(n_traj: int = 100, nt: int = 40, n_nodes: int = 2521,
                      seed: int = 0) -> np.ndarray:
    """Synthetic vortex-street data [n_traj, nt, n_nodes, 5]."""
    rng = np.random.default_rng(seed)
    mesh = _cylinder_mesh(n_nodes, seed)  # [n, 2] in [0, 0.5]^2
    x, y = mesh[:, 0], mesh[:, 1]
    center = np.array([0.125, 0.25])
    out = np.zeros((n_traj, nt, n_nodes, 5), dtype=np.float32)
    out[..., 0] = x
    out[..., 1] = y
    ts = np.linspace(0.0, 1.0, nt)
    for i in range(n_traj):
        freq = rng.uniform(2.0, 4.0)
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.8, 1.2)
        speed = rng.uniform(0.25, 0.4)
        sigma = rng.uniform(0.02, 0.035)
        n_vort = 6
        for t_i, t in enumerate(ts):
            field = np.zeros(n_nodes, dtype=np.float64)
            velx = np.zeros(n_nodes, dtype=np.float64)
            vely = np.zeros(n_nodes, dtype=np.float64)
            for v in range(n_vort):
                # vortices shed alternately above/below, advecting downstream
                sgn = 1.0 if v % 2 == 0 else -1.0
                x0 = center[0] + 0.02 + np.mod(
                    speed * t + v * speed / freq, 0.45)
                y0 = center[1] + sgn * 0.03 * np.sin(
                    2 * np.pi * freq * t + phase + v)
                r2 = (x - x0) ** 2 + (y - y0) ** 2
                g = sgn * amp * np.exp(-r2 / (2 * sigma ** 2))
                field += g
                velx += -g * (y - y0) / sigma
                vely += g * (x - x0) / sigma
            out[i, t_i, :, 2] = field
            out[i, t_i, :, 3] = velx
            out[i, t_i, :, 4] = vely
    return out


def _cached_n_traj(path: str) -> int:
    try:
        return np.load(path, mmap_mode="r").shape[0]
    except Exception:
        return 0


def ensure_burgers(path: str = "data/burgers_192.npy", **kw) -> str:
    """Generate-and-cache the Burgers dataset; returns the file path.

    Regenerates if a cached file holds fewer trajectories than requested
    (e.g. a small smoke-test cache must not silently serve a full run).
    """
    want = kw.get("n_traj", 100)
    if not os.path.exists(path) or _cached_n_traj(path) < want:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        print(f"[mmpde_tpu] generating Burgers dataset -> {path} "
              "(reference data not shipped; see mmpde_tpu/data/generate.py)")
        arr = generate_burgers(**kw)
        np.save(path, arr)
    return path


def ensure_cylinder(path: str = "data/cylinder_rot_tri.npy", **kw) -> str:
    want = kw.get("n_traj", 100)
    if not os.path.exists(path) or _cached_n_traj(path) < want:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        print(f"[mmpde_tpu] generating cylinder dataset -> {path}")
        arr = generate_cylinder(**kw)
        np.save(path, arr)
    return path

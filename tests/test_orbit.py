"""Marching-orbit closed form vs the reference recurrence.

The traversal replaces the reference's sequential marching
``t += clamp(t * cone_angle, step, 1e10)`` (grid.cu:23-28) with a closed
form; these tests check exact agreement for uniform and cone stepping, and
that the index inverse is consistent.
"""
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.grid import _orbit_index, _orbit_t


def _reference_orbit(near, step, cone, n):
    ts = [near]
    t = near
    for _ in range(n):
        dt = np.clip(t * cone, step, 1e10) if cone > 0 else step
        t = t + dt
        ts.append(t)
    return np.asarray(ts)


def test_orbit_uniform():
    near = jnp.array([0.0, 0.3, 2.0])
    k = jnp.arange(100)[None, :]
    t = _orbit_t(near, k, 5e-3, 0.0)
    for i, nr in enumerate([0.0, 0.3, 2.0]):
        ref = _reference_orbit(nr, 5e-3, 0.0, 99)
        np.testing.assert_allclose(np.asarray(t[i]), ref, rtol=1e-6)


def test_orbit_cone():
    step, cone = 1e-3, 0.004
    near = jnp.array([0.0, 0.1, 0.2, 0.5, 3.0])
    k = jnp.arange(400)[None, :]
    t = _orbit_t(near, k, step, cone)
    for i, nr in enumerate(np.asarray(near)):
        ref = _reference_orbit(float(nr), step, cone, 399)
        np.testing.assert_allclose(np.asarray(t[i]), ref, rtol=2e-4)


def test_orbit_index_inverse():
    step, cone = 1e-3, 0.004
    near = jnp.full((1,), 0.2)
    ks = jnp.arange(300)[None, :]
    t = _orbit_t(near, ks, step, cone)
    mids = 0.5 * (t[:, :-1] + t[:, 1:])
    # smallest k with m_k >= target must be recovered for targets just
    # above each midpoint
    targets = np.asarray(mids[0]) + 1e-7
    for k in range(0, 299, 37):
        k_rec = int(_orbit_index(near, jnp.asarray([targets[k]]), step, cone)[0])
        assert abs(k_rec - k) <= 1, (k, k_rec)


def test_orbit_index_uniform_inverse():
    step = 5e-3
    near = jnp.full((1,), 0.7)
    ks = jnp.arange(200)[None, :]
    t = _orbit_t(near, ks, step, 0.0)
    mids = 0.5 * (t[:, :-1] + t[:, 1:])
    targets = np.asarray(mids[0]) + 1e-7
    for k in range(0, 199, 23):
        k_rec = int(_orbit_index(near, jnp.asarray([targets[k]]), step, 0.0)[0])
        assert abs(k_rec - k) <= 1, (k, k_rec)

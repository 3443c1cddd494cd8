import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_slam import geometry as geo


def rand_pose(rng, shape=()):
    p = rng.uniform(-3, 3, size=shape + (3,))
    p[..., 2] = rng.uniform(-np.pi, np.pi, size=shape)
    return jnp.asarray(p, dtype=jnp.float32)


def test_compose_inverse_identity(rng):
    a = rand_pose(rng, (16,))
    ident = geo.compose(geo.inverse(a), a)
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-5)


def test_compose_associative(rng):
    a, b, c = (rand_pose(rng, (8,)) for _ in range(3))
    lhs = geo.compose(geo.compose(a, b), c)
    rhs = geo.compose(a, geo.compose(b, c))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_matrix_roundtrip(rng):
    a = rand_pose(rng, (8,))
    np.testing.assert_allclose(
        np.asarray(geo.from_matrix(geo.to_matrix(a))), np.asarray(a), atol=1e-5
    )


def test_compose_matches_matrix_product(rng):
    a, b = rand_pose(rng, (8,)), rand_pose(rng, (8,))
    m = geo.to_matrix(a) @ geo.to_matrix(b)
    np.testing.assert_allclose(
        np.asarray(geo.compose(a, b)), np.asarray(geo.from_matrix(m)), atol=1e-4
    )


def test_apply_points(rng):
    pose = jnp.array([1.0, 2.0, np.pi / 2])
    pts = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    out = geo.apply(pose, pts)
    np.testing.assert_allclose(
        np.asarray(out), [[1.0, 3.0], [0.0, 2.0]], atol=1e-6
    )


def test_apply_batched(rng):
    poses = rand_pose(rng, (4,))
    pts = jnp.asarray(rng.uniform(-1, 1, size=(4, 7, 2)), dtype=jnp.float32)
    out = geo.apply(poses, pts)
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(out[i]),
            np.asarray(geo.apply(poses[i], pts[i])),
            atol=1e-5,
        )


def test_exp_log_roundtrip(rng):
    v = jnp.asarray(rng.uniform(-1, 1, size=(32, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(geo.log(geo.exp(v))), np.asarray(v), atol=1e-4
    )


def test_exp_zero_rotation():
    v = jnp.array([1.0, -2.0, 0.0])
    np.testing.assert_allclose(np.asarray(geo.exp(v)), [1.0, -2.0, 0.0], atol=1e-6)


def test_interpolate_endpoints(rng):
    a, b = rand_pose(rng), rand_pose(rng)
    np.testing.assert_allclose(
        np.asarray(geo.interpolate(a, b, 0.0)), np.asarray(a), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(geo.interpolate(a, b, 1.0)), np.asarray(b), atol=1e-5
    )


def test_interpolate_wraps_angle():
    a = jnp.array([0.0, 0.0, 3.0])
    b = jnp.array([0.0, 0.0, -3.0])  # shortest path crosses pi
    mid = geo.interpolate(a, b, 0.5)
    assert abs(abs(float(mid[2])) - np.pi) < 0.15


def test_jit_and_vmap(rng):
    a, b = rand_pose(rng, (8,)), rand_pose(rng, (8,))
    f = jax.jit(geo.compose)
    np.testing.assert_allclose(
        np.asarray(f(a, b)), np.asarray(geo.compose(a, b)), atol=1e-6
    )
    g = jax.vmap(geo.compose)
    np.testing.assert_allclose(
        np.asarray(g(a, b)), np.asarray(geo.compose(a, b)), atol=1e-6
    )

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nopesac_tpu.core import geometry as geo


def rand_unit_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuatToRotmat:
    def test_identity(self):
        r = geo.quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-6)

    def test_orthogonal(self):
        rng = np.random.default_rng(0)
        q = rand_unit_quat(rng, (16,))
        r = np.asarray(geo.quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(r @ np.swapaxes(r, -1, -2), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), np.ones(16), atol=1e-5)

    def test_known_90deg_z(self):
        # 90 deg about z: q = (cos45, 0, 0, sin45); rotates x->y
        q = jnp.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
        r = np.asarray(geo.quat_to_rotmat(q))
        np.testing.assert_allclose(r @ np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), atol=1e-6)

    def test_composition_matches_quat_multiply(self):
        rng = np.random.default_rng(1)
        q1 = jnp.asarray(rand_unit_quat(rng, (8,)))
        q2 = jnp.asarray(rand_unit_quat(rng, (8,)))
        r12 = geo.quat_to_rotmat(geo.quat_multiply(q1, q2))
        np.testing.assert_allclose(
            np.asarray(r12), np.asarray(geo.quat_to_rotmat(q1) @ geo.quat_to_rotmat(q2)), atol=1e-5
        )

    def test_roundtrip_rotmat_to_quat(self):
        rng = np.random.default_rng(2)
        q = rand_unit_quat(rng, (32,))
        q = np.where(q[:, :1] >= 0, q, -q)  # canonical sign
        r = geo.quat_to_rotmat(jnp.asarray(q))
        q2 = np.asarray(geo.rotmat_to_quat(r))
        q2 = np.where(q2[:, :1] >= 0, q2, -q2)
        np.testing.assert_allclose(q2, q, atol=1e-5)


class TestQuatFromRotvec:
    def test_matches_rotmat(self):
        rng = np.random.default_rng(3)
        rv = rng.normal(size=(16, 3))
        q = geo.quat_from_rotvec(jnp.asarray(rv))
        r = np.asarray(geo.quat_to_rotmat(q))
        # independent Rodrigues formula
        theta = np.linalg.norm(rv, axis=-1, keepdims=True)
        k = rv / np.maximum(theta, 1e-12)
        K = np.zeros((16, 3, 3))
        K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
        K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
        K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
        th = theta[:, :, None]
        r_ref = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        np.testing.assert_allclose(r, r_ref, atol=1e-5)

    def test_zero_rotvec(self):
        q = np.asarray(geo.quat_from_rotvec(jnp.zeros(3)))
        np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-7)


class TestWarpPlanes:
    def test_matches_analytic_plane_transform(self):
        """warp(n*d) must equal the analytic rigid transform of the plane:
        n' = R n, d' = d + n'.t  (for the flipped plane param)."""
        rng = np.random.default_rng(4)
        q = rand_unit_quat(rng, (6,))
        t = rng.normal(size=(6, 3))
        planes = rng.normal(size=(6, 10, 3)) * 2.0

        out = np.asarray(geo.warp_planes_to_global(jnp.asarray(planes), jnp.asarray(q), jnp.asarray(t)))

        flipped = planes * np.array([1.0, -1.0, -1.0])
        d = np.linalg.norm(flipped, axis=-1)
        n = flipped / np.maximum(d[..., None], 1e-12)
        r = np.asarray(geo.quat_to_rotmat(jnp.asarray(q)))
        n_new = np.einsum("bij,bpj->bpi", r, n)
        d_new = d + np.einsum("bpi,bi->bp", n_new, t)
        expected = n_new * d_new[..., None]
        np.testing.assert_allclose(out, expected, atol=1e-3)

    def test_identity_pose_is_flip(self):
        rng = np.random.default_rng(5)
        planes = jnp.asarray(rng.normal(size=(2, 5, 3)))
        q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        t = jnp.zeros((2, 3))
        out = geo.warp_planes_to_global(planes, q, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(geo.warp_planes_identity(planes)), atol=1e-3)

    def test_vmap_over_hypotheses(self):
        """The NOPE-SAC hot path: [B, H, P, 3] planes warped by [B, H] poses."""
        rng = np.random.default_rng(6)
        B, H, P = 2, 51, 50
        planes = jnp.asarray(rng.normal(size=(B, P, 3)))
        q = jnp.asarray(rand_unit_quat(rng, (B, H)))
        t = jnp.asarray(rng.normal(size=(B, H, 3)))
        warp_h = jax.vmap(geo.warp_planes_to_global, in_axes=(None, 1, 1), out_axes=1)
        out = warp_h(planes, q, t)
        assert out.shape == (B, H, P, 3)
        # spot-check one hypothesis
        one = geo.warp_planes_to_global(planes, q[:, 7], t[:, 7])
        np.testing.assert_allclose(np.asarray(out[:, 7]), np.asarray(one), atol=1e-5)


class TestMisc:
    def test_canonicalize_sign(self):
        q = jnp.array([[-0.5, 0.5, 0.5, 0.5], [0.5, -0.5, -0.5, -0.5]])
        out = np.asarray(geo.canonicalize_quat_sign(q))
        assert (out[:, 0] >= 0).all()
        np.testing.assert_allclose(out[0], -np.asarray(q[0]))
        np.testing.assert_allclose(out[1], np.asarray(q[1]))

    def test_rotmat_from_euler_identity(self):
        r = np.asarray(geo.rotmat_from_euler_deg(jnp.zeros(1), jnp.zeros(1), jnp.zeros(1)))
        np.testing.assert_allclose(r[0], np.eye(3), atol=1e-6)

    def test_rotation_geodesic(self):
        q1 = jnp.array([[1.0, 0, 0, 0]])
        ang = np.deg2rad(40.0)
        q2 = jnp.array([[np.cos(ang / 2), 0, 0, np.sin(ang / 2)]])
        err = np.asarray(geo.rotation_geodesic_deg(q1, q2))
        np.testing.assert_allclose(err, [40.0], atol=1e-4)
        # sign-flip invariance
        err2 = np.asarray(geo.rotation_geodesic_deg(q1, -q2))
        np.testing.assert_allclose(err2, [40.0], atol=1e-4)

    def test_coordinate_map(self):
        m = np.asarray(geo.get_coordinate_map(h=4, w=4))
        assert m.shape == (3, 4, 4)
        # ray through principal point ~ (0, 0, 1): pixel (x=2,y=2)*160 = (320,240)
        np.testing.assert_allclose(m[:, 2, 2], [0, 0, 1.0], atol=1e-5)


def test_np_rotmat_to_quat_matches_jax():
    """utils.np_geometry.rotmat_to_quat (host twin for jax-free tools) agrees
    with core.geometry.rotmat_to_quat on random rotations."""
    from nopesac_tpu.core.geometry import rotmat_to_quat as j_r2q
    from nopesac_tpu.utils.np_geometry import quat_to_rotmat, rotmat_to_quat as np_r2q

    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        m = quat_to_rotmat(q)
        qn = np_r2q(m)
        qj = np.asarray(j_r2q(jnp.asarray(m[None]))[0])
        # quaternion double cover: compare up to sign
        if np.dot(qn, qj) < 0:
            qj = -qj
        np.testing.assert_allclose(qn, qj, atol=1e-5)
        if np.dot(qn, q) < 0:
            qn = -qn
        np.testing.assert_allclose(qn, q, atol=1e-6)

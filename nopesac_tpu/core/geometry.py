"""Core 3D geometry kernels, TPU-first.

Every function here is a pure, shape-polymorphic jnp function designed to be
`vmap`ped / `jit`ted, replacing the three duplicated torch implementations in
the reference (warp: camera_head.py:1427-1465, matching_head.py:141-180,
camera_modules.py:164-197; quat->R: camera_modules.py:120-162 et al.).

Conventions (identical to the reference, NOPE-SAC / SparsePlanes):
  * Planes are parameterised as ``n * d`` (unit normal times offset), a 3-vec.
  * Relative camera pose is (translation[3], quaternion[4] w-first), with the
    quaternion sign canonicalised to w >= 0 at several points in the pipeline.
  * Plane params live in "suncg" camera axes; warping to the global (habitat)
    frame flips the y/z axes via ``[1, -1, -1]`` (camera_head.py:1448).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# suncg -> habitat axis flip applied to plane parameters before SE(3) warps.
SUNCG_TO_HABITAT = (1.0, -1.0, -1.0)


def _flip(planes: jax.Array) -> jax.Array:
    return planes * jnp.asarray(SUNCG_TO_HABITAT, dtype=planes.dtype)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Quaternion (w, x, y, z) -> rotation matrix; q: [..., 4] -> [..., 3, 3].

    Matches camera_modules.py:120-162 exactly (note: does NOT normalise q).
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            1 - 2 * y * y - 2 * z * z,
            2 * x * y - 2 * w * z,
            2 * x * z + 2 * w * y,
            2 * x * y + 2 * w * z,
            1 - 2 * x * x - 2 * z * z,
            2 * y * z - 2 * w * x,
            2 * x * z - 2 * w * y,
            2 * y * z + 2 * w * x,
            1 - 2 * x * x - 2 * y * y,
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product; [..., 4] x [..., 4] -> [..., 4] (camera_modules.py:199-224)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def canonicalize_quat_sign(q: jax.Array) -> jax.Array:
    """Flip quaternion sign so that w >= 0 (siamese_planeTR.py:556-557)."""
    sig = (jnp.asarray(q[..., 0:1] >= 0.0, q.dtype) - 0.5) * 2.0
    return q * sig


def safe_norm(v: jax.Array, axis: int = -1, keepdims: bool = False) -> jax.Array:
    """L2 norm with a well-defined zero gradient at v == 0.

    jnp.linalg.norm has a NaN gradient at exactly zero input; padded plane
    slots are exactly zero, and NaN * mask == NaN would poison the whole
    gradient. The double-where trick keeps both value and grad clean.
    """
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    is_zero = sq == 0
    sq_safe = jnp.where(is_zero, 1.0, sq)
    return jnp.where(is_zero, 0.0, jnp.sqrt(sq_safe))


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2 normalisation matching torch.nn.functional.normalize semantics
    (exactly unit for |v| > eps), with zero-safe value and gradient at v == 0
    via safe_norm. NOTE: the gradient magnitude scales as 1/max(|v|, eps);
    raw regressor outputs that can sit near zero must pass a larger eps
    (see camera_head._nquat) or the f32 global grad norm overflows."""
    n = safe_norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def quat_from_rotvec(rotvec: jax.Array) -> jax.Array:
    """Rotation vector -> unit quaternion (w, x, y, z); [..., 3] -> [..., 4].

    jnp replacement for quaternion.from_rotation_vector (camera_head.py:689).
    """
    angle = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc-based form, stable at angle -> 0.
    small = angle < 1e-8
    k = jnp.where(small, 0.5, jnp.sin(half) / jnp.where(small, 1.0, angle))
    w = jnp.cos(half)
    xyz = rotvec * k
    return jnp.concatenate([w, xyz], axis=-1)


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (w, x, y, z); [..., 3, 3] -> [..., 4].

    Branch-free Shepperd-style construction (safe under jit).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best by max pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0
    cand0 = jnp.stack([qw0 * 2.0, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    s0 = jnp.maximum(qw0 * 4.0, 1e-12)
    q0 = cand0 / jnp.stack([2.0 * jnp.ones_like(s0), s0, s0, s0], axis=-1)

    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0))
    s1 = jnp.maximum(sx * 2.0, 1e-12)
    q1 = jnp.stack([(m21 - m12) / s1, sx / 2.0, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)

    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0))
    s2 = jnp.maximum(sy * 2.0, 1e-12)
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, sy / 2.0, (m12 + m21) / s2], axis=-1)

    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0))
    s3 = jnp.maximum(sz * 2.0, 1e-12)
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, sz / 2.0], axis=-1)

    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)[..., None]
    q = jnp.select(
        [best == 0, best == 1, best == 2, best == 3],
        [q0, q1, q2, q3],
    )
    return normalize(q)


def rotmat_from_euler_deg(a1: jax.Array, a2: jax.Array, a3: jax.Array) -> jax.Array:
    """R = Rx(a1) @ Ry(a2) @ Rz(a3), angles in degrees; [...],[...],[...] -> [..., 3, 3].

    Spec: camera_modules.py:53-102 (build_rot_matrix_from_angle).
    """
    a1 = jnp.deg2rad(a1)
    a2 = jnp.deg2rad(a2)
    a3 = jnp.deg2rad(a3)
    c1, s1 = jnp.cos(a1), jnp.sin(a1)
    c2, s2 = jnp.cos(a2), jnp.sin(a2)
    c3, s3 = jnp.cos(a3), jnp.sin(a3)
    one = jnp.ones_like(c1)
    zero = jnp.zeros_like(c1)
    rx = jnp.stack([one, zero, zero, zero, c1, -s1, zero, s1, c1], -1).reshape(a1.shape + (3, 3))
    ry = jnp.stack([c2, zero, s2, zero, one, zero, -s2, zero, c2], -1).reshape(a2.shape + (3, 3))
    rz = jnp.stack([c3, -s3, zero, s3, c3, zero, zero, zero, one], -1).reshape(a3.shape + (3, 3))
    return rx @ ry @ rz


def warp_planes_to_global(
    planes: jax.Array, quat: jax.Array, tran: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """Warp view-0 plane params (n*d) through the relative pose into the global frame.

    Args:
      planes: [..., P, 3] plane parameters in view-0 camera coordinates.
      quat:   [..., 4] relative rotation (w-first, not necessarily unit).
      tran:   [..., 3] relative translation.

    Returns [..., P, 3]. Single vmappable function replacing the reference's
    three copies (spec: camera_head.py:1427-1465, incl. the [1,-1,-1] flip).
    The formula: take the plane's closest point to the origin after the rigid
    transform of the plane, i.e. project origin->plane along the transformed
    normal through the camera center path: with end = R(p*flip) + t, b = end - t,
    warped = (<end, b> / (|b| + eps)^2) * b.
    """
    rot = quat_to_rotmat(quat)  # [..., 3, 3]
    end = jnp.einsum("...ij,...pj->...pi", rot, _flip(planes)) + tran[..., None, :]
    b = end - tran[..., None, :]
    scale = jnp.sum(end * b, axis=-1) / jnp.square(safe_norm(b, axis=-1) + eps)
    return scale[..., None] * b


def warp_planes_identity(planes: jax.Array) -> jax.Array:
    """View-1 planes into the global frame: pure axis flip (camera_head.py:1457-1465)."""
    return _flip(planes)


def pose_to_matrix(tran: jax.Array, quat: jax.Array) -> jax.Array:
    """(t, q) -> 4x4 homogeneous transform; [...,3],[...,4] -> [...,4,4]."""
    rot = quat_to_rotmat(quat)
    top = jnp.concatenate([rot, tran[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=tran.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rotation_geodesic_deg(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Angle (deg) between two unit quaternions: 2*acos(|<q1,q2>|)."""
    d = jnp.abs(jnp.sum(normalize(q1) * normalize(q2), axis=-1))
    return jnp.rad2deg(2.0 * jnp.arccos(jnp.clip(d, -1.0, 1.0)))


def get_coordinate_map(h: int = 480, w: int = 640, k_matrix=None, dtype=jnp.float32):
    """K^-1 @ [x, y, 1] ray map; returns [3, h, w] (siamese_planeTR.py:815-839).

    Pixel coordinates are rescaled to the canonical 640x480 frame before
    back-projection, matching the reference exactly.
    """
    if k_matrix is None:
        focal = 517.97
        k_matrix = jnp.asarray(
            [[focal, 0.0, 320.0], [0.0, focal, 240.0], [0.0, 0.0, 1.0]], dtype=dtype
        )
    else:
        k_matrix = jnp.asarray(k_matrix, dtype=dtype)
    k_inv = jnp.linalg.inv(k_matrix)
    x = (jnp.arange(w, dtype=dtype) / w * 640.0)[None, :].repeat(h, axis=0)
    y = (jnp.arange(h, dtype=dtype) / h * 480.0)[:, None].repeat(w, axis=1)
    xy1 = jnp.stack([x, y, jnp.ones((h, w), dtype=dtype)], axis=0).reshape(3, -1)
    return (k_inv @ xy1).reshape(3, h, w)

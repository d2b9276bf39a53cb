"""Closed-form batched 3×3 linear algebra.

The mapping stage needs a symmetric 3×3 eigendecomposition per corner query
(covariance PCA, laserMapping.cpp:605) and a 3×3 solve per surf query
(plane-fit normal equations, :663). XLA's generic ``eigh``/LU kernels cost
~15 ms each at batch 4-16k on TPU; these closed forms (trigonometric
eigenvalues + adjugate-product eigenvectors, Cramer solve) are pure VPU
element-wise code, ~100x cheaper, and vmappable by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def solve3(a: jnp.ndarray, b: jnp.ndarray, reg: float = 0.0) -> jnp.ndarray:
    """Solve a @ x = b for batched 3×3 `a` (..., 3, 3) and (..., 3) `b`
    via the adjugate (Cramer). `reg` adds Tikhonov regularization."""
    if reg:
        a = a + reg * jnp.eye(3, dtype=a.dtype)
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a10, a11, a12 = a[..., 1, 0], a[..., 1, 1], a[..., 1, 2]
    a20, a21, a22 = a[..., 2, 0], a[..., 2, 1], a[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS,
                              jnp.where(det < 0, -_EPS, _EPS), det)
    # adjugate (transpose of cofactor matrix)
    adj = jnp.stack([
        c00, a02 * a21 - a01 * a22, a01 * a12 - a02 * a11,
        c01, a00 * a22 - a02 * a20, a02 * a10 - a00 * a12,
        c02, a01 * a20 - a00 * a21, a00 * a11 - a01 * a10,
    ], axis=-1).reshape(a.shape)
    return jnp.einsum("...ij,...j->...i", adj, b,
                      precision=jax.lax.Precision.HIGHEST) \
        * inv_det[..., None]


def eigh3(a: jnp.ndarray):
    """Eigenvalues (ascending) + principal eigenvector of symmetric (...,3,3).

    Returns (vals (..., 3), v_max (..., 3)) where v_max is the unit
    eigenvector of the largest eigenvalue (the only one the corner PCA
    consumes: direction of the fitted line, laserMapping.cpp:609).

    Trigonometric eigenvalues (Smith's algorithm); eigenvector via the
    spectral projector (A - l1 I)(A - l2 I), whose columns all lie in the
    top eigenspace — the largest column is selected for robustness. For a
    (near-)degenerate top eigenvalue the direction is ill-defined; a safe
    unit vector is returned (callers' line-likeness test l2 > 3*l1 rejects
    those neighborhoods anyway).
    """
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    eye = jnp.eye(3, dtype=a.dtype)
    b = a - q[..., None, None] * eye
    p2 = jnp.sum(b * b, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    c = b / p[..., None, None]
    # r = det(C) / 2
    r = 0.5 * (
        c[..., 0, 0] * (c[..., 1, 1] * c[..., 2, 2]
                        - c[..., 1, 2] * c[..., 2, 1])
        - c[..., 0, 1] * (c[..., 1, 0] * c[..., 2, 2]
                          - c[..., 1, 2] * c[..., 2, 0])
        + c[..., 0, 2] * (c[..., 1, 0] * c[..., 2, 1]
                          - c[..., 1, 1] * c[..., 2, 0]))
    phi = jnp.arccos(jnp.clip(r, -1.0, 1.0)) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    lam0 = q + 2.0 * p * jnp.cos(phi)               # largest
    lam2 = q + 2.0 * p * jnp.cos(phi + two_pi_3)    # smallest
    lam1 = 3.0 * q - lam0 - lam2
    vals = jnp.stack([lam2, lam1, lam0], axis=-1)   # ascending

    # projector onto the top eigenspace (full-f32 matmul: the TPU default
    # bf16 passes would blur the fitted line direction)
    m = jnp.matmul(a - lam1[..., None, None] * eye,
                   a - lam2[..., None, None] * eye,
                   precision=jax.lax.Precision.HIGHEST)
    norms = jnp.sum(m * m, axis=-2)                 # column norms^2 (..., 3)
    col = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(m, col[..., None, None].repeat(3, axis=-2),
                            axis=-1)[..., 0]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], a.dtype), v.shape)
    v = jnp.where(vn > 1e-8, v / jnp.maximum(vn, _EPS), fallback)
    return vals, v

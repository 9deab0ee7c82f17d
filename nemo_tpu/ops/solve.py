"""Batched small-matrix solves for the per-pixel matched-filter equations.

The reference builds the multi-frequency matched filter with an explicit
python loop over every map pixel, inverting the (n_freq x n_freq) noise
covariance at each one (``nemo/filters.py:624-630``) - the hottest python
loop in the package.  Here the same math is one fused elementwise expression
over the full Fourier grid: closed-form adjugate inverses for n_freq <= 3
(pure VPU work, no batching overhead), falling back to
``jnp.linalg.solve`` for larger frequency counts.
"""

import jax.numpy as jnp


def solve_small(A, b):
    """Solve A x = b for batched small matrices.

    Args:
        A: (..., n, n) stacked matrices.
        b: (..., n) stacked right-hand sides.
    Returns:
        x: (..., n). Where A is singular (det == 0), returns zeros -
        matching the reference's try/except-continue behaviour at
        ``filters.py:627-630`` (singular pixels keep filt = 0).
    """
    n = A.shape[-1]
    if n == 1:
        det = A[..., 0, 0]
        safe = jnp.where(det == 0, 1.0, det)
        x = (b[..., 0] / safe)[..., None]
        return jnp.where((det == 0)[..., None], 0.0, x)
    if n == 2:
        a, bb = A[..., 0, 0], A[..., 0, 1]
        c, d = A[..., 1, 0], A[..., 1, 1]
        det = a * d - bb * c
        safe = jnp.where(det == 0, 1.0, det)
        x0 = (d * b[..., 0] - bb * b[..., 1]) / safe
        x1 = (-c * b[..., 0] + a * b[..., 1]) / safe
        x = jnp.stack([x0, x1], axis=-1)
        return jnp.where((det == 0)[..., None], 0.0, x)
    if n == 3:
        a11, a12, a13 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
        a21, a22, a23 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
        a31, a32, a33 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
        c11 = a22 * a33 - a23 * a32
        c12 = a13 * a32 - a12 * a33
        c13 = a12 * a23 - a13 * a22
        c21 = a23 * a31 - a21 * a33
        c22 = a11 * a33 - a13 * a31
        c23 = a13 * a21 - a11 * a23
        c31 = a21 * a32 - a22 * a31
        c32 = a12 * a31 - a11 * a32
        c33 = a11 * a22 - a12 * a21
        det = a11 * c11 + a12 * c12 + a13 * c13
        safe = jnp.where(det == 0, 1.0, det)
        b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
        x0 = (c11 * b0 + c12 * b1 + c13 * b2) / safe
        x1 = (c21 * b0 + c22 * b1 + c23 * b2) / safe
        x2 = (c31 * b0 + c32 * b1 + c33 * b2) / safe
        x = jnp.stack([x0, x1, x2], axis=-1)
        return jnp.where((det == 0)[..., None], 0.0, x)
    return jnp.linalg.solve(A, b[..., None])[..., 0]

"""Shape bucketing helpers.

XLA compiles one executable per input shape. The sampler's point sets grow
over time, so every jitted kernel takes padded arrays plus a validity mask;
this module centralizes the padding schedule (powers of two above a floor) to
bound the number of compilations per run.
"""

import numpy as np
import jax.numpy as jnp


def bucket_size(n, floor=64):
    """Smallest power-of-two bucket >= max(n, floor)."""
    n = max(int(n), 1)
    size = floor
    while size < n:
        size *= 2
    return size


def pad_batch(points, floor=64, dtype=None):
    """Pad the leading axis of an (n, d) host array to a bucket size.

    Unlike :func:`pad_points` no mask is returned: use this for kernels whose
    per-point outputs are simply sliced back to ``n`` (contains/transform/
    predict). Returns ``(padded, n)``.
    """
    points = np.atleast_2d(np.asarray(points))
    n, d = points.shape
    m = bucket_size(n, floor)
    if dtype is None:
        dtype = jnp.float32
    out = np.zeros((m, d), dtype=np.float64)
    out[:n] = points
    return jnp.asarray(out, dtype), n


def pad_points(points, floor=64, dtype=None):
    """Pad an (n, d) host array to a bucketed (m, d) array plus mask.

    Padded rows are filled with zeros; the mask marks valid rows.
    """
    points = np.asarray(points)
    n, d = points.shape
    m = bucket_size(n, floor)
    if dtype is None:
        dtype = jnp.float32
    out = np.zeros((m, d), dtype=np.float64)
    out[:n] = points
    mask = np.zeros(m, dtype=bool)
    mask[:n] = True
    return jnp.asarray(out, dtype=dtype), jnp.asarray(mask)

"""Prior construction and unit-cube-to-physical transforms.

API-parity analogue of the reference Prior (reference: nautilus/prior.py),
plus a TPU fast path: when every free parameter is uniform (the overwhelmingly
common case), the transform is an affine map that can be fused into a jitted
likelihood on device. Arbitrary scipy frozen distributions (anything with an
``isf``) remain supported through the host path.
"""

import numbers

import numpy as np
from scipy.stats import uniform


class Prior:
    """Declarative per-parameter prior.

    Parameters are added one at a time and may be uniform (tuple), fixed
    (float), aliased (string referring to an earlier key), or any object
    with an ``isf`` method (e.g. scipy frozen distributions).
    """

    def __init__(self):
        self.keys = []
        self.dists = []

    def add_parameter(self, key=None, dist=(0, 1)):
        """Add a model parameter (behavioral parity with reference:
        nautilus/prior.py:25-71).

        ``dist`` may be a ``(low, high)`` tuple (uniform), a plain number
        (fixed value), the name of a previously added parameter (alias), or
        any object exposing ``isf`` (e.g. a scipy frozen distribution).
        """
        key = 'x_{}'.format(len(self.keys)) if key is None else key
        if not isinstance(key, str):
            raise TypeError(
                'Parameter names must be strings, got {!r}.'.format(key))
        if key in self.keys:
            raise ValueError(
                'A parameter named {!r} was already added.'.format(key))

        if isinstance(dist, tuple):
            low, high = dist
            dist = uniform(loc=low, scale=high - low)
        elif isinstance(dist, str):
            if dist == key or dist not in self.keys:
                raise ValueError(
                    'Alias target {!r} is not a previously added '
                    'parameter.'.format(dist))
            # Collapse alias chains so every alias points at a concrete
            # parameter.
            while isinstance(self.dists[self.keys.index(dist)], str):
                dist = self.dists[self.keys.index(dist)]
        elif not (isinstance(dist, numbers.Number) or hasattr(dist, 'isf')):
            raise TypeError(
                "Unsupported 'dist' value {!r}: expected a (low, high) "
                'tuple, a number, a parameter name, or an object with an '
                "'isf' method.".format(dist))

        self.keys.append(key)
        self.dists.append(dist)

    def dimensionality(self):
        """Number of free model parameters."""
        return sum(not isinstance(dist, (numbers.Number, str))
                   for dist in self.dists)

    @property
    def free_dists(self):
        """The distributions of the free (non-fixed, non-aliased) parameters."""
        return [d for d in self.dists
                if not isinstance(d, (numbers.Number, str))]

    def is_uniform(self):
        """Whether every free parameter is uniformly distributed.

        Uniform priors admit an affine unit-to-physical map that can be
        fused into a jitted device likelihood.
        """
        return all(getattr(d, 'dist', None) is not None and
                   d.dist.name == 'uniform' for d in self.free_dists)

    def uniform_bounds(self):
        """(lo, hi) arrays for an all-uniform prior."""
        lo = np.array([d.kwds.get('loc', d.args[0] if d.args else 0.0)
                       for d in self.free_dists])
        scale = np.array([
            d.kwds.get('scale', d.args[1] if len(d.args) > 1 else 1.0)
            for d in self.free_dists])
        return lo, lo + scale

    def jax_transform(self):
        """Jittable unit-cube -> physical transform over the free
        parameters: device inverse-CDF kernels for recognized scipy
        families, one grouped host callback for the rest (see
        :mod:`nautilus_tpu.ops.dists`)."""
        from .ops.dists import make_prior_transform
        return make_prior_transform(self.free_dists)

    def unit_to_physical(self, points):
        """Map unit-cube points to physical space via each dist's inverse
        survival function (reference: nautilus/prior.py:85-120)."""
        points = np.asarray(points)
        if self.dimensionality() != points.shape[-1]:
            raise ValueError('Dimensionality of points does not match prior.')

        phys_points = np.zeros_like(points)
        i = 0
        for dist in self.dists:
            if hasattr(dist, 'isf'):
                phys_points[..., i] = dist.isf(1 - points[..., i])
                i += 1
        return phys_points

    def physical_to_dictionary(self, phys_points):
        """Physical points to a parameter dictionary, including fixed and
        aliased parameters (reference: nautilus/prior.py:122-162)."""
        phys_points = np.asarray(phys_points)
        if self.dimensionality() != phys_points.shape[-1]:
            raise ValueError('Dimensionality of points does not match prior.')

        param_dict = {}
        i = 0
        for key, dist in zip(self.keys, self.dists):
            if hasattr(dist, 'isf'):
                param_dict[key] = phys_points[..., i]
                i += 1
            elif isinstance(dist, numbers.Number):
                param_dict[key] = np.ones(phys_points[..., 0].shape) * dist

        for key, dist in zip(self.keys, self.dists):
            if isinstance(dist, str):
                param_dict[key] = param_dict[dist]

        return param_dict

    def unit_to_dictionary(self, points):
        """Unit-cube points straight to a parameter dictionary."""
        return self.physical_to_dictionary(self.unit_to_physical(points))

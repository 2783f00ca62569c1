"""Phase shift for periodic parameters.

Reference: nautilus/bounds/periodic.py. Shifts each periodic dimension so
the largest gap between points straddles the 0/1 boundary, keeping clusters
contiguous inside the unit cube.
"""

import numpy as np


class PhaseShift:
    """Mod-1 shift of periodic dimensions toward cluster centers."""

    def __init__(self):
        self.periodic = None
        self.centers = None

    @classmethod
    def compute(cls, points, periodic):
        """Center periodic dimensions on the largest empty gap so wrapped
        modes become contiguous (reference: nautilus/bounds/periodic.py)."""
        shift = cls()
        shift.periodic = np.asarray(periodic, int)
        shift.centers = np.zeros(len(shift.periodic))

        for i, dim in enumerate(shift.periodic):
            x = np.sort(points[:, dim])
            gaps = np.append(np.diff(x), x[0] - (x[-1] - 1))
            j = np.argmax(gaps)
            shift.centers[i] = (x[j] + gaps[j] / 2.0 + 0.5) % 1

        return shift

    def shift_vector(self, n_dim):
        """(n_dim,) additive mod-1 shift equivalent to :meth:`transform`
        (for applying the shift to device-resident point blocks)."""
        vec = np.zeros(n_dim)
        vec[self.periodic] = 0.5 - self.centers
        return vec

    def transform(self, points, inverse=False):
        """Apply (or invert) the periodic phase shift to unit-cube points."""
        points_t = np.copy(np.asarray(points, np.float64))
        sign = -1 if inverse else +1
        for i, dim in enumerate(self.periodic):
            points_t[..., dim] = (
                points_t[..., dim] + sign * (0.5 - self.centers[i])) % 1
        return points_t

    def write(self, group):
        """Serialize the shift vector into an HDF5 group."""
        group.attrs['type'] = 'PhaseShift'
        group.attrs['periodic'] = self.periodic
        group.attrs['centers'] = self.centers

    @classmethod
    def read(cls, group, keys=None):
        """Reconstruct the phase shift from an HDF5 group."""
        shift = cls()
        shift.periodic = np.asarray(group.attrs['periodic'], int)
        shift.centers = np.asarray(group.attrs['centers'])
        return shift

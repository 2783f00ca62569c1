"""Bound classes for the TPU-native nautilus sampler."""

from .basic import UnitCube, Ellipsoid, UnitCubeEllipsoidMixture
from .union import Union, ellipsoids_overlap
from .neural import NeuralBound
from .nautilus import NautilusBound
from .periodic import PhaseShift

__all__ = ['UnitCube', 'Ellipsoid', 'UnitCubeEllipsoidMixture', 'Union',
           'ellipsoids_overlap', 'NeuralBound', 'NautilusBound',
           'PhaseShift']

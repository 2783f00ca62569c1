"""Benchmark likelihood models (JAX-native, vectorized)."""

from .analytic import (
    correlated_gaussian, funnel, rosenbrock, eggbox, gaussian_shell,
    gaussian_mixture, LogLikelihood)

__all__ = ['correlated_gaussian', 'funnel', 'rosenbrock', 'eggbox',
           'gaussian_shell', 'gaussian_mixture', 'LogLikelihood']

"""nautilus_tpu: TPU-native neural-network-boosted importance nested sampling.

A from-scratch JAX/XLA re-design of the capabilities of the nautilus sampler
(Lange 2023, MNRAS 525, 3181): Bayesian posterior and evidence estimation via
importance nested sampling with neural-network-emulated likelihood bounds,
built for TPU hardware - batched fixed-shape geometry kernels, vmapped
ensemble training, and device-mesh parallel likelihood evaluation.
"""

__version__ = '0.1.0'

from .prior import Prior
from .sampler import Sampler
from .utils.fetch import warmup

__all__ = ['Prior', 'Sampler', 'warmup']

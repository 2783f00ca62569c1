"""Device-mesh parallelism for the TPU-native sampler."""

from .mesh import (make_mesh, init_distributed, sharded_likelihood,
                   build_sampling_step, make_distributed_sampler,
                   build_ensemble_train_step, shard_ensemble_train)

__all__ = ['make_mesh', 'init_distributed', 'sharded_likelihood',
           'build_sampling_step', 'make_distributed_sampler',
           'build_ensemble_train_step', 'shard_ensemble_train']

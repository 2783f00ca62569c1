"""API surface and error-path tests (reference: tests/test_sampler.py:69-164)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import norm

from nautilus_tpu import Prior, Sampler


def gauss_like_jax(x):
    return -0.5 * jnp.sum(((x - 0.5) / 0.1) ** 2, axis=-1)


def test_function_prior_needs_n_dim():
    # A callable prior requires n_dim (reference: tests/test_sampler.py:71-76).
    with pytest.raises(ValueError):
        Sampler(lambda u: u, gauss_like_jax)


def test_min_dimensionality():
    prior = Prior()
    prior.add_parameter('a')
    with pytest.raises(ValueError):
        Sampler(prior, gauss_like_jax)


def test_checkpoint_extension_checked(tmp_path):
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')
    sampler = Sampler(prior, gauss_like_jax, n_live=100, n_networks=0,
                      seed=0, vectorized='jax')
    sampler.run(f_live=0.5, n_eff=100)
    with pytest.raises(ValueError):
        sampler.write(str(tmp_path / 'state.txt'))


def test_discard_exploration_type():
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')
    sampler = Sampler(prior, gauss_like_jax, n_live=100, n_networks=0,
                      seed=0, vectorized='jax')
    with pytest.raises(ValueError):
        sampler.discard_exploration = 1.0


def test_scipy_dist_prior():
    # Non-uniform priors run through the host transform path
    # (reference: tests/test_sampler.py:134-147).
    prior = Prior()
    prior.add_parameter('a', dist=norm(loc=0.5, scale=0.2))
    prior.add_parameter('b', dist=(0.0, 1.0))

    def likelihood(d):
        return float(-0.5 * ((d['a'] - 0.5) ** 2 +
                             (d['b'] - 0.5) ** 2) / 0.1 ** 2)

    sampler = Sampler(prior, likelihood, n_live=150, n_networks=0, seed=0)
    assert sampler.run(f_live=0.2, n_eff=300)
    points, log_w, log_l = sampler.posterior(return_as_dict=True)
    assert set(points) == {'a', 'b'}


def test_fixed_and_aliased_params():
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')
    prior.add_parameter('c', dist=2.5)
    prior.add_parameter('d', dist='a')
    assert prior.dimensionality() == 2

    def likelihood(d):
        assert d['c'] == 2.5
        assert d['d'] == d['a']
        return float(-0.5 * ((d['a'] - 0.5) ** 2 +
                             (d['b'] - 0.5) ** 2) / 0.1 ** 2)

    sampler = Sampler(prior, likelihood, n_live=150, n_networks=0, seed=0)
    assert sampler.run(f_live=0.2, n_eff=300)


def test_callable_prior_jax_path():
    # Callable (jittable) prior fused with the likelihood on device.
    def prior(u):
        return 2.0 * u - 1.0

    def likelihood(x):
        return -0.5 * jnp.sum((x / 0.2) ** 2, axis=-1)

    sampler = Sampler(prior, likelihood, n_dim=2, n_live=150, n_networks=0,
                      seed=0, vectorized='jax')
    assert sampler.run(f_live=0.2, n_eff=300)
    points, log_w, log_l = sampler.posterior()
    # Posterior points are in physical space [-1, 1].
    w = np.exp(log_w)
    assert abs(np.average(points[:, 0], weights=w)) < 0.05


def test_deprecated_aliases():
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')
    sampler = Sampler(prior, gauss_like_jax, n_live=100, n_networks=0,
                      seed=0, vectorized='jax')
    sampler.run(f_live=0.5, n_eff=100)
    with pytest.warns(DeprecationWarning):
        assert sampler.effective_sample_size() == sampler.n_eff
    with pytest.warns(DeprecationWarning):
        assert sampler.evidence() == sampler.log_z
    with pytest.warns(DeprecationWarning):
        assert (sampler.asymptotic_sampling_efficiency() == sampler.eta)


def test_reference_api_parity():
    # Checklist of the reference's public API surface (reference:
    # nautilus/sampler.py, prior.py, bounds/*.py): every public method and
    # property a reference user can call must exist here.
    from nautilus_tpu.bounds import (
        UnitCube, Ellipsoid, UnitCubeEllipsoidMixture, Union, NeuralBound,
        NautilusBound, PhaseShift)
    from nautilus_tpu.neural import NeuralNetworkEmulator
    from nautilus_tpu.pool import SamplerPool

    sampler_api = [
        'run', 'posterior', 'n_eff', 'log_z', 'eta', 'f_live', 'log_v_live',
        'sample_shell', 'evaluate_likelihood', 'update_shell_info',
        'print_status', 'add_bound', 'add_samples', 'shell_association',
        'shell_bound_occupation', 'write', 'write_shell_update',
        'effective_sample_size', 'evidence',
        'asymptotic_sampling_efficiency', 'discard_exploration']
    for name in sampler_api:
        assert hasattr(Sampler, name), name

    prior_api = ['add_parameter', 'dimensionality', 'unit_to_physical',
                 'unit_to_dictionary', 'physical_to_dictionary']
    for name in prior_api:
        assert hasattr(Prior, name), name

    bound_api = {
        UnitCube: ['compute', 'contains', 'sample', 'log_v', 'write',
                   'read', 'reset'],
        Ellipsoid: ['compute', 'contains', 'sample', 'transform', 'log_v',
                    'write', 'read', 'reset'],
        UnitCubeEllipsoidMixture: ['compute', 'contains', 'sample',
                                   'transform', 'log_v', 'write', 'read',
                                   'reset'],
        Union: ['compute', 'split', 'trim', 'contains', 'sample', 'log_v',
                'write', 'update', 'read', 'reset'],
        NeuralBound: ['compute', 'contains', 'write', 'read', 'reset'],
        NautilusBound: ['compute', 'contains', 'sample', 'log_v', 'n_ell',
                        'n_net', 'write', 'update', 'read', 'reset'],
        PhaseShift: ['compute', 'transform', 'write', 'read'],
    }
    for cls, names in bound_api.items():
        for name in names:
            assert hasattr(cls, name), (cls.__name__, name)

    for name in ['train', 'predict', 'write', 'read']:
        assert hasattr(NeuralNetworkEmulator, name), name
    for name in ['map', 'size']:
        assert hasattr(SamplerPool, name), name

    # transform(inverse=) round trips (reference: bounds/basic.py:318,565).
    rng = np.random.default_rng(0)
    pts = rng.random((64, 3)) * 0.5 + 0.25
    for cls in [Ellipsoid, UnitCubeEllipsoidMixture]:
        bound = cls.compute(rng.random((200, 3)))
        t = bound.transform(pts)
        back = bound.transform(t, inverse=True)
        assert np.allclose(back, pts, atol=1e-5)


def test_public_sample_shell():
    # Public sample_shell parity (reference: nautilus/sampler.py:751-830):
    # one batch of shell points, all inside the shell's bound and outside
    # every later bound.
    prior = Prior()
    prior.add_parameter('a')
    prior.add_parameter('b')
    sampler = Sampler(prior, gauss_like_jax, n_live=150, n_networks=0,
                      seed=2, vectorized='jax', n_batch=256)
    sampler.run(f_live=0.2, n_eff=300)
    assert len(sampler.bounds) > 1

    points, n_bound = sampler.sample_shell(0)
    assert points.shape == (sampler.n_batch, 2)
    assert n_bound >= len(points)
    # Inside bound 0 (the unit cube), outside all later bounds.
    member = sampler._membership_matrix(points)
    assert not np.any(member[1:])

    points, n_bound = sampler.sample_shell(-1)
    member = sampler._membership_matrix(points)
    assert np.all(member[-1])


def test_prior_errors():
    prior = Prior()
    prior.add_parameter('a')
    with pytest.raises(ValueError):
        prior.add_parameter('a')          # duplicate key
    with pytest.raises(TypeError):
        prior.add_parameter(1)            # non-string key
    with pytest.raises(ValueError):
        prior.add_parameter('b', dist='z')  # alias of unknown key
    with pytest.raises(TypeError):
        prior.add_parameter('c', dist=[0, 1])  # unsupported type
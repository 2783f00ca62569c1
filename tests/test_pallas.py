import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nautilus_tpu.ops.mlp import init_mlp
from nautilus_tpu.ops.pallas_kernels import (
    HAS_PALLAS, ensemble_score_pallas, ensemble_score_xla)


@pytest.mark.skipif(not HAS_PALLAS, reason='pallas unavailable')
@pytest.mark.parametrize('d,hidden', [(3, (32, 16)), (8, (64, 32, 16))])
def test_ensemble_score_matches_xla(d, hidden):
    # The hand-written VMEM-resident ensemble kernel must agree with the
    # XLA reference path (interpret mode: exercises the kernel logic on
    # any backend).
    e_nets = 4
    sizes = (d,) + hidden + (1,)
    keys = jax.random.split(jax.random.key(0), e_nets)
    params = jax.vmap(lambda k: init_mlp(k, sizes))(keys)

    z = jnp.asarray(
        np.random.default_rng(1).normal(size=(256, d)), jnp.float32)
    ref = np.asarray(ensemble_score_xla(z, params.weights, params.biases))
    out = np.asarray(ensemble_score_pallas(
        z, params.weights, params.biases, tile=128, interpret=True))
    assert out.shape == (256,)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

"""Device-mesh parallel kernels.

The reference parallelizes three things over process pools (reference:
nautilus/pool.py, SURVEY §2): likelihood evaluation, bound (rejection)
sampling, and ensemble network training. Here all three map onto a
``jax.sharding.Mesh``:

- **dp** (data parallel): candidate-point batches are sharded over the
  ``'dp'`` mesh axis for bound sampling and likelihood evaluation; accept
  counters and shell statistics reduce with ``psum`` over ICI.
- **ep** (ensemble parallel): the emulator's ensemble axis shards over the
  same devices for training, so every network trains simultaneously.

The control loop stays on host 0, mirroring the reference's driver.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from ..ops import geometry as G
from ..ops.neural_stack import neural_contains_any
from ..ops.mlp import mlp_forward, _adam_update


def make_mesh(n_devices=None, axis='dp'):
    """Create a 1-D device mesh over (up to) all available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize multi-host JAX and return a global device mesh.

    The TPU-native analogue of the reference's MPI pool setup (reference:
    docs/guides/parallelization.rst "MPI Parallelization"): every host runs
    the same SPMD program; ``jax.distributed.initialize`` wires the hosts
    together (arguments are auto-detected on TPU pods — pass them only for
    manual clusters), and the returned mesh spans every chip in the slice.
    Host 0 keeps the sampler's control loop, exactly like the reference's
    driver process; passing the mesh to ``Sampler(mesh=...)`` shards
    candidate generation, the membership sweep, and the likelihood over
    ICI/DCN with XLA-inserted collectives.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    jax.distributed.initialize(**kwargs)
    return make_mesh()


def sharded_likelihood(evaluate, mesh, axis='dp'):
    """Wrap a jitted batch evaluator so its batch axis shards over the mesh.

    ``evaluate`` maps (n, d) unit-cube points to (n,) log-likelihoods (or a
    tuple with blobs). The batch must be divisible by the mesh size.
    """
    in_sharding = NamedSharding(mesh, P(axis))

    @jax.jit
    def wrapped(points):
        points = jax.lax.with_sharding_constraint(points, in_sharding)
        return evaluate(points)

    return wrapped


def build_sampling_step(likelihood, transform, n_per_device, axis='dp'):
    """Fused distributed exploration step over a device mesh.

    Each device draws ``n_per_device`` candidates from the outer union with
    its own folded key, applies the neural rejection, evaluates the
    likelihood on accepted candidates, and computes shell statistics
    contributions; counters and logsumexp accumulators reduce with ``psum``.
    The TPU-native analogue of the reference's parallel bound sampling +
    likelihood pool map (reference: nautilus/bounds/nautilus.py:223-237,
    nautilus/sampler.py:863-873).

    Returns a function to be wrapped in ``shard_map`` by the caller with
    mesh-specific specs, or used through :func:`make_distributed_sampler`.
    """

    def step(key, outer_stacked, outer_mask, nstack):
        my_idx = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, my_idx)
        points, outer_accept = G.union_sample_batch(
            outer_stacked, outer_mask, key, n_per_device, unit=True)
        in_neural = neural_contains_any(nstack, points)
        accept = outer_accept & in_neural

        log_l = likelihood(transform(points))
        log_l = jnp.where(accept, log_l, -jnp.inf)

        # Global counters and shell statistics over all devices.
        n_outer = jax.lax.psum(jnp.sum(outer_accept), axis)
        n_accept = jax.lax.psum(jnp.sum(accept), axis)
        log_l_max = jax.lax.pmax(jnp.max(log_l), axis)
        sum_l = jax.lax.psum(jnp.sum(
            jnp.where(accept, jnp.exp(log_l - log_l_max), 0.0)), axis)
        sum_l_sq = jax.lax.psum(jnp.sum(
            jnp.where(accept, jnp.exp(2 * (log_l - log_l_max)), 0.0)), axis)

        # Gather all points/likelihoods to every device (driver reads one).
        points_all = jax.lax.all_gather(points, axis, tiled=True)
        accept_all = jax.lax.all_gather(accept, axis, tiled=True)
        log_l_all = jax.lax.all_gather(log_l, axis, tiled=True)

        stats = dict(n_outer=n_outer, n_accept=n_accept,
                     log_l_max=log_l_max, sum_l=sum_l, sum_l_sq=sum_l_sq)
        return points_all, accept_all, log_l_all, stats

    return step


def make_distributed_sampler(mesh, likelihood, transform, n_per_device,
                             axis='dp'):
    """Jit the distributed sampling step over a mesh via shard_map."""
    step = build_sampling_step(likelihood, transform, n_per_device, axis)
    specs_in = (P(), P(), P(), P())
    specs_out = (P(), P(), P(), P())

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=specs_in,
        out_specs=specs_out,
        check_vma=False)
    return jax.jit(sharded)


def build_ensemble_train_step(sizes, lr=1e-2, axis='dp', alpha=0.0):
    """One ensemble-parallel Adam step: networks shard across devices.

    Each device updates its shard of the ensemble on the (replicated)
    training batch — the mesh analogue of the reference's per-worker
    network training (reference: nautilus/neural.py:93-96).
    """

    def batch_loss(p, xb, yb, mb):
        pred = mlp_forward(p, xb)
        sq = (pred - yb) ** 2 * mb
        l2 = sum(jnp.sum(w ** 2) for w in p.weights)
        return (0.5 * jnp.sum(sq) + 0.5 * alpha * l2) / \
            jnp.maximum(jnp.sum(mb), 1.0)

    grad_fn = jax.value_and_grad(batch_loss)

    def one_net(p, m, v, t, xb, yb, mb):
        loss, grads = grad_fn(p, xb, yb, mb)
        t = t + 1
        p, m, v = _adam_update(p, grads, m, v, t, lr)
        return p, m, v, t, loss

    def step(params, m, v, t, xb, yb, mb):
        # params leaves: (E_local, ...) on each device after sharding.
        return jax.vmap(one_net, in_axes=(0, 0, 0, 0, None, None, None))(
            params, m, v, t, xb, yb, mb)

    return step


def shard_ensemble_train(mesh, sizes, lr=1e-2, axis='dp'):
    """Jit an ensemble-sharded train step over the mesh."""
    step = build_ensemble_train_step(sizes, lr=lr, axis=axis)
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(None), P(None),
                  P(None)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False)
    return jax.jit(sharded)

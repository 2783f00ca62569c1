"""Multi-process ``jax.distributed`` harness: the real Sampler on a
2-process CPU cluster.

The TPU-native analogue of the reference's multi-node stand-in test, which
drives the sampler through an in-process dask ``Client`` (reference:
tests/test_pool.py:38-48): here two OS processes form a JAX cluster over a
localhost coordinator, ``nautilus_tpu.parallel.init_distributed`` builds
the global mesh spanning both processes' devices, and every process runs
the sampler's control loop in lockstep (same seed, identical fetched
replicas) — exactly the SPMD discipline a real TPU pod slice requires.
Process 0's result is compared against a single-process run on a mesh of
the same total device count; the sample stream is device-layout-invariant
(keys never depend on the mesh), so logZ must match bitwise.

Usage:
    python distributed_bench.py                 # parent: spawn + compare
    python distributed_bench.py --processes 2 --devices-per-process 4

Writes one JSON line with the parity verdict and per-configuration wall
times (this is a correctness/health harness for the DCN control path, not
a hardware scaling measurement: all virtual devices share the host CPU).
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_child():
    """Entry for one cluster process (or the single-process comparison)."""
    pid = int(os.environ['NAUTILUS_DIST_PID'])
    nproc = int(os.environ['NAUTILUS_DIST_NPROC'])
    port = os.environ['NAUTILUS_DIST_PORT']
    n_dev = int(os.environ['NAUTILUS_DIST_DEVICES'])
    out_path = os.environ['NAUTILUS_DIST_OUT']

    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '') +
        ' --xla_force_host_platform_device_count={}'.format(n_dev)).strip()

    import numpy as np
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from nautilus_tpu import Prior, Sampler
    from nautilus_tpu.parallel import init_distributed, make_mesh

    if nproc > 1:
        mesh = init_distributed(
            coordinator_address='localhost:{}'.format(port),
            num_processes=nproc, process_id=pid)
    else:
        mesh = make_mesh()

    n_dim = 3
    cov = 0.01 * (0.1 * np.eye(n_dim) + 0.9 * np.ones((n_dim, n_dim)))
    cov_inv = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    log_norm = float(-0.5 * (n_dim * np.log(2 * np.pi) +
                             np.linalg.slogdet(cov)[1]))

    def likelihood(x):
        xc = x - 0.5
        return log_norm - 0.5 * jnp.einsum(
            '...i,ij,...j->...', xc, cov_inv, xc)

    prior = Prior()
    for key in 'abc':
        prior.add_parameter(key)

    n_live = int(os.environ.get('NAUTILUS_DIST_NLIVE', '300'))
    n_eff = int(os.environ.get('NAUTILUS_DIST_NEFF', '1000'))
    sampler = Sampler(prior, likelihood, n_live=n_live, seed=42,
                      vectorized='jax', mesh=mesh)
    t0 = time.time()
    sampler.run(n_eff=n_eff, verbose=False)
    dt = time.time() - t0

    result = {'process_id': pid, 'num_processes': nproc,
              'n_devices': len(jax.devices()),
              'log_z': float(sampler.log_z), 'n_like': int(sampler.n_like),
              'n_eff': float(sampler.n_eff), 'wall_s': round(dt, 2)}
    with open('{}.{}'.format(out_path, pid), 'w') as f:
        json.dump(result, f)
    # Leave the cluster cleanly so the coordinator does not log noise.
    if nproc > 1:
        jax.distributed.shutdown()


def spawn(nproc, devices_per_process, out_path, n_live, n_eff,
          timeout=900):
    """Spawn an nproc-process cluster; returns the per-process results."""
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.update(NAUTILUS_DIST_PID=str(pid),
                   NAUTILUS_DIST_NPROC=str(nproc),
                   NAUTILUS_DIST_PORT=str(port),
                   NAUTILUS_DIST_DEVICES=str(devices_per_process),
                   NAUTILUS_DIST_OUT=out_path,
                   NAUTILUS_DIST_NLIVE=str(n_live),
                   NAUTILUS_DIST_NEFF=str(n_eff),
                   NAUTILUS_DIST_CHILD='1')
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.abspath(__file__))))
    deadline = time.time() + timeout
    logs = []
    for p in procs:
        remaining = max(1, deadline - time.time())
        try:
            out, _ = p.communicate(timeout=remaining)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            out, _ = p.communicate()
        logs.append(out.decode(errors='replace'))
    results = []
    for pid in range(nproc):
        path = '{}.{}'.format(out_path, pid)
        if os.path.exists(path):
            with open(path) as f:
                results.append(json.load(f))
        else:
            results.append(None)
    return results, logs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--processes', type=int, default=2)
    parser.add_argument('--devices-per-process', type=int, default=1)
    parser.add_argument('--n-live', type=int, default=300)
    parser.add_argument('--n-eff', type=int, default=1000)
    args = parser.parse_args()

    tmp = tempfile.mkdtemp(prefix='nautilus_dist_')
    multi, multi_logs = spawn(
        args.processes, args.devices_per_process,
        os.path.join(tmp, 'multi'), args.n_live, args.n_eff)
    total_dev = args.processes * args.devices_per_process
    single, single_logs = spawn(
        1, total_dev, os.path.join(tmp, 'single'), args.n_live, args.n_eff)

    ok = all(r is not None for r in multi) and single[0] is not None
    if not ok:
        for i, log in enumerate(multi_logs):
            sys.stderr.write('--- multi process {} ---\n{}\n'.format(
                i, log[-4000:]))
        if single[0] is None:
            sys.stderr.write('--- single ---\n{}\n'.format(
                single_logs[0][-4000:]))
    log_z_multi = multi[0]['log_z'] if ok else None
    log_z_single = single[0]['log_z'] if ok else None
    processes_agree = ok and len({r['log_z'] for r in multi}) == 1
    bitwise = ok and log_z_multi == log_z_single

    record = {
        'metric': 'distributed_2process_parity',
        'ok': bool(ok and processes_agree and bitwise),
        'num_processes': args.processes,
        'devices_per_process': args.devices_per_process,
        'log_z_multi': log_z_multi,
        'log_z_single': log_z_single,
        'processes_agree': processes_agree,
        'bitwise_match_vs_single_process': bitwise,
        'n_like_multi': multi[0]['n_like'] if ok else None,
        'n_like_single': single[0]['n_like'] if ok else None,
        'wall_s_multi': multi[0]['wall_s'] if ok else None,
        'wall_s_single': single[0]['wall_s'] if ok else None,
        'platform': 'cpu',
        'note': ('2 OS processes over a localhost jax.distributed '
                 'coordinator, global mesh via init_distributed, host-0 '
                 'control-loop lockstep; virtual CPU devices — DCN '
                 'control-path correctness, not hardware scaling'),
    }
    print(json.dumps(record))
    return 0 if record['ok'] else 1


if __name__ == '__main__':
    if os.environ.get('NAUTILUS_DIST_CHILD') == '1':
        run_child()
    else:
        sys.exit(main())

"""Generate docs/api.md from the package docstrings.

Run from the repo root::

    JAX_PLATFORMS=cpu python docs/gen_api.py

Mirrors the reference's sphinx API pages (reference: docs/api_full.rst,
docs/api_high.rst) as a single markdown file so the rendered docstrings
ship with the repo without a sphinx build step.
"""

import inspect
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return '(...)'


def _doc(obj):
    doc = inspect.getdoc(obj)
    return doc.strip() if doc else '*No docstring.*'


def emit_function(out, func, name=None, level=3):
    name = name or func.__name__
    out.append('#' * level + ' `{}{}`\n'.format(name, _sig(func)))
    out.append(_doc(func) + '\n')


def emit_class(out, cls, methods=None, level=3):
    out.append('#' * level + ' `{}`\n'.format(cls.__name__))
    out.append(_doc(cls) + '\n')
    if methods is None:
        methods = sorted(n for n in dir(cls) if not n.startswith('_'))
    for name in methods:
        attr = inspect.getattr_static(cls, name, None)
        if attr is None:
            continue
        if isinstance(attr, property):
            out.append('#' * (level + 1) +
                       ' `{}.{}` *(property)*\n'.format(cls.__name__, name))
            out.append(_doc(attr) + '\n')
            continue
        func = getattr(cls, name)
        if not callable(func):
            continue
        out.append('#' * (level + 1) + ' `{}.{}{}`\n'.format(
            cls.__name__, name, _sig(func)))
        out.append(_doc(func) + '\n')


def main():
    import nautilus_tpu
    from nautilus_tpu import Prior, Sampler
    from nautilus_tpu.neural import NeuralNetworkEmulator
    from nautilus_tpu.bounds.basic import (UnitCube, Ellipsoid,
                                           UnitCubeEllipsoidMixture)
    from nautilus_tpu.bounds.union import Union
    from nautilus_tpu.bounds.neural import NeuralBound
    from nautilus_tpu.bounds.nautilus import NautilusBound
    from nautilus_tpu.bounds.periodic import PhaseShift
    from nautilus_tpu import pool as pool_mod
    from nautilus_tpu import parallel
    from nautilus_tpu.utils import fetch as fetch_mod
    from nautilus_tpu.utils.keys import KeyStream

    out = []
    out.append('# API reference\n')
    out.append('Generated from docstrings by `docs/gen_api.py`; do not '
               'edit by hand. Reference parity: the sphinx API pages of '
               'johannesulf/nautilus (`docs/api_high.rst`, '
               '`docs/api_full.rst`).\n')

    out.append('## High-level interface\n')
    out.append(_doc(nautilus_tpu) + '\n')
    emit_class(out, Prior)
    emit_class(out, Sampler, methods=[
        'run', 'posterior', 'evidence', 'log_z', 'effective_sample_size',
        'n_eff', 'eta', 'f_live', 'log_v_live', 'n_like',
        'asymptotic_sampling_efficiency', 'evals_per_second', 'timing',
        'points', 'points_t', 'sample_shell', 'add_bound', 'add_samples',
        'update_shell_info', 'evaluate_likelihood', 'discard_exploration',
        'shell_association', 'shell_bound_occupation', 'print_status',
        'write', 'write_shell_update'])

    out.append('## Bounds\n')
    for cls in (UnitCube, Ellipsoid, UnitCubeEllipsoidMixture, Union,
                NeuralBound, NautilusBound, PhaseShift):
        emit_class(out, cls, methods=[
            n for n in ('compute', 'compute_device', 'compute_batched',
                        'compute_batched_device', 'sample', 'sample_bound',
                        'contains', 'transform', 'log_v', 'volume', 'split',
                        'split_bound', 'trim', 'update', 'write', 'read',
                        'sample_shell', 'shell_log_v')
            if inspect.getattr_static(cls, n, None) is not None])

    out.append('## Neural network emulator\n')
    emit_class(out, NeuralNetworkEmulator)

    out.append('## Pools and parallelism\n')
    out.append(_doc(pool_mod) + '\n')
    for name in ('Pool', 'SamplerPool'):
        if hasattr(pool_mod, name):
            emit_class(out, getattr(pool_mod, name))
    out.append('### `nautilus_tpu.parallel`\n')
    out.append(_doc(parallel.mesh) + '\n')
    for fname in parallel.__all__:
        emit_function(out, getattr(parallel, fname), level=4)

    out.append('## Utilities\n')
    emit_class(out, KeyStream)
    for fname in ('warmup', 'warmup_seconds', 'fetch', 'fetch_many',
                  'put_tree', 'to_host'):
        if hasattr(fetch_mod, fname):
            emit_function(out, getattr(fetch_mod, fname), level=3)

    path = os.path.join(os.path.dirname(__file__), 'api.md')
    with open(path, 'w') as f:
        f.write('\n'.join(out))
    print('wrote {} ({} blocks)'.format(path, len(out)))


if __name__ == '__main__':
    main()

"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Note: the environment pre-imports jax and registers the remote TPU backend
via a sitecustomize hook, so env vars alone are too late — the platform must
be switched through jax.config before any backend is instantiated.
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

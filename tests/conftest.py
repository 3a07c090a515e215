"""Test config: run everything on a virtual 8-device CPU mesh.

The bench image preloads jax at interpreter start (sitecustomize) and its
axon hook pins ``jax_platforms="axon,cpu"`` via jax.config — so neither
JAX_PLATFORMS env nor os.environ.setdefault can move tests off the TPU
tunnel. Re-updating jax.config before any backend use is the only
override that sticks. XLA_FLAGS is still read at (lazy) CPU backend
initialization, so setting it here works.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'      # for any fresh subprocesses
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402  (may already be imported by sitecustomize)

jax.config.update('jax_platforms', 'cpu')

"""Regression test for driver-entry hermeticity.

Round-1 and round-2 both failed the driver's multichip dryrun because a
stray jax op escaped the forced-CPU context and dispatched to the default
accelerator backend (unusable in the driver image: libtpu mismatch).
This test reproduces the DRIVER'S invocation exactly: a fresh subprocess
with the default platform priority (accelerator first, if present) and
only XLA_FLAGS to provide the virtual CPU mesh.  dryrun_multichip must
succeed without ever dispatching to the default backend.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_hermetic_under_default_backend():
    env = dict(os.environ)
    # The driver provides the virtual CPU mesh this way; it does NOT
    # force JAX_PLATFORMS=cpu — the default backend stays whatever the
    # image ships (axon TPU here).  Keep any site hooks on PYTHONPATH.
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
    env.pop('JAX_PLATFORMS', None)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    proc = subprocess.run(
        [sys.executable, '-c',
         'from __graft_entry__ import dryrun_multichip; '
         'dryrun_multichip(8)'],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, (
        f'dryrun_multichip crashed under the default backend set:\n'
        f'--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}')
    assert 'OK' in proc.stdout

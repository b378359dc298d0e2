"""Slow-tier rehearsal of the AP-parity runbook (VERDICT r3 item 9).

Runs ``tools/scripts/ap_parity.sh --dry_run``: synthetic fixture -> layout
check -> create_kitti_infos -> val sweep via tools/test.py -> AP parse +
self-consistent gate. Ensures the one-command runbook works end-to-end
before real KITTI data is ever mounted.
"""

import os
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_ap_parity_dry_run():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    env['JAX_COMPILATION_CACHE_DIR'] = str(REPO / 'tests' / '.jax_cache')
    env['JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS'] = '1'
    out = subprocess.run(
        ['bash', str(REPO / 'tools' / 'scripts' / 'ap_parity.sh'), '--dry_run'],
        capture_output=True, text=True, timeout=1800, env=env, cwd=str(REPO))
    assert out.returncode == 0, (out.stdout[-3000:], out.stderr[-3000:])
    assert 'PASS' in out.stdout, out.stdout[-3000:]

"""Driver-interface regression tests for `__graft_entry__.py`.

Round-1 failure mode (VERDICT.md Missing #1): `dryrun_multichip(8)`
initialized the 1-device backend before the CPU-mesh fallback flags
could take effect, so the virtual 8-device mesh never existed.  These
tests invoke the entry exactly as the driver does — a FRESH
interpreter with no CPU-forcing env, the real platform visible — and
assert the fallback path works.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """Env as the driver sees it: no JAX_PLATFORMS / XLA_FLAGS forcing."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.e2e
def test_dryrun_multichip_from_fresh_interpreter():
    code = ("import sys; sys.path.insert(0, %r); "
            "from __graft_entry__ import dryrun_multichip; "
            "dryrun_multichip(8); print('DRYRUN_OK')" % REPO)
    r = subprocess.run([sys.executable, "-c", code], env=_driver_env(),
                       cwd=REPO, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "DRYRUN_OK" in r.stdout


def test_dryrun_multichip_inline_when_env_prepared():
    # conftest.py already forces an 8-device CPU mesh, so the inline
    # (no-subprocess) path must be taken and succeed.
    from __graft_entry__ import _env_cpu_devices, dryrun_multichip
    assert _env_cpu_devices() >= 8
    dryrun_multichip(8)


def test_env_cpu_devices_parses_without_backend_touch():
    import __graft_entry__ as g
    old_flags = os.environ.get("XLA_FLAGS")
    old_plat = os.environ.get("JAX_PLATFORMS")
    try:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
        assert g._env_cpu_devices() == 16
        os.environ["XLA_FLAGS"] = ""
        assert g._env_cpu_devices() == 1
        os.environ["JAX_PLATFORMS"] = "tpu"
        assert g._env_cpu_devices() == 0
    finally:
        if old_flags is None:
            os.environ.pop("XLA_FLAGS", None)
        else:
            os.environ["XLA_FLAGS"] = old_flags
        if old_plat is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = old_plat

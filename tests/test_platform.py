"""Hardened platform selection (morgana_tpu.platform).

In-process tests cover the already-initialised paths (the conftest forces
the CPU backend); subprocess tests cover the before-init decision itself.
"""
import os
import subprocess
import sys

import jax
import pytest

from morgana_tpu import platform as mtp


def test_backends_initialized_true_here():
    jax.devices()
    assert mtp.backends_initialized()


def test_select_matching_platform_is_noop():
    jax.devices()
    assert mtp.select_platform('cpu') == 'cpu'
    # A --device style value with an index is accepted.
    assert mtp.select_platform('cpu:0') == 'cpu'


def test_select_other_platform_fails_loudly():
    jax.devices()
    with pytest.raises(mtp.PlatformError, match='already initialised'):
        mtp.select_platform('tpu')


def test_select_other_platform_fallback():
    jax.devices()
    assert mtp.select_platform('tpu', allow_fallback=True) == 'cpu'


def test_platform_is_tpu_names():
    assert mtp._platform_is_tpu('tpu')
    assert not mtp._platform_is_tpu('cpu')
    # Unknown plugin name: jax.devices raises -> not TPU.
    assert not mtp._platform_is_tpu('no-such-plugin')


def test_tpu_request_satisfied_by_tunnel_platform(monkeypatch):
    # A tunnelled chip registers under a plugin-specific platform name
    # (e.g. 'axon') whose device_kind still says TPU; a 'tpu' request must
    # accept it instead of raising "already initialised on 'axon'".
    class _Dev:
        device_kind = 'TPU v5 lite0'

    jax.devices()
    monkeypatch.setattr(mtp, '_current_platform', lambda: 'axon')
    monkeypatch.setattr(jax, 'devices',
                        lambda name=None: [_Dev()] if name == 'axon'
                        else (_ for _ in ()).throw(RuntimeError(name)))
    assert mtp.select_platform('tpu') == 'axon'
    # A non-TPU accelerator does NOT satisfy a tpu request.
    _Dev.device_kind = 'NVIDIA H100'
    with pytest.raises(mtp.PlatformError, match='already initialised'):
        mtp.select_platform('tpu')


def _run(code):
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    repo = os.path.join(os.path.dirname(__file__), '..')
    return subprocess.run([sys.executable, '-c', code], cwd=repo, env=env,
                          capture_output=True, text=True, timeout=300)


def test_force_cpu_before_init_gets_virtual_devices():
    proc = _run(
        'from morgana_tpu import platform as p\n'
        "assert p.force_cpu(4) == 'cpu'\n"
        'import jax\n'
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        'assert len(jax.devices()) == 4, jax.devices()\n'
        "print('ok')\n")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'ok' in proc.stdout


def test_existing_xla_flags_preserved():
    proc = _run(
        'import os\n'
        "os.environ['XLA_FLAGS'] = '--xla_cpu_enable_fast_math=false'\n"
        'from morgana_tpu import platform as p\n'
        'p.force_cpu(2)\n'
        "assert '--xla_cpu_enable_fast_math=false' in os.environ['XLA_FLAGS']\n"
        'import jax\n'
        'assert len(jax.devices()) == 2\n'
        "print('ok')\n")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'ok' in proc.stdout


def test_tpu_preinit_fallback(monkeypatch):
    """A pre-init 'tpu' request on a box with no TPU honours allow_fallback
    (warn and continue on what auto-selection found) instead of raising."""
    jax.devices()
    monkeypatch.setattr(mtp, 'backends_initialized', lambda: False)
    monkeypatch.setattr(mtp, '_current_platform', lambda: 'cpu')
    assert mtp.select_platform('tpu', allow_fallback=True) == 'cpu'
    with pytest.raises(mtp.PlatformError, match='auto-selection'):
        mtp.select_platform('tpu')

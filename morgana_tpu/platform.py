"""Hardened JAX platform selection — decide the platform BEFORE backend init.

JAX binds its default platform when the first backend initialises; after
that point ``jax.config.update('jax_platforms', ...)`` no longer changes
where new arrays land, and environments whose TPU plugin pre-sets the
platform ignore the ``JAX_PLATFORMS`` env var entirely.  Every entry point
that cares about the platform — the ``--device`` CLI flag, the driver's
multi-chip dryrun, tests, bench — must therefore make the decision before
touching any backend-initialising API, and must fail loudly (with
remediation text) when it is too late.  This module is the single place
that implements that decision.

This replaces the reference's one-line device pick
(``/root/reference/morgana/experiment_builder.py:262-263``,
``'cuda:0' if torch.cuda.is_available() else 'cpu'``) with an explicit,
order-sensitive platform gate appropriate to JAX's initialise-once model.
"""
import logging
import os

__all__ = ['backends_initialized', 'select_platform', 'force_cpu',
           'enable_compilation_cache', 'PlatformError']

_HOST_COUNT_FLAG = '--xla_force_host_platform_device_count'


class PlatformError(RuntimeError):
    """Raised when a platform request can no longer be honoured."""


def backends_initialized():
    """True once any JAX backend exists in this process (platform is frozen)."""
    try:
        from jax._src import xla_bridge
        return bool(xla_bridge.backends_are_initialized())
    except Exception:
        # Private API moved: assume initialised (the conservative answer —
        # callers then only proceed when the platform already matches).
        return True


def _current_platform():
    import jax
    try:
        return jax.default_backend()
    except Exception:
        return None


def _platform_is_tpu(name):
    """True when platform ``name`` is backed by TPU silicon.

    TPU plugins may register under names other than 'tpu' (a tunnelled
    chip registers as e.g. 'axon'); the devices' ``device_kind`` string is
    the reliable signal.
    """
    if name == 'tpu':
        return True
    if name == 'cpu':
        return False
    try:
        import jax
        devs = jax.devices(name)
        return bool(devs) and \
            'tpu' in str(getattr(devs[0], 'device_kind', '')).lower()
    except Exception:
        return False


def _ensure_host_device_flag(n_devices):
    """Arrange for the CPU backend to expose ``n_devices`` virtual devices.

    Must run before the *CPU* backend is created (which is lazy and separate
    from e.g. a TPU backend, so this can still succeed after a TPU client
    exists).
    """
    flags = os.environ.get('XLA_FLAGS', '')
    if _HOST_COUNT_FLAG in flags:
        import re
        match = re.search(_HOST_COUNT_FLAG + r'=(\d+)', flags)
        have = int(match.group(1)) if match else None
        if have is not None and have >= (n_devices or 0):
            return
        if backends_initialized():
            # Too late to raise the count; the caller's device-count check
            # (or the PlatformError below) reports it.
            return
        flags = re.sub(_HOST_COUNT_FLAG + r'=\d+', '', flags).strip()
    os.environ['XLA_FLAGS'] = (flags + f' {_HOST_COUNT_FLAG}={n_devices}').strip()


def select_platform(platform, n_devices=None, allow_fallback=False):
    """Makes ``platform`` the default JAX platform, or fails loudly.

    Parameters
    ----------
    platform : str
        'cpu', 'tpu', ... (a ``--device`` value like ``tpu:0`` is accepted;
        only the platform part is used — JAX owns per-device placement).
    n_devices : int, optional
        For 'cpu': also request this many virtual host devices
        (``--xla_force_host_platform_device_count``).
    allow_fallback : bool
        If True and the backend is already initialised to something else,
        log-and-continue instead of raising (the old best-effort behaviour,
        for interactive use).

    Returns the platform actually in effect.
    """
    platform = str(platform).split(':')[0].lower()
    if platform == 'cpu' and n_devices:
        _ensure_host_device_flag(n_devices)

    import jax
    if not backends_initialized():
        if platform == 'tpu':
            # A TPU may register under a plugin-specific platform name (a
            # tunnelled chip registers as e.g. 'axon'); pinning
            # jax_platforms='tpu' would bypass that plugin and fail with
            # "no TPU found" even though a TPU is present.  Let JAX's
            # auto-selection pick the best available backend (accelerator
            # plugins outrank cpu), then verify an accelerator won.
            os.environ['JAX_PLATFORMS'] = ''
            jax.config.update('jax_platforms', None)
            got = _current_platform()  # initialises the default backend
            if got is None or _platform_is_tpu(got):
                return got or platform
            if allow_fallback:
                logging.getLogger('morgana_tpu').warning(
                    "requested platform 'tpu' but no TPU backend is "
                    "available; continuing on '%s'.", got)
                return got
            raise PlatformError(
                f"requested platform 'tpu' but JAX auto-selection resolved "
                f"to '{got}' — no TPU backend is available in this process.")
        # The env var alone is ignored where a TPU plugin pre-sets the
        # platform; the config update always wins when applied this early.
        os.environ['JAX_PLATFORMS'] = platform
        jax.config.update('jax_platforms', platform)
        return platform

    current = _current_platform()
    if platform == 'tpu' and current is not None and _platform_is_tpu(current):
        return current
    if current == platform:
        if platform == 'cpu' and n_devices and \
                len(jax.devices('cpu')) < n_devices:
            # Fail-loudly contract: "success" with too few virtual devices
            # would just move the failure to an unrelated mesh error later.
            raise PlatformError(
                f'need {n_devices} CPU devices but the CPU backend already '
                f'initialised with {len(jax.devices("cpu"))}. Set XLA_FLAGS='
                f'{_HOST_COUNT_FLAG}={n_devices} at process start, or call '
                f'select_platform before any JAX work.')
        return platform
    if allow_fallback:
        return current
    raise PlatformError(
        f"JAX backend already initialised on '{current}'; cannot switch the "
        f"default platform to '{platform}'. Call "
        f"morgana_tpu.platform.select_platform('{platform}') before any JAX "
        f"API that creates arrays or lists devices (imports are fine), or "
        f"start a fresh process.")


def enable_compilation_cache(cache_dir):
    """Points JAX's persistent compilation cache at ``cache_dir``.

    Compiled programs (train step, serving predict programs per length
    bucket) are written to disk and reloaded by later processes, eliminating
    the cold-start compile on restart — the production-serving knob for
    process churn, rolling restarts, and autoscaling. Thresholds are lowered
    so every program is cached (the default minimums skip fast-compiling
    programs, which is exactly wrong for latency-sensitive serving
    restarts). Safe to call at any time (the cache is consulted per
    compilation, not at backend init).
    """
    import jax
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', str(cache_dir))
    for name, value in (('jax_persistent_cache_min_compile_time_secs', 0.0),
                        ('jax_persistent_cache_min_entry_size_bytes', -1)):
        try:
            jax.config.update(name, value)
        except Exception:
            pass  # knob renamed/absent in this JAX: defaults still cache
    return str(cache_dir)


def force_cpu(n_devices=None):
    """Forces the CPU platform with ``n_devices`` virtual devices.

    The fake-backend recipe for validating multi-chip sharding without
    hardware: combined with a ``jax.sharding.Mesh`` over the virtual
    devices, ``jit`` compiles and executes the same GSPMD program it would
    on a real slice. Raises :class:`PlatformError` if a non-CPU backend
    already owns the process.
    """
    return select_platform('cpu', n_devices=n_devices)

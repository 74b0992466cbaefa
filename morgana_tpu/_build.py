"""On-demand compilation of the in-tree native (C++) libraries.

The shared objects are build artefacts (not checked in); ctypes loaders call
:func:`ensure_built` which compiles the corresponding ``csrc/*.cpp`` with g++
on first use. Failures are non-fatal — callers fall back to NumPy paths.

Each library exports an ABI-version function (e.g. ``morgana_world_synth_abi``)
that :func:`load_library` checks before handing the handle to callers: a stale
prebuilt ``.so`` whose entry-point signatures predate the current bindings
would otherwise be called with shifted pointer arguments (memory corruption
instead of a clean NumPy fallback).
"""
import ctypes
import logging
import os
import subprocess
import threading

logger = logging.getLogger('morgana_tpu')

_LOCK = threading.Lock()

CXX_FLAGS = ['-O3', '-march=native', '-shared', '-fPIC', '-std=c++17', '-pthread']


def _fresh(lib_path, source_path):
    """True when ``lib_path`` exists and is no older than its source (a
    missing source counts as fresh: build artefacts may outlive csrc/ in
    a partial checkout, and failures here must stay non-fatal)."""
    if not os.path.exists(lib_path):
        return False
    if not os.path.exists(source_path):
        return True
    return os.path.getmtime(lib_path) >= os.path.getmtime(source_path)


def ensure_built(lib_path, source_path):
    """Builds ``lib_path`` from ``source_path`` if missing or stale.
    Returns True when the library exists afterwards."""
    if _fresh(lib_path, source_path):
        return True
    with _LOCK:
        if _fresh(lib_path, source_path):
            return True
        try:
            subprocess.run(
                ['g++', *CXX_FLAGS, source_path, '-o', lib_path],
                check=True, capture_output=True, timeout=300)
            logger.info('Built native library %s', lib_path)
            return True
        except (OSError, subprocess.SubprocessError) as e:
            logger.warning('Could not build %s (%s); using NumPy fallback',
                           lib_path, e)
            return False


def load_library(lib_path, source_path, abi_symbol, abi_version):
    """Builds (if needed), loads and ABI-checks a native library.

    Returns the ``ctypes.CDLL`` handle, or None when the library cannot be
    built/loaded or its exported ``abi_symbol()`` does not return
    ``abi_version`` (missing symbol counts as mismatch). On mismatch, one
    rebuild from source is attempted — the usual cause is a stale prebuilt
    ``.so`` older than the current bindings.
    """
    ensure_built(lib_path, source_path)
    for attempt in range(2):
        if not os.path.exists(lib_path):
            return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError:
            return None
        try:
            fn = getattr(lib, abi_symbol)
            fn.restype = ctypes.c_longlong
            fn.argtypes = []
            found = int(fn())
        except (AttributeError, OSError):
            found = None
        if found == abi_version:
            return lib
        logger.warning('%s: ABI %s != expected %s%s', lib_path, found,
                       abi_version,
                       '; rebuilding' if attempt == 0 else '; using NumPy fallback')
        if attempt == 0:
            try:
                os.unlink(lib_path)
            except OSError:
                return None
            if not ensure_built(lib_path, source_path):
                return None
    return None

"""On-demand compilation of the in-tree native (C++) libraries.

The shared objects are build artefacts (not checked in); ctypes loaders call
:func:`ensure_built` which compiles the corresponding ``csrc/*.cpp`` with g++
on first use. Failures are non-fatal — callers fall back to NumPy paths.
"""
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

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


def ensure_built(lib_path, source_path):
    """Builds ``lib_path`` from ``source_path`` if missing or stale.
    Returns True when the library exists afterwards."""
    if os.path.exists(lib_path) and \
            os.path.getmtime(lib_path) >= os.path.getmtime(source_path):
        return True
    with _LOCK:
        if os.path.exists(lib_path) and \
                os.path.getmtime(lib_path) >= os.path.getmtime(source_path):
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

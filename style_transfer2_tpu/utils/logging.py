"""Process-wide logging/exception/signal setup (reference utils.py:163-190)."""

import logging
import signal
import sys


def setup_exceptions(mode='Plain', color_scheme='Neutral'):
    """Uses IPython's ultratb for readable tracebacks when available."""
    try:
        from IPython.core import ultratb
        sys.excepthook = ultratb.AutoFormattedTB(mode=mode, color_scheme=color_scheme)
    except Exception:
        pass


def setup_logging(debug=0):
    """Configures per-process logging with PID in the format; DEBUG at -d,
    aiohttp access logs gated at debug>=2 (reference utils.py:172-185)."""
    fmt = '%(asctime)s.%(msecs)03d %(process)d %(name)s %(levelname)s: %(message)s'
    datefmt = '%H:%M:%S'
    level = logging.DEBUG if debug else logging.INFO
    logging.basicConfig(level=level, format=fmt, datefmt=datefmt)
    if debug <= 1:
        logging.getLogger('aiohttp.access').setLevel(logging.WARNING)
    else:
        from ..serve import messages
        messages.Message.debug = True
    logging.captureWarnings(True)


def setup_signals():
    """Makes SIGHUP raise KeyboardInterrupt for clean terminal-hangup shutdown."""
    def handler(*args):
        raise KeyboardInterrupt()
    try:
        signal.signal(signal.SIGHUP, handler)
    except (ValueError, OSError):
        pass  # not the main thread, or unsupported platform


def enable_compile_cache(path=None):
    """Points JAX's persistent compilation cache at the repo's .jax_cache:
    every distinct (resolution, K) pair is a fresh XLA program, and remote
    TPU compiles over the tunnel take minutes — the cache makes them
    one-time. Call before the first jit dispatch."""
    import jax
    from pathlib import Path
    if path is None:
        path = Path(__file__).resolve().parents[2] / '.jax_cache'
    jax.config.update('jax_compilation_cache_dir', str(path))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

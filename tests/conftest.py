"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4)."""

import os
import resource

# XLA:CPU's LLVM pipeline recurses deeply while compiling the engine's large
# frame programs; with the default 8 MB stack the suite segfaults
# intermittently inside backend_compile_and_load (observed repeatedly on
# this sandbox).  The hard limit is unlimited — let the main stack grow.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY:
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
    except (ValueError, OSError):
        pass

# Tests run on a virtual 8-device CPU mesh.  The sandbox's sitecustomize
# eagerly registers the axon TPU backend at interpreter start, so env vars
# alone are too late — force the platform through jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the engine's frame programs are large and the
# suite re-traces them for several EngineConfigs; on a small-CPU box the
# compiles dominate wall time (and repeated in-process giant compiles have
# produced flaky XLA:CPU segfaults).  Cache them on disk across runs.
#
# The cache dir is keyed by HOST CPU features + jaxlib version: XLA:CPU AOT
# entries bake in machine feature sets, and entries written on a different
# sandbox node load with cpu_aot_loader warnings ("+prefer-no-gather ... not
# supported on the host machine ... could lead to SIGILL") and then crash the
# suite at run time.  A foreign host simply misses and recompiles.
import hashlib as _hashlib  # noqa: E402
import platform as _platform  # noqa: E402

import jaxlib  # noqa: E402


def _host_cache_fingerprint() -> str:
    feat = _platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    feat += " " + getattr(jaxlib, "__version__", "?")
    return _hashlib.md5(feat.encode()).hexdigest()[:12]


jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache",
                 _host_cache_fingerprint()),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# Quarantine cache WRITES in a forked child: XLA:CPU executable
# serialization (`executable.serialize()` inside put_executable_and_time)
# has segfaulted the suite process intermittently on the engine's large
# frame programs (observed faulthandler stacks end in
# compilation_cache.put_executable_and_time).  A crash in the child loses
# one cache entry; the parent (and the suite) continue.  READS are
# quarantined too (see _canaried_get below): deserialize has crashed the
# suite on the same jaxlib XLA:CPU AOT bug, so a forked canary child
# deserializes first and a crash there downgrades to a cache miss.
import signal as _signal  # noqa: E402
import time as _time  # noqa: E402

from jax._src import compilation_cache as _cc  # noqa: E402

_orig_put = _cc.put_executable_and_time
_orig_get = _cc.get_executable_and_time
_IN_COMPILE_CHILD = False


def _child_cpu_ticks(pid: int):
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        return int(parts[11]) + int(parts[12])  # utime + stime
    except (OSError, IndexError, ValueError):
        return None


def _watch_child(pid: int, idle_timeout: float, hard_timeout: float):
    """Reap a forked worker.  Returns its wait status, or None if it was
    killed.  A fork can inherit a held lock and wedge at 0% CPU (observed:
    an 18-minute dead compile child) — so the watchdog kills on NO CPU
    PROGRESS for `idle_timeout`, while real work may run to `hard_timeout`."""
    start = _time.monotonic()
    last_ticks = -1
    last_progress = start
    while True:
        done, status = os.waitpid(pid, os.WNOHANG)
        if done:
            return status
        now = _time.monotonic()
        ticks = _child_cpu_ticks(pid)
        if ticks is not None and ticks != last_ticks:
            last_ticks = ticks
            last_progress = now
        if now - last_progress > idle_timeout or now - start > hard_timeout:
            try:
                os.kill(pid, _signal.SIGKILL)
                os.waitpid(pid, 0)
            except OSError:
                pass
            return None
        _time.sleep(0.05)


def _quarantined_put(cache_key, module_name, executable, backend,
                     compile_time):
    if _IN_COMPILE_CHILD:
        # already inside a quarantined compile child: write the entry
        # directly — a serialize crash kills the (retryable) child instead
        # of silently losing the entry behind a grandchild fork
        return _orig_put(cache_key, module_name, executable, backend,
                         compile_time)
    try:
        pid = os.fork()
    except OSError:
        # fork can fail under memory pressure (multi-GB suite process).
        # Do NOT fall back to a parent-side write: executable.serialize()
        # is exactly the call that segfaults (jaxlib XLA:CPU AOT bug) and
        # in the parent it takes the whole suite down.  Skip the entry.
        return
    if pid == 0:
        try:
            _orig_put(cache_key, module_name, executable, backend,
                      compile_time)
            os._exit(0)
        except BaseException:
            os._exit(1)
    # wedged child (lock inherited across fork): reap fast, skip the entry
    _watch_child(pid, idle_timeout=15.0, hard_timeout=300.0)


_cc.put_executable_and_time = _quarantined_put


def _canaried_get(cache_key, compile_options, backend, executable_devices):
    """Cache read with a forked deserialize canary: the child attempts the
    full get (decompress + backend.deserialize_executable); only if it exits
    cleanly does the parent run the real call.  A segfaulting entry costs a
    recompile instead of the whole suite process."""
    try:
        pid = os.fork()
    except OSError:
        return None, None  # treat as miss under memory pressure
    if pid == 0:
        try:
            exe, _t = _orig_get(cache_key, compile_options, backend,
                                executable_devices)
            os._exit(0 if exe is not None else 2)
        except BaseException:
            os._exit(1)
    status = _watch_child(pid, idle_timeout=15.0, hard_timeout=300.0)
    if status is None or not os.WIFEXITED(status) or os.WEXITSTATUS(status) != 0:
        return None, None  # child crashed/wedged or missed: recompile
    return _orig_get(cache_key, compile_options, backend, executable_devices)


_cc.get_executable_and_time = _canaried_get

# Quarantine the COMPILE itself: the flakiest crash site of this jaxlib on
# XLA:CPU is inside backend_compile_and_load (observed segfaulting the whole
# suite on large engine modules, most recently via test_fuse_pallas).  The
# child compiles AND writes the cache entry, then the parent loads the entry
# through the canaried read path — a compiler segfault costs one retry
# instead of the suite process.  Parent falls back to an in-process compile
# when the child crashes twice or the entry wasn't cacheable (<1 s compiles).
from jax._src import compiler as _compiler  # noqa: E402

_orig_cawc = _compiler._compile_and_write_cache


def _quarantined_compile(backend, computation, executable_devices,
                         compile_options, host_callbacks, module_name,
                         cache_key):
    # quarantine EVERY compile: parent-process crashes were observed on
    # successively smaller modules (300 KB, 50 KB, then under 5 KB), so no
    # size gate is safe; the 6 s CPU-progress watchdog keeps fork wedges
    # cheap and non-wedged tiny compiles only pay ~a fork
    crashed = 0
    for _attempt in range(2):
        try:
            pid = os.fork()
        except OSError:
            break
        if pid == 0:
            global _IN_COMPILE_CHILD
            _IN_COMPILE_CHILD = True
            try:
                _orig_cawc(backend, computation, executable_devices,
                           compile_options, host_callbacks, module_name,
                           cache_key)
                os._exit(0)
            except BaseException:
                os._exit(1)
        # a real compile burns CPU continuously; a fork-wedged child sits at
        # 0% — kill on 10 s of no progress instead of waiting out a deadline
        status = _watch_child(pid, idle_timeout=3.0, hard_timeout=2400.0)
        if status is None:
            continue  # wedged: retry the fork
        if os.WIFEXITED(status) and os.WEXITSTATUS(status) == 0:
            exe, _t = _cc.get_executable_and_time(
                cache_key, compile_options, backend, executable_devices
            )
            if exe is not None:
                return exe
            break  # compiled fine but uncacheable: recompile in-process
        crashed += 1
    if crashed >= 2:
        # the module crashes the compiler deterministically: fail THIS test
        # cleanly instead of segfaulting the whole suite in-process
        raise RuntimeError(
            "XLA:CPU compiler crashed in 2 quarantined attempts for "
            f"module {module_name!r} (known flaky jaxlib bug)"
        )
    return _orig_cawc(backend, computation, executable_devices,
                      compile_options, host_callbacks, module_name, cache_key)


_compiler._compile_and_write_cache = _quarantined_compile

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from elasticfusion_tpu.config import CameraConfig, EngineConfig  # noqa: E402


@pytest.fixture(scope="session")
def small_cam() -> CameraConfig:
    # 160x120 keeps CPU tests fast; fx scaled from the 640-wide default
    return CameraConfig(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


@pytest.fixture(scope="session")
def small_cfg(small_cam) -> EngineConfig:
    return EngineConfig(camera=small_cam)


@pytest.fixture(scope="session")
def scene():
    from elasticfusion_tpu.utils.synthetic import make_scene

    return make_scene(n_side=700)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running accuracy pins (full-resolution solves)"
    )

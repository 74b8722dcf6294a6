"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Standard JAX fake-multi-device pattern (SURVEY §4): multi-chip code paths are
validated on a virtual CPU mesh; the real TPU is only used by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # the 8 virtual devices run collectives on one thread each; on a loaded
    # single-core host the default 40s rendezvous termination timeout
    # abort()s the whole process (xla/.../rendezvous.cc:127)
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon environment pre-registers the TPU platform regardless of the env
# var; jax.config wins over it.
jax.config.update("jax_platforms", "cpu")

# Host-side eval math (triangulation, camera algebra) runs in float64 in the
# reference; enable x64 so float64 test inputs stay float64.  Model params
# remain float32 (flax default) regardless.
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: CPU compiles of the big train-step /
# model-init programs dominate suite wall-time; cache them across runs.
# The dir is keyed by a host-CPU fingerprint: XLA's cache key does NOT
# include the detected CPU features, so an entry AOT-compiled on an
# avx512 host loads on a non-avx512 host (cpu_aot_loader warns, numerics
# drift vs freshly-compiled programs, SIGILL possible).  Observed: a stale
# cache made 1-dev and 8-dev grads differ 2.8e-2 where fresh compiles are
# bit-identical.
def _cpu_fingerprint():
    import hashlib
    key = jax.__version__  # XLA target configs differ across jaxlibs too
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key += line
                    break
    except OSError:
        pass
    return hashlib.sha1(key.encode()).hexdigest()[:12]


_cache_dir = os.environ.get(
    "JAX_TEST_CACHE", f"/tmp/jax_test_comp_cache_{_cpu_fingerprint()}")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def make_camera_ring(n_views=4, radius=4000.0, target=(0.0, 0.0, 1000.0), focal=1000.0,
                     image_size=(256, 256)):
    """Build a synthetic ring of cameras looking at `target` (world mm units).

    Returns dict with K, R, T (camera center), RT=[R|-R T], KRT stacks.
    """
    H, W = image_size
    Ks, Rs, Ts = [], [], []
    target = np.asarray(target, dtype=np.float64)
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views + 0.3
        center = np.array([radius * np.cos(ang), radius * np.sin(ang), 1200.0 + 100.0 * i])
        z = target - center
        z = z / np.linalg.norm(z)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(z, up)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # world -> camera rows
        K = np.array([[focal, 0.0, W / 2.0], [0.0, focal, H / 2.0], [0.0, 0.0, 1.0]])
        Ks.append(K)
        Rs.append(R)
        Ts.append(center)
    Ks, Rs, Ts = map(np.array, (Ks, Rs, Ts))
    RTs = np.concatenate([Rs, -Rs @ Ts[..., None]], axis=-1)
    KRTs = Ks @ RTs
    return {"K": Ks, "R": Rs, "T": Ts, "RT": RTs, "KRT": KRTs, "image_size": image_size}


@pytest.fixture
def camera_ring():
    return make_camera_ring()


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_cache():
    """Drop live compiled executables after each test module.

    The suite compiles hundreds of programs; retained executables (with
    baked-in constants) grow the process toward the machine's commit limit
    and end in a native abort around test ~250 (no swap, overcommit=0).
    The persistent on-disk compilation cache keeps any recompiles cheap.
    """
    yield
    jax.clear_caches()

import os

# Tests run on a virtual 8-device CPU mesh (the driver validates multi-chip
# sharding separately via __graft_entry__.dryrun_multichip on real shapes).
# Force CPU (the external environment pins JAX_PLATFORMS to the real chip;
# correctness tests want the virtual mesh + float64).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup, so the
# JAX_PLATFORMS env assignment above is too late there — pin the platform
# through the live config as well (this is what actually takes effect).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache DISABLED for the suite: jaxlib 0.9 aborts
# ("Fatal Python error: Aborted" in get_executable_and_time) when
# deserializing some of this suite's executables (reproduced with a
# fresh cache directory); recompiling costs ~1 min per full run
jax.config.update("jax_compilation_cache_dir", None)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules: the full suite
    compiles hundreds of programs in one process and jaxlib's CPU backend
    segfaults late in the run (reproducibly around the ~90th test, gone
    when the module runs alone) once that state accumulates."""
    yield
    jax.clear_caches()

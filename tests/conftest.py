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
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

"""Test configuration: force CPU backend with 8 virtual devices so sharding
logic is exercised without TPU hardware (SURVEY.md §4 implication 3)."""

import os

# the axon sitecustomize pre-sets JAX_PLATFORMS=axon (real TPU via tunnel);
# tests must run on the virtual-device CPU mesh, so force-override it
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already baked into the live config — override it here
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", "/tmp/gaussreg_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


"""Test configuration: run the suite on a simulated 8-device CPU mesh.

Multi-chip sharding logic is tested the JAX-native way (SURVEY.md §4):
``xla_force_host_platform_device_count=8`` gives 8 virtual CPU devices, so
shard_map/pjit paths execute real collectives without TPU hardware.  f64 is
enabled so certification-grade ground truth is available; f32 paths are
exercised by passing explicitly-typed arrays.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Persistent XLA compilation cache: most suite time is CPU-backend compiles
# of the jitted solver programs, which are identical across test runs.  The
# cache lives in-repo (gitignored) so repeat runs skip compilation entirely.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

jax.config.update("jax_enable_x64", True)
# NOTE: this environment force-registers a remote TPU backend via
# sitecustomize and IGNORES `JAX_PLATFORMS=cpu`; pinning the default
# device is the reliable way to keep the test suite off the TPU tunnel.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

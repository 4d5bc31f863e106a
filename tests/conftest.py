"""Test config: force a virtual 8-device CPU mesh so sharding code paths are
exercised without TPU hardware and with full fp32 precision (TPU fp32
matmuls default to bf16 passes, which breaks the numerical golden tests).
Must run before any jax import, hence env mutation at conftest import time.
The driver separately dry-runs multi-chip via __graft_entry__.dryrun_multichip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (sitecustomize) registers itself regardless of
# JAX_PLATFORMS; the config update below takes precedence over it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

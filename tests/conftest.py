# Force tests onto a virtual 8-device CPU mesh so multi-chip sharding is exercised
# without TPU hardware. The axon TPU plugin (sitecustomize) pins jax_platforms via
# jax.config at interpreter boot, so the env var alone is not enough — we must
# update jax.config before any device is touched.
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

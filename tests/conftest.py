"""Test harness config: run on a virtual 8-device CPU mesh.

This is the "fake backend" strategy from SURVEY.md §4: multi-chip sharding
is validated on `xla_force_host_platform_device_count=8` CPU devices.

The session environment boots the tunneled-TPU backend via sitecustomize and
pins `jax_platforms` through `jax.config` (env vars are already consumed),
so forcing CPU requires BOTH the XLA flag in the env (before the CPU client
initializes) and a config update (to beat the sitecustomize pin).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

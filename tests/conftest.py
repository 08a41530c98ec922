"""Test harness config: run on a virtual 8-device CPU mesh.

Must set env before jax is first imported anywhere in the test process —
this is the "fake backend" strategy from SURVEY.md §4: multi-chip sharding
is validated on `xla_force_host_platform_device_count=8` CPU devices.
"""

import os

# Overwrite, not setdefault: the session environment presets
# JAX_PLATFORMS=axon (the tunneled TPU); tests must run on local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

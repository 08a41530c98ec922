"""Test harness config: two lanes.

- Default lane (`RTP_BACKEND` unset or "cpu"): a virtual 8-device CPU mesh —
  the "fake backend" strategy from SURVEY.md §4 for validating multi-chip
  sharding without chips (xla_force_host_platform_device_count=8).
- TPU lane (`RTP_BACKEND=tpu`): runs on the real chip. Tests marked
  `@pytest.mark.tpu` ONLY run here (they exercise compiled Pallas kernels,
  hardware PRNG, full-res goldens); run them with
  `RTP_BACKEND=tpu python -m pytest tests/ -m tpu`.

The session environment boots the tunneled-TPU backend via sitecustomize and
pins `jax_platforms` through `jax.config` (env vars are already consumed),
so forcing CPU requires BOTH the XLA flag in the env (before the CPU client
initializes) and a config update (to beat the sitecustomize pin).
"""

import os

import pytest

RTP_BACKEND = os.environ.get("RTP_BACKEND", "cpu").lower()

if RTP_BACKEND == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    if RTP_BACKEND == "tpu":
        return
    skip_tpu = pytest.mark.skip(reason="needs RTP_BACKEND=tpu (real-chip lane)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)

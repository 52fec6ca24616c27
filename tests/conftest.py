"""Test harness: force an 8-device CPU mesh so pjit/GSPMD/sync-BN paths are
exercised without TPU hardware (SURVEY.md sec 4 prescription).

NOTE: this container's sitecustomize registers an `axon` TPU plugin and
presets JAX_PLATFORMS=axon, so a plain setdefault is not enough — we must
overwrite the env var BEFORE jax import AND force the config after, otherwise
tests silently run over the (single-chip, sometimes flaky) TPU tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()
assert jax.device_count() == 8, jax.devices()

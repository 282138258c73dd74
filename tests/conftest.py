"""Test configuration: force an 8-device virtual CPU platform (the TPU-world
"fake backend" per SURVEY.md §4) and enable x64.

The axon environment registers a TPU backend via sitecustomize and sets
jax_platforms programmatically (env vars alone are overridden), so the config
update below must happen before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import slampp_tpu  # noqa: E402,F401  (enables x64 at import)

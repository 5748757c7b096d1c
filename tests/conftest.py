"""Test configuration: force CPU with a virtual 8-device mesh.

Tests must run hermetically without TPU hardware. Multi-chip sharding tests use
XLA's host-platform device-count override, mirroring how the driver validates
`__graft_entry__.dryrun_multichip`.

Note: this environment ships a jax build that force-registers the experimental
'axon' TPU platform regardless of the JAX_PLATFORMS env var, so we must also
override the config value explicitly after importing jax.
"""

import os

# Must be set before jax initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

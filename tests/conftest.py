"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (SURVEY.md §4: the natural JAX
equivalent of distributed testing for this framework).

Note: in some environments a PJRT plugin overrides JAX_PLATFORMS at
interpreter startup, so the platform must be forced via jax.config here,
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Pin the measured-policy production default OFF for the suite: parity tests
# must exercise exactly the lowering paths their explicit knobs name,
# independent of whatever artifacts/measured_policy.json the TPU ladder last
# wrote.  tests/test_dispatch.py covers the fallback itself via
# CSDT_POLICY_FILE.
os.environ.setdefault("CSDT_MEASURED_POLICY", "0")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

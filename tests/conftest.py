"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run on a virtual mesh (SURVEY.md §4 "TPU
translation"). Must run before any test module imports jax.

Note: under the axon TPU plugin the JAX_PLATFORMS *env var* is ignored;
`jax.config.update("jax_platforms", ...)` is required.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Suite-time guard: the round-5 default param search CONFIRMS the
# chosen N by actually running each program (MeasuredModel, reference
# parity). Dozens of compiler tests would each pay a full program
# execution on the CPU backend; keep the suite on the analytic filter
# and let the dedicated measured-model tests opt back in explicitly.
os.environ.setdefault("SUNSCREEN_TPU_MEASURED_SEARCH", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

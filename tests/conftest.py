"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip shardings are validated here the way a TPU pod slice would run
them (the driver separately dry-runs the multi-chip path; real-chip perf is
measured by bench.py on the actual TPU).

Note: this environment's sitecustomize registers a tunneled TPU backend
("axon") and forces ``jax_platforms="axon,cpu"``; backend init dials the
tunnel and can take minutes.  We override the config to CPU-only *before*
any backend initialization so the test suite stays fast and hermetic.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

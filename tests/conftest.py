"""Test harness setup: force the CPU backend with 8 virtual devices so
distributed (DP/psum) semantics are testable without a TPU pod
(SURVEY.md §4.2 "Distributed (no cluster)").

Note: this environment's axon sitecustomize force-registers the TPU backend
and pins ``jax_platforms`` via config.update at interpreter start, so the
``JAX_PLATFORMS`` env var alone is NOT enough — we must update the jax
config explicitly (env set first so a non-axon environment behaves too).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Do NOT register a TPU session from the test suite: with the axon
# sitecustomize, ANY jax import that leaves PALLAS_AXON_POOL_IPS set claims
# a session on the remote-compile service, and a concurrent session wedges
# in-flight TPU jobs (see .claude/skills/verify/SKILL.md).  Tests are
# CPU-only; clear it before jax initializes.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

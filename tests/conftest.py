"""Test env: force CPU backend with 8 virtual devices so sharding tests run
anywhere (per-chip numerics are identical; the real TPU is exercised by
bench.py and __graft_entry__.py).

NOTE: the environment pre-imports jax at interpreter start (sitecustomize
registers the TPU PJRT plugin and sets JAX_PLATFORMS), so mutating
os.environ["JAX_PLATFORMS"] here is too late — we must go through
jax.config.update BEFORE the first backend initialization. XLA_FLAGS is still
read lazily at backend init, so setting it here works.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

# Parity tests compare against torch f32; JAX's default matmul precision on
# some backends is reduced (bf16-ish passes) which swamps the tolerances.
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.local_device_count() == 8 or jax.default_backend() == "cpu"

"""Test harness config: force CPU JAX with 8 virtual devices.

NOTE: this machine's axon site-customization sets JAX_PLATFORMS=axon at
interpreter startup, so the env var cannot be overridden from here — use
jax.config.update after import instead (it wins).  The XLA flag must be
in place before the CPU backend is first initialized.

Set FUGU_TEST_TPU=1 to run the suite against the real chip instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if not os.environ.get("FUGU_TEST_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

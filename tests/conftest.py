"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Note: in this environment the TPU ('axon') plugin registers itself even when
JAX_PLATFORMS=cpu is set, so we additionally pin jax_default_device to CPU
after import. All tests are hermetic on CPU; multi-chip sharding is validated
on the 8 virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

_cpus = jax.devices("cpu")
jax.config.update("jax_default_device", _cpus[0])


def cpu_devices():
    return _cpus

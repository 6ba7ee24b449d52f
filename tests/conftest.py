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

if os.environ.get("RUN_TPU_TESTS") != "1":
    # The axon sitecustomize force-sets jax_platforms="axon,cpu" at
    # interpreter start (overriding JAX_PLATFORMS=cpu from the env), so ANY
    # backend query — even jax.devices("cpu") — first initializes the axon
    # plugin and dials the TPU tunnel; during a tunnel outage that blocks
    # forever. Re-assert cpu-only BEFORE the first device query so the suite
    # is hermetic regardless of tunnel state.
    jax.config.update("jax_platforms", "cpu")

_cpus = jax.devices("cpu")
jax.config.update("jax_default_device", _cpus[0])


def cpu_devices():
    return _cpus

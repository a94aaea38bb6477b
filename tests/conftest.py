"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host-platform virtual devices
(SURVEY.md section 4: the fake-cluster substitute); the real-TPU bench path
lives in bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

"""Test configuration: force an 8-device virtual CPU mesh.

The image pins JAX to the 'axon' TPU tunnel via sitecustomize; tests run on
CPU (jax.config overrides the pinned platform) with 8 virtual devices so
multi-device sharding paths are exercised without TPU hardware.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

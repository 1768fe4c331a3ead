"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharded code paths are
validated on a host-platform mesh (the JAX analogue of the reference's
parallel_threads system tests, tests/systemtests/systemtests.m:8).

Note: the environment preloads jax with JAX_PLATFORMS=axon (tunneled TPU)
via sitecustomize, so env vars are too late here — the config API is the
only reliable override.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

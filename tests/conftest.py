"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This is the JAX "fake backend" idiom (SURVEY.md §4): multi-chip sharding
tests run on N virtual CPU devices via
``--xla_force_host_platform_device_count`` so no TPU pod is required.

The image boots every Python process through an axon TPU-tunnel
``sitecustomize`` (PYTHONPATH=/root/.axon_site) whose PJRT registration makes
the first device->host transfer stall for minutes even when
``JAX_PLATFORMS=cpu``.  Since that hook runs at interpreter start (before any
conftest), the only reliable fix is to re-exec pytest once with a scrubbed
environment.
"""

import os
import sys

if os.environ.get("_GYMOTHELLO_TEST_ENV") != "1":
    env = dict(os.environ)
    env["_GYMOTHELLO_TEST_ENV"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    # Drop the axon sitecustomize (see module docstring).
    env.pop("PYTHONPATH", None)
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

sys.path.insert(0, os.path.dirname(__file__))

# NOTE: jax's persistent compilation cache was tried here and reverted —
# its XLA:CPU AOT blobs fail to reload on this machine ("+prefer-no-gather
# is not supported on the host machine"), so every hit recompiles anyway
# and the loader spams stderr.

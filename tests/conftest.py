"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter start (and rewrites XLA_FLAGS), so plain env vars set here
are too late for JAX_PLATFORMS. Setting XLA_FLAGS before the (lazy) CPU
client is created plus jax.config.update("jax_platforms") reliably pins
tests to a virtual 8-device CPU platform for sharding coverage.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_SCENES = Path("/root/reference/data/static")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_scene_dir():
    if not REFERENCE_SCENES.exists():
        pytest.skip("reference scene directory unavailable")
    return REFERENCE_SCENES

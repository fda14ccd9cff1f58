"""Test configuration: force an 8-device CPU mesh before jax imports.

Multi-chip TPU hardware is not available in CI; all sharding tests run on
a virtual 8-device CPU platform. Must be set before jax initializes.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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

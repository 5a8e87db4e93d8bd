"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the real
multi-chip path via __graft_entry__.dryrun_multichip). This must run before
jax is imported anywhere.
"""

import os
import subprocess
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores JAX_PLATFORMS env; force CPU via the config
# API instead (must happen before any backend initialization).
import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / "tests" / "data"
REF_FFMPEG = Path("/tmp/ffbuild/ffmpeg")
REF_FFPROBE = Path("/tmp/ffbuild/ffprobe")


def have_ref() -> bool:
    return REF_FFMPEG.exists()


def run_ref(args, **kw):
    """Run the locally built reference ffmpeg binary."""
    return subprocess.run(
        [str(REF_FFMPEG), "-hide_banner", "-nostdin", *args],
        check=True, capture_output=True, **kw)


@pytest.fixture(scope="session")
def ref_ffmpeg():
    if not have_ref():
        pytest.skip("reference ffmpeg binary not built (/tmp/ffbuild)")
    return run_ref


requires_ref = pytest.mark.skipif(
    not have_ref(), reason="reference ffmpeg not built")

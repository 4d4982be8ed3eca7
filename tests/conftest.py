"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh
(xla_force_host_platform_device_count) — no TPU needed to run the suite.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize force-registers a TPU platform plugin and
# overwrites jax_platforms; claw it back to CPU before any backend spins up.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Build the native WFST toolkit once if it's missing (fresh checkout).
_FSTBIN = os.path.join(REPO_ROOT, "native", "build", "fst-tools")
if not os.path.exists(_FSTBIN):
    import shutil
    import subprocess
    if shutil.which("cmake") and shutil.which("ninja"):
        try:
            subprocess.run(
                ["cmake", "-B", "build", "-G", "Ninja", "."],
                cwd=os.path.join(REPO_ROOT, "native"), check=True,
                capture_output=True, timeout=300)
            subprocess.run(
                ["ninja", "-C", "build"],
                cwd=os.path.join(REPO_ROOT, "native"), check=True,
                capture_output=True, timeout=600)
        except (subprocess.SubprocessError, OSError):
            pass  # native tests will skip themselves

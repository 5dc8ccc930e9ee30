import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (see SURVEY.md section 4).  The environment
# pre-registers the 'axon' remote-TPU PJRT plugin via sitecustomize and forces
# jax_platforms to it (~2min cold tunnel init), so tests must override the
# CONFIG (env var alone is ignored) before any backend is initialized.
# Opt in to real-TPU tests with DBG_TPU_TESTS=1.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("DBG_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sim_data(tmp_path_factory):
    """Small simulated dataset shared across the test session."""
    from tools.simulate_reads import generate_dataset
    outdir = tmp_path_factory.mktemp("simdata")
    return generate_dataset(str(outdir), genome_len=200_000, read_len=150,
                            depth=20.0, inserts=(400, 800), seed=7)

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            # 4 CPUs by default (catches starvation bugs a big box
            # hides); tools/scale_gate.sh raises it for the amplified
            # budget-regime tests, which shuffle hundreds of MB.
            num_cpus=int(os.environ.get("PDFRAY_TEST_CPUS", "4")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def documents_df():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from magmapandas_spark.session import get_spark

    s = get_spark(app_name="magmapandas-tests", cpus=8, shuffle_partitions=8)
    yield s


MELTS_CSV = "/root/reference/docs/source/notebooks/data/melts.csv"
OLIVINES_CSV = "/root/reference/docs/source/notebooks/data/olivines.csv"
KD_CALIBRATION_CSV = (
    "/root/reference/src/MagmaPandas/model_calibrations/data/Kd_calibration_data.csv"
)
FE3FE2_CALIBRATION_CSV = (
    "/root/reference/src/MagmaPandas/model_calibrations/data/Fe3Fe2_calibration_data.csv"
)
BENCH_DATA = "/root/reference/docs/source/notebooks/benchmarks/data"


def sf_dir(sf: str = "0.001") -> str:
    return f"/root/testdata/sf{sf}"

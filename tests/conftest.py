import pytest

from jcpg_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="jcpg_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s


@pytest.fixture(scope="session")
def dictionary(spark):
    from jcpg_spark.synth import gazetteer_pdf

    return spark.createDataFrame(gazetteer_pdf())

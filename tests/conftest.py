from __future__ import annotations

import pytest

from data_hub_ejp_xml_pipeline_spark.generator import generate_changelog_pandas
from data_hub_ejp_xml_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="engine-tests", master="local[8]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def changelog_pdf():
    return generate_changelog_pandas(n_events=4_000, seed=42)


@pytest.fixture(scope="session")
def changelog_df(spark, changelog_pdf):
    from data_hub_ejp_xml_pipeline_spark.generator import spark_changelog_from_pandas

    df = spark_changelog_from_pandas(spark, changelog_pdf)
    df.cache().count()
    return df

import pytest
from pyspark.sql import SparkSession

from cayley_spark import GraphStore, IRI, String


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("cayley-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


def _i(s):
    return IRI(s)


# data/testdata.nq — the canonical 15-quad social graph (FIXTURES.md §1)
SIMPLE_SOCIAL = [
    (_i("alice"), _i("follows"), _i("bob")),
    (_i("bob"), _i("follows"), _i("fred")),
    (_i("bob"), _i("status"), String("cool_person")),
    (_i("dani"), _i("follows"), _i("bob")),
    (_i("charlie"), _i("follows"), _i("bob")),
    (_i("charlie"), _i("follows"), _i("dani")),
    (_i("dani"), _i("follows"), _i("greg")),
    (_i("dani"), _i("status"), String("cool_person")),
    (_i("emily"), _i("follows"), _i("fred")),
    (_i("fred"), _i("follows"), _i("greg")),
    (_i("greg"), _i("status"), String("cool_person")),
    (_i("predicates"), _i("are"), _i("follows")),
    (_i("predicates"), _i("are"), _i("status")),
    (_i("emily"), _i("status"), String("smart_person"), _i("smart_graph")),
    (_i("greg"), _i("status"), String("smart_person"), _i("smart_graph")),
]


@pytest.fixture(scope="session")
def social(spark):
    return GraphStore.from_quad_values(spark, SIMPLE_SOCIAL).persist()

from pathlib import Path

import pytest
from pyspark.sql import SparkSession

from cayley_spark import GraphStore, IRI, String

# ---- fast/slow tiers (see pytest.ini) --------------------------------
# tests/slow_tests.txt lists the nodeids measured >= 8 s (from a full
# --durations=0 run); they are auto-marked `slow` here so the default
# run (-m "not slow", pytest.ini addopts) finishes inside the
# verification budget. Parametrized cases are listed per-param, so a
# function whose sweep is slow for only some inputs keeps its fast
# cases in the default tier.
_SLOW_FILE = Path(__file__).with_name("slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    slow_ids = {
        line.strip()
        for line in _SLOW_FILE.read_text().splitlines()
        if line.strip() and not line.startswith("#")
    }
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if nodeid in slow_ids or f"tests/{nodeid}" in slow_ids:
            item.add_marker(pytest.mark.slow)


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

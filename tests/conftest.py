import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from networkx_graph_spark.session import get_spark  # noqa: E402
from networkx_graph_spark.graph import SparkDiGraph  # noqa: E402

GRAPH1_NODES = [
    ("w1", 10.0),
    ("w2", 15.0),
    ("w5", 15.0),
    ("w3", 10.0),
    ("w4", 20.0),
    ("w6", 3.0),
    ("w7", 10.0),
]
GRAPH1_EDGES = [
    ("w1", "w2"),
    ("w1", "w3"),
    ("w2", "w5"),
    ("w3", "w4"),
    ("w4", "w6"),
    ("w6", "w7"),
    ("w5", "w7"),
]
GRAPH2_NODES = [
    ("w1", 10.0),
    ("w2", 15.0),
    ("w5", 15.0),
    ("w3", 10.0),
    ("w4", 20.0),
    ("w7", 10.0),
]
GRAPH2_EDGES = [
    ("w1", "w2"),
    ("w1", "w3"),
    ("w2", "w5"),
    ("w3", "w4"),
    ("w4", "w7"),
    ("w5", "w7"),
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="nxg-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def graph1(spark):
    return SparkDiGraph.from_lists(spark, GRAPH1_NODES, GRAPH1_EDGES)


@pytest.fixture(scope="session")
def graph2(spark):
    return SparkDiGraph.from_lists(spark, GRAPH2_NODES, GRAPH2_EDGES)

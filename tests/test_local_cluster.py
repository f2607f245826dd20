"""The local-cluster session plumbing behind the executor scaling ladder.

tools/exec_scaling.py evidences the charter's N-vs-4N-EXECUTOR criterion
by running jobs on Spark's `local-cluster[n,c,mem]` master — real
executor processes with their own JVMs. That only works if session.py
ships the package to the executors (spark.submit.pyFiles +
executorEnv PYTHONPATH/PYSPARK_PYTHON) and honours SPARK_GRAFT_MASTER;
this test pins the whole path in a SUBPROCESS (a JVM can host only one
master, and the suite's session fixture owns this one).

The child runs a shuffle + an executor-side pandas UDF that imports
warchaeology_spark — the two things that fail first when the executor
environment is mis-wired.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
from pyspark.sql import functions as F
from warchaeology_spark.session import get_spark

spark = get_spark("lc-test", shuffle_partitions=4)
assert spark.sparkContext.master.startswith("local-cluster"), spark.sparkContext.master

# shuffle across real executor processes
n = (
    spark.range(10_000, numPartitions=4)
    .groupBy((F.col("id") % 7).alias("k")).count()
    .count()
)
assert n == 7, n

# executor-side Python: the pandas UDF body imports the package, which
# only resolves if PYTHONPATH/pyFiles reached the executor's worker
import pandas as pd
from pyspark.sql.functions import pandas_udf

@pandas_udf("string")
def pkg_probe(x: pd.Series) -> pd.Series:
    import warchaeology_spark  # noqa: F401 (resolvable on the executor)
    from warchaeology_spark.functions.urls import canonicalize_url  # noqa: F401
    return x.astype(str)

got = spark.range(8, numPartitions=2).select(pkg_probe("id").alias("s")).count()
assert got == 8, got
spark.stop()
print("LC-OK")
"""


def test_local_cluster_session_plumbing(tmp_path):
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_MASTER="local-cluster[2,1,1024]",
        SPARK_GRAFT_CPUS="2",
        SPARK_GRAFT_EXECUTOR_MEM="900m",
        SPARK_GRAFT_OFFHEAP_SIZE="256m",
        SPARK_DRIVER_MEM="2g",
        PYTHONPATH=REPO,
    )
    out = subprocess.run(
        [sys.executable, "-c", CHILD],
        capture_output=True, text=True, env=env, timeout=300, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "LC-OK" in out.stdout

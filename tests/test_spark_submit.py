"""spark-submit --py-files smoke test (the north-rule deployment path).

Launches a REAL `spark-submit --py-files <pkg.zip> <job.py>` subprocess in a
scrubbed environment (no repo dir on PYTHONPATH), so the driver AND the
Python workers can only import the package from the shipped zip — the same
way a multi-executor cluster receives it. The job runs a mapInPandas
fixture generator (worker-side package import) plus a kernel-backed cell
aggregation, and the test asserts on its printed result.
"""

import os
import subprocess
import sys

import pytest

import pyspark
from gtfs_conflation_pipeline_spark.session import build_pyfiles_zip

SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")

JOB = """
import os, sys
# prove imports come from the shipped zip, not this machine's checkout
# (__REPO_PARENT__ is substituted by the test with the package parent dir)
_banned = os.path.realpath("__REPO_PARENT__")
assert not any(os.path.realpath(p or ".") == _banned for p in sys.path), sys.path
from pyspark.sql import SparkSession
import pyspark.sql.functions as F

spark = SparkSession.builder.getOrCreate()

import gtfs_conflation_pipeline_spark as pkg
assert ".zip" in pkg.__file__, f"package not loaded from zip: {pkg.__file__}"

from gtfs_conflation_pipeline_spark import fixtures as FX
from gtfs_conflation_pipeline_spark.functions import udfs as U
from gtfs_conflation_pipeline_spark.operators.spatial_join import CELL_DEG

imgs = FX.images_table(spark, 3000, partitions=4, with_bytes=False)
lon = F.lit(FX.LON0) + F.shiftright("phash", 32).bitwiseAND(0x1FFFFF) * 1e-5
lat = F.lit(FX.LAT0) + F.col("phash").bitwiseAND(0x1FFFFF) * 1e-5
cells = (
    imgs.withColumn("cell", U.cell_of(lon, lat, F.lit(CELL_DEG)))
    .agg(
        F.count("*").alias("n"),
        F.countDistinct("cell").alias("n_cells"),
        F.sum(F.crc32(F.col("image_id"))).alias("id_crc_sum"),
    )
    .collect()[0]
)
print(f"SUBMIT_OK n={cells['n']} n_cells={cells['n_cells']} crc={cells['id_crc_sum']}")
spark.stop()
"""


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not bundled"
)
def test_spark_submit_py_files_smoke(tmp_path):
    import gtfs_conflation_pipeline_spark as pkg

    repo_parent = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    zip_path = build_pyfiles_zip(str(tmp_path / "pkg.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB.replace("__REPO_PARENT__", repo_parent))

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_LOCAL_DIR")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.ansi.enabled=false",  # splitmix64 needs wraparound
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            str(zip_path),
            str(job),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    ok = [l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_OK")]
    assert ok, proc.stdout[-4000:] + proc.stderr[-2000:]
    # deterministic fixture -> deterministic result, any machine, any layout
    assert ok[0] == "SUBMIT_OK n=3000 n_cells=974 crc=6313643739780"

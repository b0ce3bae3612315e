"""Local Spark standalone-cluster harness: real master + N one-core
worker JVMs on this machine.

``local[N]`` shares one JVM between the driver and every executor
thread — fine for tests, but it is not the execution model the north
rule names ("spark-submit --py-files on a multi-executor cluster at N
and 4N executors").  This module launches the real thing at laptop
scale: an ``org.apache.spark.deploy.master.Master`` and K
``Worker`` JVMs (one core each), so every executor owns its JVM, GC,
shuffle server, and Python workers — the per-executor isolation a real
cluster has.  The engine package ships to executors as a zip via
``spark.submit.pyFiles``, which is exactly the ``--py-files`` flow.

Measured caveat (BASELINE.md): on a *single box* the cross-executor
shuffle runs over loopback through one kernel, so executor-count
scaling measured this way understates a real cluster (whose NICs and
disks scale with nodes); the harness exists to prove the deployment
path end-to-end, not as the scaling estimator.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import time

DEFAULT_PORT = 7077


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(pyspark.__file__)


def _java() -> str:
    jh = os.environ.get("JAVA_HOME")
    return os.path.join(jh, "bin", "java") if jh else "java"


class StandaloneCluster:
    """Context manager: master + ``workers`` one-core worker JVMs."""

    def __init__(
        self,
        workers: int = 4,
        worker_mem: str = "6g",
        work_dir: str = "/tmp/sgc-standalone",
        port: int = DEFAULT_PORT,
    ):
        self.workers = workers
        self.worker_mem = worker_mem
        self.work_dir = work_dir
        self.port = port
        self.master_url = f"spark://127.0.0.1:{port}"
        self.procs: list[subprocess.Popen] = []

    def __enter__(self):
        os.makedirs(self.work_dir, exist_ok=True)
        home = _spark_home()
        env = dict(os.environ, SPARK_HOME=home, SPARK_SCALA_VERSION="2.13")
        cp = os.path.join(home, "jars", "*")

        def launch(cls: str, *args: str) -> subprocess.Popen:
            log = open(os.path.join(self.work_dir, f"{cls.rsplit('.', 1)[-1]}-{len(self.procs)}.log"), "w")
            p = subprocess.Popen(
                [_java(), "-cp", cp, "-Xmx1g", cls, *args],
                stdout=log,
                stderr=subprocess.STDOUT,
                env=env,
            )
            self.procs.append(p)
            return p

        launch(
            "org.apache.spark.deploy.master.Master",
            "--host", "127.0.0.1", "--port", str(self.port), "--webui-port", "0",
        )
        time.sleep(4)
        for i in range(self.workers):
            launch(
                "org.apache.spark.deploy.worker.Worker",
                "--cores", "1", "--memory", self.worker_mem, "--webui-port", "0",
                "--work-dir", os.path.join(self.work_dir, f"worker{i}"),
                self.master_url,
            )
        time.sleep(4 + self.workers)
        return self

    def __exit__(self, *exc):
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        self.procs.clear()

    def package_zip(self, repo_root: str | None = None) -> str:
        """Zip the engine package for spark.submit.pyFiles (--py-files)."""
        root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        return shutil.make_archive(
            os.path.join(self.work_dir, "cpp_parquet_spark"), "zip", root, "cpp_parquet_spark"
        )

    def session(self, executors: int, app_name: str = "sgc-standalone", **confs):
        """SparkSession against the cluster with ``executors`` one-core
        executors and the package shipped via pyFiles."""
        from pyspark.sql import SparkSession

        b = (
            SparkSession.builder.master(self.master_url)
            .appName(app_name)
            .config("spark.submit.pyFiles", self.package_zip())
            .config("spark.executor.cores", "1")
            .config("spark.executor.memory", self.worker_mem)
            .config("spark.cores.max", str(executors))
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.ui.enabled", "false")
        )
        for k, v in confs.items():
            b = b.config(k, v)
        s = b.getOrCreate()
        s.sparkContext.setLogLevel("ERROR")
        return s

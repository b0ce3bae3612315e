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
        self._logs: list = []
        self._log_paths: dict[int, str] = {}

        def launch(cls: str, *args: str) -> subprocess.Popen:
            path = os.path.join(self.work_dir, f"{cls.rsplit('.', 1)[-1]}-{len(self.procs)}.log")
            log = open(path, "w")
            self._logs.append(log)
            p = subprocess.Popen(
                [_java(), "-cp", cp, "-Xmx1g", cls, *args],
                stdout=log,
                stderr=subprocess.STDOUT,
                env=env,
            )
            self._log_paths[p.pid] = path
            self.procs.append(p)
            return p

        launch(
            "org.apache.spark.deploy.master.Master",
            "--host", "127.0.0.1", "--port", str(self.port), "--webui-port", "0",
        )
        self._await(self._master_up, timeout=45.0, what=f"master RPC port {self.port}")
        worker_logs = []
        for i in range(self.workers):
            p = launch(
                "org.apache.spark.deploy.worker.Worker",
                "--cores", "1", "--memory", self.worker_mem, "--webui-port", "0",
                "--work-dir", os.path.join(self.work_dir, f"worker{i}"),
                self.master_url,
            )
            worker_logs.append(self._log_paths[p.pid])
        self._await(
            lambda: self._registered_workers(worker_logs) >= self.workers,
            timeout=45.0 + 2.0 * self.workers,
            what=f"{self.workers} workers registered with master",
        )
        return self

    def _master_up(self) -> bool:
        import socket

        try:
            with socket.create_connection(("127.0.0.1", self.port), timeout=1.0):
                return True
        except OSError:
            return False

    @staticmethod
    def _registered_workers(worker_logs: list[str]) -> int:
        n = 0
        for path in worker_logs:
            try:
                with open(path, "r", errors="replace") as f:
                    if "Successfully registered with master" in f.read():
                        n += 1
            except OSError:
                pass
        return n

    def _await(self, ready, timeout: float, what: str) -> None:
        """Poll ``ready()`` with liveness checks: a JVM that exits early
        surfaces as a clear error (with its log tail), not a later hang."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            for p in self.procs:
                if p.poll() is not None:
                    tail = ""
                    path = self._log_paths.get(p.pid)
                    if path and os.path.exists(path):
                        with open(path, "r", errors="replace") as f:
                            tail = "".join(f.readlines()[-15:])
                    self.__exit__()
                    raise RuntimeError(
                        f"standalone JVM exited rc={p.returncode} while waiting for {what}\n{tail}"
                    )
            if ready():
                return
            time.sleep(0.25)
        self.__exit__()
        raise RuntimeError(f"timed out after {timeout:.0f}s waiting for {what}")

    def __exit__(self, *exc):
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        self.procs.clear()
        for log in getattr(self, "_logs", []):
            try:
                log.close()
            except OSError:  # pragma: no cover
                pass
        self._logs = []

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

"""ENGINE_CONF driver-JVM service-thread bounds (optimization r6).

The JVM sizes its GC worker pool AND its tiered-JIT compiler pool
ergonomically from the host core count, so on a many-core node whose
task slots already cover every CPU the service threads oversubscribe
the box exactly while the engine is busiest.  ``ENGINE_CONF`` bounds
both pools via ``spark.driver.extraJavaOptions`` — unless the caller
set ``SPARK_GRAFT_JAVA_OPTS``, which must keep overriding everything
(bench.py reads the same variable).
"""

from __future__ import annotations

import importlib
import sys


def _fresh_engine_conf(monkeypatch, env_value):
    if env_value is None:
        monkeypatch.delenv("SPARK_GRAFT_JAVA_OPTS", raising=False)
    else:
        monkeypatch.setenv("SPARK_GRAFT_JAVA_OPTS", env_value)
    mod = importlib.reload(
        sys.modules["karanta_ocr_spark.plans.partitioning"]
    )
    return mod.ENGINE_CONF


def test_default_bounds_gc_and_jit_threads(monkeypatch):
    conf = _fresh_engine_conf(monkeypatch, None)
    opts = conf.get("spark.driver.extraJavaOptions", "")
    assert "-XX:ParallelGCThreads=" in opts
    assert "-XX:CICompilerCount=" in opts


def test_env_override_wins(monkeypatch):
    conf = _fresh_engine_conf(monkeypatch, "-Xss4m")
    # bench.py passes the env value itself; ENGINE_CONF must not
    # clobber it with the defaults.
    assert "spark.driver.extraJavaOptions" not in conf


def teardown_module(module):
    # Leave the module in the state matching the process environment.
    importlib.reload(sys.modules["karanta_ocr_spark.plans.partitioning"])

"""Master-configuration probe: never override spark-submit's --master.

The probe runs BEFORE any JVM exists in a fresh spark-submit driver, where
PySpark's ``SparkConf()`` is an empty local dict that cannot see the
submitted ``spark.master`` system property (review finding, round 8).  The
reliable pre-JVM signals are the env vars the spark-submit launcher itself
exports — ``PYSPARK_GATEWAY_PORT`` (the forked-python handshake) and
``PYSPARK_SUBMIT_ARGS``.  These tests simulate that pre-JVM state via the
injectable ``environ`` parameter, without launching a real spark-submit.
"""

from __future__ import annotations

from eventbridge_etl_spark.session import _configured_master


def test_gateway_port_means_configured():
    # spark-submit forked this interpreter: the JVM driver owns --master
    assert _configured_master({"PYSPARK_GATEWAY_PORT": "43017"}) is True


def test_submit_args_master_flag_means_configured():
    env = {"PYSPARK_SUBMIT_ARGS": "--master yarn pyspark-shell"}
    assert _configured_master(env) is True


def test_submit_args_conf_master_means_configured():
    env = {"PYSPARK_SUBMIT_ARGS": "--conf spark.master=yarn pyspark-shell"}
    assert _configured_master(env) is True


def test_legacy_env_vars_mean_configured():
    assert _configured_master({"SPARK_MASTER": "spark://h:7077"}) is True
    assert _configured_master({"MASTER": "yarn"}) is True


def test_bare_environment_not_configured_pre_jvm(monkeypatch):
    """No submit signals and no live gateway => not configured.

    Simulates the pre-JVM state: even if a SparkContext._jvm happens to
    exist in this test process (the suite's shared session), force the
    probe down the pre-JVM path by patching it to None — the documented
    condition under which SparkConf() must NOT be trusted.
    """
    from pyspark.context import SparkContext

    monkeypatch.setattr(SparkContext, "_jvm", None)
    assert _configured_master({}) is False


def test_submit_args_without_master_not_configured(monkeypatch):
    from pyspark.context import SparkContext

    monkeypatch.setattr(SparkContext, "_jvm", None)
    env = {"PYSPARK_SUBMIT_ARGS": "--name app pyspark-shell"}
    assert _configured_master(env) is False


def test_live_gateway_reads_sparkconf(spark):
    """Post-JVM (suite session live), SparkConf sees spark.master and the
    probe returns True — getOrCreate would reuse the session anyway."""
    assert _configured_master({}) is True

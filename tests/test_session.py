"""Unit tests for the SparkSession factory's JVM flag derivation.

Pure string logic — no SparkSession is started here (the measured GC
rationale for each flag lives in session.py's comment block)."""

from bigdataentityresolution_spark.session import _jvm_opts


def test_jvm_opts_standard_heap():
    opts = _jvm_opts("24g")
    assert "-XX:+UseParallelGC" in opts
    assert "-Xms24g" in opts
    assert "-XX:+AlwaysPreTouch" in opts
    assert "-Xmn12g" in opts  # young gen = half the heap


def test_jvm_opts_small_heap_skips_young_gen():
    # tiny heaps (CI containers) keep JVM-default young-gen sizing
    assert "-Xmn" not in _jvm_opts("2g")


def test_jvm_opts_non_gig_spec_passthrough():
    # megabyte or exotic specs still pin the heap, skip -Xmn derivation
    opts = _jvm_opts("4096m")
    assert "-Xms4096m" in opts
    assert "-Xmn" not in opts

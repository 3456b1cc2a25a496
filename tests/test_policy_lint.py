"""Engine policy lints.

input_hint mandates vectorized pandas/Arrow UDFs only — no per-row Python
(`@F.udf` / RDD.map lambdas) anywhere in the engine (SURVEY §7 hard parts)."""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "logicaldecoding_spark")

ROW_UDF = re.compile(r"@F\.udf|F\.udf\(|functions\.udf\(|\budf\(lambda")
RDD_USE = re.compile(r"\.rdd\b|sparkContext\.parallelize\(.*\.map\(")
COLLECT_LOOP = re.compile(r"for .* in .*\.collect\(\).*:\s*\n\s+.*(join|union|merge)")


def _sources():
    for dirpath, _dirs, files in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                with open(p) as f:
                    yield p, f.read()


def test_no_row_at_a_time_python_udfs():
    bad = [p for p, src in _sources() if ROW_UDF.search(src)]
    assert not bad, f"row-at-a-time Python UDFs found in: {bad}"


def test_no_rdd_operators():
    bad = [p for p, src in _sources() if RDD_USE.search(src)]
    assert not bad, f"RDD-level code found in: {bad}"


def test_no_driver_side_data_loops():
    bad = [p for p, src in _sources() if COLLECT_LOOP.search(src)]
    assert not bad, f"driver-side collect loops found in: {bad}"

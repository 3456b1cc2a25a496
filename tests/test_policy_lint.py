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


# Round-1 gap: `@F.pandas_udf` bodies passed the lint while iterating the
# Series row-by-row in Python (`for i, toks in enumerate(token_arrays)`),
# which is exactly the per-row path the input_hint bans — the Arrow batch
# boundary doesn't make the inner loop vectorized.  Flag the common per-row
# idioms inside any function decorated as a pandas UDF.
PER_ROW_IDIOMS = [
    re.compile(r"for\s+\w+(?:\s*,\s*\w+)?\s+in\s+enumerate\("),
    re.compile(r"\.iterrows\(\)"),
    re.compile(r"\.itertuples\("),
    re.compile(r"\.apply\(\s*lambda"),
    re.compile(r"for\s+\w+\s+in\s+zip\("),
]


def _pandas_udf_bodies(src: str):
    """Yield the source block of each pandas_udf-decorated function."""
    lines = src.split("\n")
    i = 0
    while i < len(lines):
        if "pandas_udf" in lines[i] and lines[i].lstrip().startswith("@"):
            indent = len(lines[i]) - len(lines[i].lstrip())
            j = i + 1
            while j < len(lines) and not lines[j].lstrip().startswith("def "):
                j += 1
            body = [lines[j]] if j < len(lines) else []
            j += 1
            while j < len(lines):
                s = lines[j]
                if s.strip() and (len(s) - len(s.lstrip())) <= indent:
                    break
                body.append(s)
                j += 1
            yield "\n".join(body)
            i = j
        else:
            i += 1


SEAM_FILES = ["table/format.py", "operators/merge.py"]
DIRECT_FS = re.compile(r"\b(?:os\.(?!path\b|path\.)|shutil\.|\bopen\()")


def test_format_uses_fileio_seam():
    """Table format + merge must route every filesystem touch through the
    FileIO seam (SURVEY §4.4) so an object-store IO can be dropped in;
    os.path.* (pure string ops) is the only allowed os usage."""
    bad = []
    for rel in SEAM_FILES:
        with open(os.path.join(PKG, rel)) as f:
            for ln, line in enumerate(f, 1):
                if DIRECT_FS.search(line):
                    bad.append(f"{rel}:{ln}: {line.strip()}")
    assert not bad, "direct filesystem calls outside FileIO:\n" + "\n".join(bad)


def test_no_per_row_loops_in_vectorized_udfs():
    bad = []
    for p, src in _sources():
        for body in _pandas_udf_bodies(src):
            for idiom in PER_ROW_IDIOMS:
                if idiom.search(body):
                    bad.append((p, idiom.pattern))
    assert not bad, f"per-row Python inside pandas UDF bodies: {bad}"

"""Circular-import guard: every package module must import cleanly as
the FIRST import of a fresh interpreter.

The operators↔oracles topology is deliberately cyclic at module scope
(operators import shared constants from oracles — their canonical
home — while oracle builders import operator modules for plan
constants). That cycle is safe only under an ordering discipline:
constants used by operators must be defined in oracles.py BEFORE the
first oracle builder that imports an operator module back. Two r07
regressions (NEG_K, PCA_ROUNDS) broke direct `import textops` /
`import similarity` while every aggregate entrypoint still worked —
exactly the failure mode only a module-first import catches.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

MODULES = [
    "cs422pp_mapreduce_spark.oracles",
    "cs422pp_mapreduce_spark.operators.relational",
    "cs422pp_mapreduce_spark.operators.events",
    "cs422pp_mapreduce_spark.operators.textops",
    "cs422pp_mapreduce_spark.operators.similarity",
    "cs422pp_mapreduce_spark.operators.dedup",
    "cs422pp_mapreduce_spark.operators.multimodal",
    "cs422pp_mapreduce_spark.operators.graph",
    "cs422pp_mapreduce_spark.operators.maintenance",
    "cs422pp_mapreduce_spark.operators.tokenize",
    "cs422pp_mapreduce_spark.operators.tpch",
    "cs422pp_mapreduce_spark.operators.corpus",
    "cs422pp_mapreduce_spark.operators.asof",
    "cs422pp_mapreduce_spark.operators.sqlsurface",
    "cs422pp_mapreduce_spark.operators.wordcount",
    "cs422pp_mapreduce_spark.streaming.events",
    "cs422pp_mapreduce_spark.plans.analysis",
]


@pytest.mark.parametrize("mod", MODULES)
def test_module_imports_first(mod):
    r = subprocess.run(
        [sys.executable, "-c", f"import {mod}"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, f"{mod} failed as first import:\n{r.stderr[-2000:]}"

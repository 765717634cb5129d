"""The Airflow DAG wrappers must import cleanly WITHOUT airflow installed —
engine containers never ship it (the try/ImportError guard in each file)."""

from __future__ import annotations

import glob
import runpy

import pytest

DAG_FILES = sorted(glob.glob("airflow_dags/*.py"))


@pytest.mark.parametrize("path", DAG_FILES)
def test_dag_file_imports_without_airflow(path):
    ns = runpy.run_path(path)
    # guard took the ImportError branch in this container
    assert ns.get("DAG") is None

"""Templated query catalog + DataFrame export edge (S3/S7).

The reference's interactive surface is a folder of named query
templates with variable substitution, executed to a pandas DataFrame
and exported to CSV/JSON/Excel
(/root/reference/jupyter/kgap/notebooks/kgap_tools.py:17-31,
/root/reference/docs/components/jupyter.md:575-585). The Ray-native
analogue: templates are declarative workflow specs (JSON files, the
same step dicts ``k_gap_ray.workflow`` compiles) with ``${var}``
placeholders, resolved per call and executed on the live Ray session.

    cat = QueryCatalog("queries/")          # folder of <name>.json
    spec = cat.generate_query("top_orders", limit=10)   # resolved spec
    df = cat.execute_to_df("top_orders", limit=10)      # runs on Ray
    export_df(df, "/data/out.xlsx")                     # S7 edge
"""

from __future__ import annotations

import json
import os
from typing import Any

from k_gap_ray.workflow import _subst, run_workflow


class QueryCatalog:
    """Folder of named workflow-spec templates (<name>.json)."""

    def __init__(self, templates_folder: str) -> None:
        self.folder = templates_folder

    def names(self) -> list[str]:
        return sorted(
            os.path.splitext(f)[0] for f in os.listdir(self.folder)
            if f.endswith(".json"))

    def generate_query(self, name: str, **vars: Any) -> list[dict]:
        """Load the named template and apply ${var} substitution —
        the ``generate_sparql(name, **vars)`` analogue; returns the
        resolved step list without executing it."""
        path = os.path.join(self.folder, f"{name}.json")
        with open(path, encoding="utf-8") as f:
            steps = json.load(f)
        return _subst(steps, dict(vars))

    def execute_to_df(self, name: str, **vars: Any):
        """Build + run the named query, return a pandas DataFrame
        (the reference's ``execute_to_df``). Ray session owned by the
        caller."""
        result = run_workflow(self.generate_query(name, **vars))
        return to_dataframe(result)


def to_dataframe(result):
    """Dataset / pyarrow.Table / DataFrame -> pandas DataFrame."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()


def export_df(df, path: str, **kwargs) -> str:
    """Export a DataFrame by extension: .csv / .json / .xlsx / .parquet.

    The Excel edge prefers pandas' ``to_excel`` (openpyxl/xlsxwriter)
    when available and otherwise uses the bundled stdlib OOXML writer
    (`sources/xlsx.py`) — either way ``export_df(df, "x.xlsx")``
    works, matching the reference's notebook export surface
    (jupyter.md:575-585)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        df.to_csv(path, index=False, **kwargs)
    elif ext == ".json":
        df.to_json(path, orient="records", **kwargs)
    elif ext == ".parquet":
        df.to_parquet(path, index=False, **kwargs)
    elif ext in (".xlsx", ".xls"):
        try:
            import openpyxl  # noqa: F401

            df.to_excel(path, index=False, **kwargs)
        except ImportError:
            from k_gap_ray.sources.xlsx import write_xlsx

            write_xlsx(df, path, **kwargs)
    else:
        raise ValueError(f"unsupported export extension: {ext}")
    return path

"""Relation repository: discover file sets (design + SQL + data) on disk.

Reference parity: ``python/etl/file_sets.py:42-110`` — a relation is
assembled from ``schemas/{schema}/{table}.yaml`` (design),
``schemas/{schema}/{table}.sql`` (query for CTAS/VIEW), and
``data/{schema}/{table}/`` (data files for source relations).
The reference's ``{source_schema}-{table}`` filename prefixing exists for
S3 flatness; a directory tree per schema carries the same information.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import yaml

from .design.validate import load_design
from .errors import ETLConfigError
from .names import TableSelector
from .relations import Relation


def find_file_sets(root: str, selector: Optional[TableSelector] = None) -> List[Relation]:
    """Walk ``root/schemas/*/*.yaml`` into Relations (design + query + data).

    Source relations get ``data_location = root/data/<schema>/<table>`` when
    that directory exists; the design's ``data_format`` attribute (default
    parquet) picks the reader.
    """
    selector = selector or TableSelector([])
    out: List[Relation] = []
    pattern = os.path.join(root, "schemas", "*", "*.yaml")
    for design_path in sorted(glob.glob(pattern)):
        schema_dir = os.path.basename(os.path.dirname(design_path))
        with open(design_path) as fh:
            doc = yaml.safe_load(fh)
        design = load_design(doc)
        if f"{schema_dir}." not in design.name + "." and not design.name.startswith(
            schema_dir + "."
        ):
            raise ETLConfigError(
                f"{design_path}: design name {design.name!r} does not match "
                f"schema directory {schema_dir!r}"
            )
        query = None
        sql_path = design_path[: -len(".yaml")] + ".sql"
        if os.path.exists(sql_path):
            with open(sql_path) as fh:
                query = fh.read()
        if design.kind in ("CTAS", "VIEW") and query is None:
            raise ETLConfigError(f"{design.name}: {design.kind} relation has no .sql file")
        table = design.name.split(".", 1)[1]
        data_dir = os.path.join(root, "data", schema_dir, table)
        rel = Relation(
            design=design,
            query=query,
            data_location=data_dir if os.path.isdir(data_dir) else None,
            data_format=str(design.attributes.get("data_format", "parquet")),
        )
        if selector.match(rel.table_name):
            out.append(rel)
    return out


def write_design(root: str, design_dict: Dict, query: Optional[str] = None) -> str:
    """Persist a (bootstrap-inferred) design + optional SQL to the repo."""
    name = design_dict["name"]
    schema, table = name.split(".", 1)
    d = os.path.join(root, "schemas", schema)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{table}.yaml")
    with open(path, "w") as fh:
        yaml.safe_dump(design_dict, fh, sort_keys=False)
    if query is not None:
        with open(os.path.join(d, f"{table}.sql"), "w") as fh:
            fh.write(query)
    return path

"""dbt interop: map dbt models onto warehouse relations for impact analysis.

Reference parity: ``python/etl/dbt.py:1-127`` —
- ``find_arthur_leaf_dbt_childs`` scans dbt model SQL for
  ``db_source('schema', 'table')`` macros to find models that read warehouse
  relations (reference dbt.py:80-95);
- ``parse_dbt_run_stdout`` turns dbt metadata into
  ``DBTRelation(name, depends_on, type, is_required)`` rows (:97-110);
- ``render_dbt_list`` prints them with index/flag columns (:112-127).

The reference shells out to dbt inside a docker container; that is
orchestration, not data path, and is out of scope here (SURVEY §2.12).  This
version consumes the dbt artifact that every dbt invocation already writes —
``target/manifest.json``, a documented public schema — so impact analysis
needs no dbt runtime at all: load the manifest, join its sources against our
relation identifiers, walk the model graph.
"""

from __future__ import annotations

import json
import os
import re
from collections import namedtuple
from typing import Dict, Iterable, List, Sequence, Set, Tuple

DBTRelation = namedtuple("DBTRelation", ["name", "depends_on", "type", "is_required"])

DB_SOURCE_RE = re.compile(r"db_source\(\s*'(.*?)'\s*,\s*'(.*?)'\s*\)")


def find_db_source_models(sql_root: str, identifiers: Iterable[str]) -> List[str]:
    """dbt models whose SQL reads one of our relations via db_source().

    ``identifiers`` are ``schema.table`` strings.  Mirrors reference
    dbt.py:80-95 (same regex contract) without the docker plumbing.
    """
    wanted: Set[Tuple[str, str]] = set()
    for ident in identifiers:
        schema, _, table = ident.rpartition(".")
        wanted.add((schema, table))
    hits: List[str] = []
    for root, _, files in os.walk(sql_root):
        for fname in sorted(files):
            if not fname.endswith(".sql"):
                continue
            with open(os.path.join(root, fname)) as fh:
                sql = fh.read()
            for schema, table in DB_SOURCE_RE.findall(sql):
                if (schema, table) in wanted:
                    hits.append(os.path.splitext(fname)[0])
                    break
    return hits


class DbtManifest:
    """A loaded dbt ``manifest.json`` (public artifact schema: nodes,
    sources, child_map)."""

    def __init__(self, doc: dict):
        self.nodes: Dict[str, dict] = doc.get("nodes", {})
        self.sources: Dict[str, dict] = doc.get("sources", {})
        # child_map is present in manifests v4+; rebuild from depends_on if absent
        self.child_map: Dict[str, List[str]] = doc.get("child_map") or {}
        if not self.child_map:
            for uid, node in self.nodes.items():
                for parent in node.get("depends_on", {}).get("nodes", []):
                    self.child_map.setdefault(parent, []).append(uid)

    @classmethod
    def load(cls, path: str) -> "DbtManifest":
        with open(path) as fh:
            return cls(json.load(fh))

    def relations(self) -> List[DBTRelation]:
        """All models as DBTRelation rows (reference parse_dbt_run_stdout)."""
        out = []
        for uid, node in sorted(self.nodes.items()):
            if node.get("resource_type", "model") != "model":
                continue
            config = node.get("config", {})
            out.append(
                DBTRelation(
                    name=node.get("name", uid.split(".")[-1]),
                    depends_on=[
                        n.split(".")[-1]
                        for n in node.get("depends_on", {}).get("nodes", [])
                    ],
                    type=str(config.get("materialized", "view")).upper(),
                    is_required="required" in (config.get("tags") or []),
                )
            )
        return out

    def source_ids_for(self, identifiers: Iterable[str]) -> List[str]:
        """manifest source unique_ids whose schema.name match our relations."""
        wanted = {tuple(ident.rsplit(".", 1)) for ident in identifiers}
        hits = []
        for uid, src in self.sources.items():
            key = (src.get("schema", ""), src.get("name", ""))
            if key in wanted:
                hits.append(uid)
        return hits

    def downstream_models(self, identifiers: Iterable[str]) -> List[DBTRelation]:
        """Transitive dbt-model closure fed (directly or not) by our relations.

        The Spark-side analog of the reference's "leaf childs" walk, extended
        to the full closure: start from matching manifest sources, follow
        child_map.  Returned in name order for stable CLI output.
        """
        frontier = list(self.source_ids_for(identifiers))
        seen: Set[str] = set()
        while frontier:
            uid = frontier.pop()
            for child in self.child_map.get(uid, []):
                if child not in seen:
                    seen.add(child)
                    frontier.append(child)
        models = {
            r.name: r
            for r in self.relations()
        }
        names = {
            self.nodes[uid].get("name")
            for uid in seen
            if uid in self.nodes
            and self.nodes[uid].get("resource_type", "model") == "model"
        }
        return [models[n] for n in sorted(names) if n in models]


def render_dbt_list(dbt_relations: Sequence[DBTRelation]) -> List[str]:
    """Format relations the way the reference prints them (dbt.py:112-127)."""
    if not dbt_relations:
        return []
    index = {r.name: i + 1 for i, r in enumerate(dbt_relations)}
    width = max(len(name) for name in index)
    lines = []
    for r in dbt_relations:
        lines.append(
            f"{r.name:{width}s} # {r.type} index={index[r.name]:4d} "
            f"flag=DBT       is_required={r.is_required}"
        )
    return lines

"""Upstream JDBC table introspection for design validation.

Reference parity: ``python/etl/design/bootstrap.py`` (``fetch_attributes``,
``fetch_constraints`` — there implemented against ``pg_catalog``) and the
consumers in ``python/etl/validate.py:339-470``.  This version goes through
``java.sql.DatabaseMetaData`` instead of Postgres catalog tables so the same
code validates against any JDBC upstream (embedded Derby in tests; Postgres /
MySQL / Redshift in production) without dialect-specific catalog SQL.

The JVM connection is driver-side only and metadata-sized (column lists, key
lists) — nothing here touches table data, so it is scale-free by construction.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


@dataclass
class UpstreamColumn:
    """One column as the upstream database reports it."""

    name: str
    type_name: str
    not_null: bool


@dataclass
class UpstreamTableInfo:
    """Columns + enforced key constraints of one upstream table.

    ``primary_key`` is in key-sequence order; ``uniques`` is a list of
    column-name frozensets, one per unique index that is not the primary key.
    """

    columns: List[UpstreamColumn] = field(default_factory=list)
    primary_key: List[str] = field(default_factory=list)
    uniques: List[frozenset] = field(default_factory=list)

    @property
    def column_names(self) -> List[str]:
        return [c.name for c in self.columns]

    @property
    def not_null_columns(self) -> frozenset:
        return frozenset(c.name for c in self.columns if c.not_null)


def _result_set_rows(rs, fields: Dict[str, str]) -> List[dict]:
    """Drain a java.sql.ResultSet into dicts of the requested fields.

    ``fields`` maps output key -> (ResultSet column label, kind) where kind is
    encoded in the label as ``"s:COLUMN_NAME"`` (string) / ``"i:KEY_SEQ"``
    (int) / ``"b:NON_UNIQUE"`` (boolean).
    """
    rows = []
    try:
        while rs.next():
            row = {}
            for key, spec in fields.items():
                kind, label = spec.split(":", 1)
                if kind == "s":
                    row[key] = rs.getString(label)
                elif kind == "i":
                    row[key] = rs.getInt(label)
                else:
                    row[key] = rs.getBoolean(label)
            rows.append(row)
    finally:
        rs.close()
    return rows


def _fetch_uniques_derby(conn, table_upper: str) -> List[frozenset]:
    """Unique constraints from Derby's SYS catalog.

    Needed because Derby backs a nullable UNIQUE constraint with a
    "UNIQUE WITH DUPLICATE NULLS" index that ``getIndexInfo`` reports as
    NON_UNIQUE — the JDBC-standard call misses it.  The conglomerate
    DESCRIPTOR prints the 1-based base-column positions, e.g.
    ``UNIQUE WITH DUPLICATE NULLS BTREE (3)``.
    """
    import re

    # Parameterized: table names come from design files (untrusted input) —
    # never interpolate identifiers into catalog SQL.
    st = conn.prepareStatement(
        "SELECT cons.CONSTRAINTNAME, cg.DESCRIPTOR, "
        "cols.COLUMNNAME, cols.COLUMNNUMBER "
        "FROM SYS.SYSCONSTRAINTS cons "
        "JOIN SYS.SYSTABLES t ON cons.TABLEID = t.TABLEID "
        "JOIN SYS.SYSKEYS k ON k.CONSTRAINTID = cons.CONSTRAINTID "
        "JOIN SYS.SYSCONGLOMERATES cg ON cg.CONGLOMERATEID = k.CONGLOMERATEID "
        "JOIN SYS.SYSCOLUMNS cols ON cols.REFERENCEID = t.TABLEID "
        "WHERE t.TABLENAME = ? AND cons.TYPE = 'U'"
    )
    try:
        st.setString(1, table_upper)
        rs = st.executeQuery()
        rows = _result_set_rows(
            rs,
            {
                "cons": "s:CONSTRAINTNAME",
                "descriptor": "s:DESCRIPTOR",
                "col": "s:COLUMNNAME",
                "pos": "i:COLUMNNUMBER",
            },
        )
    finally:
        st.close()
    col_by_pos: Dict[int, str] = {r["pos"]: r["col"].lower() for r in rows}
    uniques: List[frozenset] = []
    seen = set()
    for r in rows:
        if r["cons"] in seen:
            continue
        seen.add(r["cons"])
        m = re.search(r"\(([\d,\s]+)\)", r["descriptor"] or "")
        if not m:
            continue
        positions = [int(p) for p in m.group(1).split(",")]
        fs = frozenset(col_by_pos[p] for p in positions if p in col_by_pos)
        if fs and fs not in uniques:
            uniques.append(fs)
    return uniques


def _fetch_uniques_information_schema(
    conn, schema: Optional[str], table: str
) -> List[frozenset]:
    """Unique constraints via ANSI information_schema (Postgres / MySQL /
    Redshift / SQL Server).  Best-effort: callers swallow failures and fall
    back to ``getIndexInfo``-derived uniques.

    The key_column_usage join correlates table_schema AND constraint_schema,
    not just constraint_name + table_name: constraint names are only unique
    per schema, so an uncorrelated join would let a same-named constraint on
    a same-named table in another schema contribute phantom columns.
    Identifier values are bound as ? parameters, never interpolated.
    """
    sql = (
        "SELECT tc.constraint_name, kcu.column_name "
        "FROM information_schema.table_constraints tc "
        "JOIN information_schema.key_column_usage kcu "
        "  ON tc.constraint_name = kcu.constraint_name "
        " AND tc.constraint_schema = kcu.constraint_schema "
        " AND tc.table_name = kcu.table_name "
        " AND tc.table_schema = kcu.table_schema "
        "WHERE tc.table_name = ? "
        "AND tc.constraint_type = 'UNIQUE'"
    )
    if schema:
        sql += " AND tc.table_schema = ? AND kcu.table_schema = ?"
    st = conn.prepareStatement(sql)
    try:
        st.setString(1, table)
        if schema:
            st.setString(2, schema)
            st.setString(3, schema)
        rs = st.executeQuery()
        rows = _result_set_rows(rs, {"cons": "s:constraint_name", "col": "s:column_name"})
    finally:
        st.close()
    by_cons: Dict[str, List[str]] = {}
    for r in rows:
        by_cons.setdefault(r["cons"], []).append(r["col"].lower())
    out: List[frozenset] = []
    for cols in by_cons.values():
        fs = frozenset(cols)
        if fs not in out:
            out.append(fs)
    return out


def fetch_upstream_info(
    spark,
    url: str,
    table: str,
    schema: Optional[str] = None,
    driver: Optional[str] = None,
) -> Optional[UpstreamTableInfo]:
    """Fetch column + constraint metadata for one upstream table.

    Returns None when the table does not exist (reference treats that as a
    hard validation error at the caller: validate.py:352-356).

    Identifier case: JDBC metadata calls are case-sensitive pattern matches,
    and engines fold unquoted identifiers differently (Derby/Oracle upper,
    Postgres lower).  We try the given spelling, then upper, then lower, and
    normalize every reported identifier to lowercase — matching the repo-wide
    convention that design files use lowercase names.
    """
    jvm = spark.sparkContext._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        meta = conn.getMetaData()
        candidates = []
        for t in (table, table.upper(), table.lower()):
            for s in (schema, schema.upper() if schema else None,
                      schema.lower() if schema else None, None):
                if (t, s) not in candidates:
                    candidates.append((t, s))
        for tname, sname in candidates:
            cols = _result_set_rows(
                meta.getColumns(None, sname, tname, None),
                {
                    "name": "s:COLUMN_NAME",
                    "type_name": "s:TYPE_NAME",
                    "nullable": "i:NULLABLE",
                    "position": "i:ORDINAL_POSITION",
                },
            )
            if not cols:
                continue
            cols.sort(key=lambda r: r["position"])
            # DatabaseMetaData.columnNoNulls == 0
            columns = [
                UpstreamColumn(
                    name=r["name"].lower(),
                    type_name=(r["type_name"] or "").lower(),
                    not_null=r["nullable"] == 0,
                )
                for r in cols
            ]

            pk_rows = _result_set_rows(
                meta.getPrimaryKeys(None, sname, tname),
                {"name": "s:COLUMN_NAME", "seq": "i:KEY_SEQ"},
            )
            pk_rows.sort(key=lambda r: r["seq"])
            primary_key = [r["name"].lower() for r in pk_rows]

            idx_rows = _result_set_rows(
                meta.getIndexInfo(None, sname, tname, True, False),
                {"index": "s:INDEX_NAME", "name": "s:COLUMN_NAME"},
            )
            by_index: Dict[str, List[str]] = {}
            for r in idx_rows:
                if r["index"] is None or r["name"] is None:
                    continue  # table statistics pseudo-rows
                by_index.setdefault(r["index"], []).append(r["name"].lower())
            pk_set = frozenset(primary_key)
            uniques = []
            for cols_in_index in by_index.values():
                fs = frozenset(cols_in_index)
                if fs and fs != pk_set and fs not in uniques:
                    uniques.append(fs)

            # Constraint-catalog pass: nullable UNIQUE constraints are often
            # invisible to getIndexInfo (Derby reports their backing index as
            # NON_UNIQUE because duplicate NULLs are allowed), so consult the
            # engine's catalog where we know how.
            product = (meta.getDatabaseProductName() or "").lower()
            try:
                if "derby" in product:
                    extra = _fetch_uniques_derby(conn, tname.upper())
                else:
                    extra = _fetch_uniques_information_schema(conn, sname, tname)
            except Exception as exc:  # catalog dialect unsupported — OK
                logger.debug("constraint-catalog probe failed: %s", exc)
                extra = []
            for fs in extra:
                if fs and fs != pk_set and fs not in uniques:
                    uniques.append(fs)
            return UpstreamTableInfo(
                columns=columns, primary_key=primary_key, uniques=uniques
            )
        return None
    finally:
        conn.close()

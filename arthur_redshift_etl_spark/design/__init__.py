"""Table-design model: the declarative schema contract.

Reference parity:
- column model / generic types: ``python/etl/design/__init__.py:26-120``
  (ColumnDefinition) and ``python/etl/config/table_design.schema:38-123``;
- generic-type enum (closed set of 10): boolean, date, decimal, double,
  float, int, long, string, timestamp, uuid;
- constraints/attributes/extract_settings:
  ``table_design.schema:141-231``.

The design file is the system's contract: diffable, reviewable, validated.
Here it maps to/from Spark ``StructType``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import types as T

from ..errors import TableDesignSemanticError

GENERIC_TYPES = (
    "boolean",
    "date",
    "decimal",
    "double",
    "float",
    "int",
    "long",
    "string",
    "timestamp",
    "uuid",
)

_DECIMAL_RE = re.compile(r"(?:numeric|decimal)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", re.I)
_VARCHAR_RE = re.compile(r"(?:character varying|varchar)\s*\(\s*(\d+)\s*\)", re.I)

# generic type -> Spark type constructor.  SURVEY §1.3: timestamps are
# tz-naive in the reference (UTC assumption), hence TimestampNTZType.
_GENERIC_TO_SPARK = {
    "boolean": T.BooleanType,
    "date": T.DateType,
    "double": T.DoubleType,
    "float": T.FloatType,
    "int": T.IntegerType,
    "long": T.LongType,
    "string": T.StringType,
    "timestamp": T.TimestampNTZType,
    "uuid": T.StringType,
}

# Spark type class -> generic type (for bootstrap inference).
_SPARK_TO_GENERIC = {
    T.BooleanType: "boolean",
    T.DateType: "date",
    T.DecimalType: "decimal",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.ByteType: "int",
    T.ShortType: "int",
    T.IntegerType: "int",
    T.LongType: "long",
    T.StringType: "string",
    T.TimestampType: "timestamp",
    T.TimestampNTZType: "timestamp",
}


def generic_to_spark_type(generic: str, sql_type: str = "") -> T.DataType:
    """Map a generic type (+ concrete sql_type for precision) to a Spark type.

    >>> generic_to_spark_type("decimal", "numeric(18,4)")
    DecimalType(18,4)
    >>> generic_to_spark_type("long")
    LongType()
    >>> generic_to_spark_type("uuid")
    StringType()
    """
    if generic == "decimal":
        m = _DECIMAL_RE.search(sql_type or "")
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        return T.DecimalType(18, 4)
    try:
        return _GENERIC_TO_SPARK[generic]()
    except KeyError:
        raise TableDesignSemanticError(f"unknown generic type: {generic!r}") from None


def spark_type_to_generic(dt: T.DataType) -> str:
    """Inverse mapping for bootstrap (DataFrame schema -> design).

    Complex types are stringified per reference behavior (SURVEY §1.3: "No
    nested/array/map types survive into the warehouse").
    """
    if isinstance(dt, T.DecimalType):
        return "decimal"
    return _SPARK_TO_GENERIC.get(type(dt), "string")


def spark_type_to_sql_type(dt: T.DataType) -> str:
    """Concrete warehouse type string for a Spark type (used in designs)."""
    if isinstance(dt, T.DecimalType):
        return f"numeric({dt.precision},{dt.scale})"
    mapping = {
        T.BooleanType: "boolean",
        T.DateType: "date",
        T.DoubleType: "double precision",
        T.FloatType: "real",
        T.ByteType: "smallint",
        T.ShortType: "smallint",
        T.IntegerType: "integer",
        T.LongType: "bigint",
        T.TimestampType: "timestamp",
        T.TimestampNTZType: "timestamp",
    }
    return mapping.get(type(dt), "varchar(65535)")


@dataclass
class ColumnDefinition:
    """One column of a table design (reference: design/__init__.py:26-120)."""

    name: str
    type: str = "string"  # generic type
    sql_type: str = ""
    source_sql_type: str = ""
    expression: Optional[str] = None  # cast applied during extraction
    description: Optional[str] = None
    not_null: bool = False
    identity: bool = False
    skipped: bool = False
    references: Optional[Tuple[str, List[str]]] = None  # (table, [columns])

    @property
    def varchar_length(self) -> Optional[int]:
        m = _VARCHAR_RE.search(self.sql_type or "")
        return int(m.group(1)) if m else None

    def spark_type(self) -> T.DataType:
        return generic_to_spark_type(self.type, self.sql_type)

    def to_struct_field(self) -> T.StructField:
        metadata: Dict[str, Any] = {}
        if self.varchar_length is not None:
            metadata["varchar_length"] = self.varchar_length
        if self.identity:
            metadata["identity"] = True
        return T.StructField(
            self.name, self.spark_type(), nullable=not self.not_null, metadata=metadata
        )

    @classmethod
    def from_struct_field(cls, sf: T.StructField) -> "ColumnDefinition":
        return cls(
            name=sf.name,
            type=spark_type_to_generic(sf.dataType),
            sql_type=spark_type_to_sql_type(sf.dataType),
            not_null=not sf.nullable,
        )

    def to_dict(self) -> Dict[str, Any]:
        d: Dict[str, Any] = {"name": self.name, "type": self.type}
        if self.sql_type:
            d["sql_type"] = self.sql_type
        if self.source_sql_type:
            d["source_sql_type"] = self.source_sql_type
        if self.expression:
            d["expression"] = self.expression
        if self.description:
            d["description"] = self.description
        if self.not_null:
            d["not_null"] = True
        if self.identity:
            d["identity"] = True
        if self.skipped:
            d["skipped"] = True
        if self.references:
            d["references"] = [self.references[0], list(self.references[1])]
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ColumnDefinition":
        refs = d.get("references")
        return cls(
            name=d["name"],
            type=d.get("type", "string"),
            sql_type=d.get("sql_type", ""),
            source_sql_type=d.get("source_sql_type", ""),
            expression=d.get("expression"),
            description=d.get("description"),
            not_null=bool(d.get("not_null", False)),
            identity=bool(d.get("identity", False)),
            skipped=bool(d.get("skipped", False)),
            references=(refs[0], list(refs[1])) if refs else None,
        )


@dataclass
class ExtractSettings:
    """Reference: table_design.schema:213-231."""

    condition: Optional[str] = None
    split_by: Optional[List[str]] = None
    boundary_query: Optional[str] = None
    num_partitions: Optional[int] = None

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ExtractSettings":
        return cls(
            condition=d.get("condition"),
            split_by=list(d["split_by"]) if d.get("split_by") else None,
            boundary_query=d.get("boundary_query"),
            num_partitions=d.get("num_partitions"),
        )


@dataclass
class TableDesign:
    """A full table design document (reference: table_design.schema)."""

    name: str  # "schema.table"
    # upstream "source.schema.table", or "CTAS" / "VIEW" / "EXTERNAL"
    # (EXTERNAL = Spectrum-analog: queried in place at attributes.location,
    # never copied — reference config/dw.py:85)
    source_name: str
    columns: List[ColumnDefinition] = field(default_factory=list)
    constraints: List[Dict[str, List[str]]] = field(default_factory=list)
    attributes: Dict[str, Any] = field(default_factory=dict)
    extract_settings: ExtractSettings = field(default_factory=ExtractSettings)
    depends_on: List[str] = field(default_factory=list)
    description: Optional[str] = None
    unload_target: Optional[str] = None

    # -- derived ------------------------------------------------------------

    @property
    def kind(self) -> str:
        if self.source_name == "CTAS":
            return "CTAS"
        if self.source_name == "VIEW":
            return "VIEW"
        if self.source_name == "EXTERNAL":
            return "EXTERNAL"
        return "TABLE"

    @property
    def unskipped_columns(self) -> List[ColumnDefinition]:
        return [c for c in self.columns if not c.skipped]

    @property
    def column_names(self) -> List[str]:
        return [c.name for c in self.unskipped_columns]

    @property
    def identity_column(self) -> Optional[ColumnDefinition]:
        for c in self.columns:
            if c.identity:
                return c
        return None

    def to_spark_schema(self) -> T.StructType:
        return T.StructType([c.to_struct_field() for c in self.unskipped_columns])

    def constraint_items(self) -> List[Tuple[str, List[str]]]:
        """Flatten the one-key constraint dicts to (type, columns) pairs."""
        out: List[Tuple[str, List[str]]] = []
        for c in self.constraints:
            for ctype, cols in c.items():
                out.append((ctype, list(cols)))
        return out

    # -- (de)serialization --------------------------------------------------

    def to_dict(self) -> Dict[str, Any]:
        d: Dict[str, Any] = {
            "name": self.name,
            "source_name": self.source_name,
            "columns": [c.to_dict() for c in self.columns],
        }
        if self.description:
            d["description"] = self.description
        if self.constraints:
            d["constraints"] = self.constraints
        if self.attributes:
            d["attributes"] = self.attributes
        es = self.extract_settings
        if es.condition or es.split_by or es.boundary_query or es.num_partitions:
            sub: Dict[str, Any] = {}
            if es.condition:
                sub["condition"] = es.condition
            if es.split_by:
                sub["split_by"] = es.split_by
            if es.boundary_query:
                sub["boundary_query"] = es.boundary_query
            if es.num_partitions:
                sub["num_partitions"] = es.num_partitions
            d["extract_settings"] = sub
        if self.depends_on:
            d["depends_on"] = self.depends_on
        if self.unload_target:
            d["unload_target"] = self.unload_target
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TableDesign":
        return cls(
            name=d["name"],
            source_name=d["source_name"],
            columns=[ColumnDefinition.from_dict(c) for c in d.get("columns", [])],
            constraints=list(d.get("constraints", [])),
            attributes=dict(d.get("attributes", {})),
            extract_settings=ExtractSettings.from_dict(d.get("extract_settings", {})),
            depends_on=list(d.get("depends_on", [])),
            description=d.get("description"),
            unload_target=d.get("unload_target"),
        )

    @classmethod
    def from_spark_schema(
        cls, name: str, source_name: str, schema: T.StructType
    ) -> "TableDesign":
        """Bootstrap a design from an observed DataFrame schema."""
        return cls(
            name=name,
            source_name=source_name,
            columns=[ColumnDefinition.from_struct_field(f) for f in schema.fields],
        )


# Upstream (Postgres-ish) attribute type -> (generic, cast expression or None).
# Reference: config/default_settings.yaml:74-119 as_is_att_type /
# cast_needed_att_type; engine ColumnDefinition.from_attribute
# (design/__init__.py:79-120).
_AS_IS_TYPES: List[Tuple[str, str]] = [
    (r"^bigint$", "long"),
    (r"^boolean$", "boolean"),
    (r"^character varying\(\d+\)$", "string"),
    (r"^date$", "date"),
    (r"^double precision$", "double"),
    (r"^real$", "double"),
    (r"^integer$", "int"),
    (r"^smallint$", "int"),
    (r"^numeric\(\d+,\d+\)$", "decimal"),
    (r"^text$", "string"),
    (r"^timestamp without time zone$", "timestamp"),
]

_CAST_NEEDED: List[Tuple[str, Tuple[str, str, str]]] = [
    (r"^bytea$", ("varchar(65535)", "base64(%s)", "string")),
    (r"^json$", ("varchar(65535)", "cast(%s as string)", "string")),
    (r"^uuid$", ("varchar(36)", "cast(%s as string)", "string")),
    (r"^timestamp with time zone$", ("timestamp", "to_utc_timestamp(%s, 'UTC')", "timestamp")),
    (r"^\w+\[\]$", ("varchar(65535)", "cast(%s as string)", "string")),
    (r"^hstore$", ("varchar(65535)", "cast(%s as string)", "string")),
]


def column_from_attribute(
    name: str, source_sql_type: str, not_null: bool = False
) -> ColumnDefinition:
    """Map an upstream column attribute to a design column.

    >>> column_from_attribute("id", "bigint", True).type
    'long'
    >>> c = column_from_attribute("blob", "bytea")
    >>> (c.type, c.expression)
    ('string', 'base64(%s)')
    >>> column_from_attribute("weird", "custom_enum").sql_type
    'varchar(10000)'
    """
    for pattern, generic in _AS_IS_TYPES:
        if re.match(pattern, source_sql_type):
            return ColumnDefinition(
                name=name,
                type=generic,
                sql_type=source_sql_type,
                source_sql_type=source_sql_type,
                not_null=not_null,
            )
    for pattern, (new_sql_type, cast_expr, generic) in _CAST_NEEDED:
        if re.match(pattern, source_sql_type):
            return ColumnDefinition(
                name=name,
                type=generic,
                sql_type=new_sql_type,
                source_sql_type=source_sql_type,
                expression=cast_expr,
                not_null=not_null,
            )
    # default_att_type fallback (default_settings.yaml:118)
    return ColumnDefinition(
        name=name,
        type="string",
        sql_type="varchar(10000)",
        source_sql_type=source_sql_type,
        expression="cast(%s as string)",
        not_null=not_null,
    )

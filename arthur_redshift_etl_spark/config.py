"""Warehouse configuration model.

Reference parity: ``python/etl/config/dw.py`` — ``DataWarehouseSchema``
(:53-177) classifies each namespace as database source (read_access DSN),
static source (s3 path), external catalog schema, or transformation schema,
with an optional unload target and a per-schema S3 data format (:33-50);
``DataWarehouseConfig`` (:180-300) holds the ordered schema list, type maps,
and the required-for-success selector (:215-216).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml

from .errors import ETLConfigError
from .names import TableSelector


@dataclass
class S3DataFormat:
    """Per-schema lake data format (reference dw.py:33-50)."""

    format: str = "parquet"  # CSV | JSON | AVRO | PARQUET
    compression: Optional[str] = None  # GZIP | ZSTD | None

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "S3DataFormat":
        return cls(
            format=str(d.get("format", "parquet")).lower(),
            compression=d.get("compression"),
        )


@dataclass
class WarehouseSchema:
    """One namespace and its role (reference dw.py:53-177)."""

    name: str
    read_access: Optional[str] = None  # DSN env-var name → database source
    s3_path: Optional[str] = None  # → static source
    is_external: bool = False  # external catalog (Spectrum analog)
    unload_target: Optional[str] = None
    data_format: S3DataFormat = field(default_factory=S3DataFormat)
    groups: List[str] = field(default_factory=list)  # reader/writer groups
    tags: List[str] = field(default_factory=list)  # selection tags (dw.py)

    @property
    def is_database_source(self) -> bool:
        return self.read_access is not None

    @property
    def is_static_source(self) -> bool:
        # an external schema also carries an s3_path (its catalog location,
        # reference dw.py Spectrum schemas) but is attached, not extracted
        return (
            self.s3_path is not None
            and self.read_access is None
            and not self.is_external
        )

    @property
    def is_upstream_source(self) -> bool:
        return self.is_database_source or self.is_static_source

    @property
    def is_transformation(self) -> bool:
        return not self.is_upstream_source and not self.is_external

    @property
    def kind(self) -> str:
        if self.is_database_source:
            return "database_source"
        if self.is_static_source:
            return "static_source"
        if self.is_external:
            return "external"
        return "transformation"

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "WarehouseSchema":
        if "name" not in d:
            raise ETLConfigError("schema entry missing 'name'")
        return cls(
            name=str(d["name"]).lower(),
            read_access=d.get("read_access"),
            s3_path=d.get("s3_path"),
            is_external=bool(d.get("external", False)),
            unload_target=d.get("unload_target"),
            data_format=S3DataFormat.from_dict(d.get("data_format", {})),
            groups=list(d.get("groups", [])),
            tags=[str(t) for t in d.get("tags", [])],
        )


@dataclass
class WarehouseConfig:
    """Ordered schema list + required-relation selector (dw.py:180-300)."""

    schemas: List[WarehouseSchema] = field(default_factory=list)
    required_patterns: List[str] = field(default_factory=list)
    settings: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        names = [s.name for s in self.schemas]
        if len(set(names)) != len(names):
            raise ETLConfigError(f"duplicate schema names in config: {names}")

    @property
    def required_selector(self) -> TableSelector:
        return TableSelector(self.required_patterns or ["__none__.__none__"])

    def schema(self, name: str) -> WarehouseSchema:
        for s in self.schemas:
            if s.name == name.lower():
                return s
        raise ETLConfigError(f"unknown schema: {name}")

    @property
    def source_schemas(self) -> List[WarehouseSchema]:
        return [s for s in self.schemas if s.is_upstream_source]

    @property
    def transformation_schemas(self) -> List[WarehouseSchema]:
        return [s for s in self.schemas if s.is_transformation]

    @property
    def external_schemas(self) -> List[WarehouseSchema]:
        return [s for s in self.schemas if s.is_external]

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "WarehouseConfig":
        return cls(
            schemas=[WarehouseSchema.from_dict(s) for s in d.get("schemas", [])],
            required_patterns=list(d.get("required_for_success", [])),
            settings=dict(d.get("settings", {})),
        )

    @classmethod
    def load(cls, path: str) -> "WarehouseConfig":
        with open(path) as fh:
            return cls.from_dict(yaml.safe_load(fh) or {})


# -- settings introspection + template substitution ---------------------------
# Reference parity: ``python/etl/commands.py:1891-1944`` (ShowValueCommand /
# RenderTemplateCommand / ShowVarsCommand) backed by etl.config.settings and
# etl.templates — resolved configuration exposed as dotted-path variables
# usable in ``${name}`` template placeholders.

_PLACEHOLDER = re.compile(r"\$\{([A-Za-z0-9_][A-Za-z0-9_.-]*)\}")


def flatten_vars(config: "WarehouseConfig") -> Dict[str, str]:
    """All resolvable dotted-path variables and their (string) values.

    ``settings.*`` flattens the free-form settings tree; ``schemas.<name>.*``
    exposes each namespace's resolved role and attributes (the values an
    operator actually wants to check after editing config); scalar lists
    render as comma-joined strings so they drop cleanly into templates.
    """
    out: Dict[str, str] = {}

    def render(v: Any) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (list, tuple)):
            return ",".join(render(x) for x in v)
        return "" if v is None else str(v)

    def walk(prefix: str, node: Any) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}.{k}" if prefix else str(k), v)
        else:
            out[prefix] = render(node)

    walk("settings", config.settings)
    out["required_for_success"] = render(config.required_patterns)
    for s in config.schemas:
        p = f"schemas.{s.name}"
        out[f"{p}.kind"] = s.kind
        out[f"{p}.read_access"] = render(s.read_access)
        out[f"{p}.s3_path"] = render(s.s3_path)
        out[f"{p}.unload_target"] = render(s.unload_target)
        out[f"{p}.data_format"] = s.data_format.format
        out[f"{p}.groups"] = render(s.groups)
        out[f"{p}.tags"] = render(s.tags)
    return out


def get_tags(config: "WarehouseConfig") -> List[str]:
    """All distinct schema tags, sorted (reference config/__init__.py:148
    ``get_tags`` — the vocabulary usable in tag-based selection)."""
    tags: set = set()
    for s in config.schemas:
        tags.update(s.tags)
    return sorted(tags)


def show_value(
    config: "WarehouseConfig", name: str, default: Optional[str] = None
) -> str:
    """The resolved value for one dotted-path setting (reference
    ShowValueCommand): unset + no default is a configuration ERROR, not an
    empty string — a template relying on it must fail loudly."""
    variables = flatten_vars(config)
    if name in variables:
        return variables[name]
    # an explicitly supplied default wins over the section rendering below
    # — a caller passing one expects a scalar, not a JSON blob
    if default is not None:
        return default
    # a SECTION path (prefix of leaf settings) is configured, just not a
    # leaf — render its subtree as JSON instead of claiming it is unset
    prefix = name + "."
    subtree = {k: v for k, v in variables.items() if k.startswith(prefix)}
    if subtree:
        import json

        return json.dumps(
            {k[len(prefix):]: v for k, v in sorted(subtree.items())},
            sort_keys=True,
        )
    raise ETLConfigError(f"setting {name!r} is unset and no default was given")


def render_template(text: str, variables: Dict[str, str]) -> str:
    """Replace every ``${dotted.name}`` placeholder; unknown names raise
    (reference RenderTemplateCommand behavior — a silently-left placeholder
    would ship a broken artifact)."""
    missing = sorted(
        {m.group(1) for m in _PLACEHOLDER.finditer(text)} - set(variables)
    )
    if missing:
        raise ETLConfigError(f"template references unset setting(s): {missing}")
    return _PLACEHOLDER.sub(lambda m: variables[m.group(1)], text)

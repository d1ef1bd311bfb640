"""Mapping-rule configuration model.

Mirrors the reference's settings schema `OtelComponentMapping` /
`OtelRelationMapping` / `OtelVariableMapping` / `OtelTagMapping`
(extension/settingsproviderextension/spec/openapi.yaml:1054-1332), with one
deliberate substitution: where the reference embeds CEL expression strings
interpreted per record (internal/expression.go), we embed **Spark SQL
expression strings** compiled ONCE at plan time into Catalyst Column trees.
The CEL compile cache (expression.go:313-339) therefore disappears —
Catalyst is the program cache (SURVEY.md §4).

Expressions reference the flattened page-record columns (parse.py) and
variables as ``vars.<name>`` (rewritten to the materialized var column by
the compiler — eval.go:60-88 analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

ACTION_CREATE = "CREATE"
ACTION_DELETE = "DELETE"

DEP_HIERARCHICAL = "HIERARCHICAL"
DEP_CONNECTION = "CONNECTION"
DEP_UNSPECIFIED = "UNSPECIFIED"


@dataclass(frozen=True)
class TagMapping:
    """Tag projection (openapi.yaml:1245-1303).

    Direct form  (mapping.go:167-180): source (string expr) -> tags[target].
    Regex form   (mapping.go:182-245): source is a MAP expr; every key
    matching `pattern` is re-keyed through `target` with ${N} capture-group
    expansion. Explicit (direct) keys win over regex-derived keys.
    """

    target: str
    source: str
    pattern: Optional[str] = None  # presence selects the regex form


@dataclass(frozen=True)
class ComponentOutput:
    """Component output projection (openapi.yaml:1245-1332, mapping.go:36-157)."""

    identifier: str  # required string expr
    name: str  # required string expr
    type_name: str  # required string expr
    additional_identifiers: tuple[str, ...] = ()  # optional: error => skipped
    configuration: Optional[str] = None  # map expr (pick/omit composition)
    status: Optional[str] = None  # map expr
    tags: tuple[TagMapping, ...] = ()
    layer: Optional[str] = None
    domain: Optional[str] = None


@dataclass(frozen=True)
class RelationOutput:
    """Relation output projection (mapping.go:249-292)."""

    source_id: str  # string expr
    target_id: str  # string expr
    type_name: str  # string expr
    dependency_type: str = DEP_UNSPECIFIED  # normalized via upper/trim


@dataclass(frozen=True)
class ComponentMapping:
    identifier: str  # mapping id == dataSource of the output stream
    signal: str = "logs"  # which signal stream this applies to
    condition: Optional[str] = None  # bool expr; eval error/null => false
    action: str = ACTION_CREATE
    vars: tuple[tuple[str, str], ...] = ()  # ordered (name, expr)
    output: ComponentOutput = None
    ttl_seconds: int = 900  # dedup TTL (factory.go:98-105 default 15 min)


@dataclass(frozen=True)
class RelationMapping:
    identifier: str
    signal: str = "logs"
    condition: Optional[str] = None
    action: str = ACTION_CREATE
    vars: tuple[tuple[str, str], ...] = ()
    output: RelationOutput = None
    ttl_seconds: int = 900


@dataclass
class MappingSet:
    """A versioned settings snapshot (settings_snapshot_processor.go:55-158)."""

    version: int = 1
    components: list[ComponentMapping] = field(default_factory=list)
    relations: list[RelationMapping] = field(default_factory=list)

    def for_signal(self, signal: str) -> "MappingSet":
        """filterForSignal analog (snapshot_manager.go:245-253)."""
        return MappingSet(
            version=self.version,
            components=[m for m in self.components if m.signal == signal],
            relations=[m for m in self.relations if m.signal == signal],
        )

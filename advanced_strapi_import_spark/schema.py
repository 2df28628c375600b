"""Content-type registry: dynamic table schemas -> Spark types + metadata.

Mirrors the reference's runtime schema model (a map ``fieldName ->
{type, required, default, unique, enum, relation, target, component,
repeatable}`` read from ``strapi.contentTypes`` — see
/root/reference/server/services/csv-import.js:10-30 and the mock schemas
at tests/helpers/setup.js:5-43), re-expressed as plain dataclasses that
compile to Spark ``StructType`` with real nested types (components become
StructType / ArrayType(StructType) instead of flattened dot columns).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

# reference type -> Spark type (SURVEY.md §1 table)
_SCALAR_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "text": T.StringType(),
    "richtext": T.StringType(),
    "uid": T.StringType(),
    "email": T.StringType(),
    "enumeration": T.StringType(),
    "integer": T.LongType(),
    "biginteger": T.LongType(),
    "decimal": T.DoubleType(),
    "float": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.StringType(),       # reference normalizes to ISO-8601 strings
    "datetime": T.StringType(),   # (csv-import.js:160-164 toISOString())
    "time": T.StringType(),
    "json": T.StringType(),
}

# cascade candidates for entity resolution (csv-import.js:576)
COMMON_SEARCH_FIELDS = ["name", "title", "slug", "displayName", "label", "country"]


@dataclass
class Attribute:
    """One field of a content type (csv-import.js validation switch
    :127-197 enumerates the supported types)."""

    type: str
    required: bool = False
    default: Any = None
    unique: bool = False
    enum: list[str] | None = None
    relation: str | None = None     # oneToOne | manyToOne | oneToMany | manyToMany
    target: str | None = None       # target content-type name
    component: str | None = None    # component name (registry.components)
    repeatable: bool = False

    @property
    def is_multi_relation(self) -> bool:
        return self.type == "relation" and self.relation in ("oneToMany", "manyToMany")

    @property
    def is_scalar_relation(self) -> bool:
        return self.type == "relation" and not self.is_multi_relation


@dataclass
class ContentType:
    """A dynamic table schema ({uid, names, attributes})."""

    uid: str
    singular_name: str = ""
    plural_name: str = ""
    display_name: str = ""
    attributes: dict[str, Attribute] = field(default_factory=dict)

    def required_without_default(self) -> list[str]:
        return [
            n for n, a in self.attributes.items()
            if a.required and a.default is None
        ]


@dataclass
class Registry:
    """All known content types + component schemas (the engine's catalog;
    analog of getContentTypes() csv-import.js:10-30 filtered to api::*)."""

    content_types: dict[str, ContentType] = field(default_factory=dict)
    components: dict[str, ContentType] = field(default_factory=dict)

    def get(self, name: str) -> ContentType:
        return self.content_types[name]

    def list_tables(self) -> list[dict[str, str]]:
        """GET /content-types analog (controllers/csv-import.js:7-20)."""
        return [
            {
                "uid": ct.uid,
                "singularName": ct.singular_name,
                "pluralName": ct.plural_name,
                "displayName": ct.display_name,
            }
            for ct in self.content_types.values()
        ]

    # ------------------------------------------------------------------
    def spark_type(self, attr: Attribute) -> T.DataType:
        if attr.type in _SCALAR_TYPES:
            return _SCALAR_TYPES[attr.type]
        if attr.type == "relation":
            base = T.LongType()
            return T.ArrayType(base) if attr.is_multi_relation else base
        if attr.type == "media":
            return T.ArrayType(T.LongType())
        if attr.type == "component":
            comp = self.components[attr.component]
            struct = self.struct_type(comp)
            return T.ArrayType(struct) if attr.repeatable else struct
        return T.StringType()

    def struct_type(self, ct: ContentType) -> T.StructType:
        return T.StructType(
            [
                T.StructField(n, self.spark_type(a), nullable=not a.required)
                for n, a in ct.attributes.items()
            ]
        )

    # ------------------------------------------------------------------
    @classmethod
    def from_dict(cls, d: dict) -> "Registry":
        """Load a registry from a plain-dict catalog (JSON-file friendly)."""

        def ct_of(name: str, spec: dict) -> ContentType:
            return ContentType(
                uid=spec.get("uid", name),
                singular_name=spec.get("singularName", name),
                plural_name=spec.get("pluralName", name + "s"),
                display_name=spec.get("displayName", name.title()),
                attributes={
                    an: Attribute(**aspec) for an, aspec in spec["attributes"].items()
                },
            )

        return cls(
            content_types={n: ct_of(n, s) for n, s in d.get("contentTypes", {}).items()},
            components={n: ct_of(n, s) for n, s in d.get("components", {}).items()},
        )

    def search_fields(self, ct: ContentType) -> list[str]:
        """String-typed common fields in cascade precedence order
        (csv-import.js:571-583)."""
        return [
            f for f in COMMON_SEARCH_FIELDS
            if f in ct.attributes and ct.attributes[f].type == "string"
        ]

"""Model compiler: reference model-YAML -> Spark schema + coercion/validation plans.

Parses the reference's model format (icdc_schema.py:44-107,246-336):

- ``Nodes:`` node type -> ``Props`` list
- ``Relationships:`` rel type -> ``Mul`` + ``Ends`` (Src/Dst, per-end Mul
  override) + optional ``Props``
- ``PropDefinitions:`` prop -> Type/Enum (scalar | enum list | dict with
  value_type/item_type/units), Req (true/'Yes'; 'Preferred' not enforced,
  icdc_schema.py:246-253), Private, Key, minimum/maximum/exclusiveMinimum/
  exclusiveMaximum bounds (icdc_schema.py:309-316)
- a props file (props.py:6-27): domain, type_mapping, id_fields, delimiter,
  rel_prop_delimiter, plurals, save_parent_id, indexes

and compiles, per node type:

- a ``StructType`` (Spark-native types; Array is ``ArrayType(String)``
  internally, JSON string at the sink boundary for reference parity)
- coercion expressions (functions/coerce.py)
- the validation plan consumed by operators/validate.py (V1-V8)

Value-with-unit props synthesize ``<p>_unit``, ``<p>_original``,
``<p>_original_unit`` companions with the default (first) unit
(icdc_schema.py:375-392; data_loader.py:460-462).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import yaml
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions import coerce

DEFAULT_TYPE = "String"
DEFAULT_TYPE_MAPPING = {
    "string": "String",
    "number": "Float",
    "integer": "Int",
    "boolean": "Boolean",
    "array": "Array",
    "object": "Object",
    "datetime": "DateTime",
    "date": "Date",
    "TBD": "String",
}
DEFAULT_MULTIPLIER = "many_to_one"  # bento DEFAULT_MULTIPLIER
_URL_RE = re.compile(r"://")

SPARK_TYPES = {
    "String": T.StringType(),
    "Int": T.LongType(),
    "Float": T.DoubleType(),
    "Boolean": T.BooleanType(),
    "Array": T.ArrayType(T.StringType()),
    "Object": T.MapType(T.StringType(), T.StringType()),
    "Date": T.StringType(),  # reference stores '%Y-%m-%d' strings
    "DateTime": T.StringType(),
}


@dataclass
class PropDef:
    name: str
    type: str = DEFAULT_TYPE
    enum: set | None = None
    item_enum: set | None = None
    required: bool = False
    private: bool = False
    key: bool = False
    minimum: float | None = None
    maximum: float | None = None
    exclusive_minimum: float | None = None
    exclusive_maximum: float | None = None
    has_unit: bool = False
    units: list = field(default_factory=list)

    @property
    def default_unit(self):
        return self.units[0] if self.units else None


@dataclass
class RelEnd:
    src: str
    dst: str
    multiplier: str


@dataclass
class RelDef:
    name: str
    multiplier: str
    ends: list
    props: list = field(default_factory=list)

    def end(self, src: str, dst: str | None = None) -> RelEnd | None:
        for e in self.ends:
            if e.src == src and (dst is None or e.dst == dst):
                return e
        return None


def _enum_from_list(values) -> set | None:
    """Enum list; a single URL-only entry means external vocab -> no enum
    (icdc_schema.py:295-303)."""
    urls = [v for v in values if isinstance(v, str) and _URL_RE.search(v)]
    if len(values) == 1 and len(urls) == 1:
        return None
    return set(values) if values else None


class Model:
    """Compiled model: nodes, relationships, prop defs, deployment props."""

    def __init__(
        self,
        nodes: dict,
        relationships: dict,
        domain: str = "example.org",
        delimiter: str = "|",
        rel_prop_delimiter: str = "$",
        id_fields: dict | None = None,
        save_parent_id: list | None = None,
        plurals: dict | None = None,
    ):
        self.nodes = nodes  # type -> {prop_name -> PropDef}
        self.relationships = relationships  # name -> RelDef
        self.domain = domain
        self.delimiter = delimiter
        self.rel_prop_delimiter = rel_prop_delimiter
        self._id_fields = id_fields or {}
        self.save_parent_id = save_parent_id or []
        self.plurals = plurals or {}

    # -- construction -------------------------------------------------------

    @classmethod
    def from_yaml(cls, schema_files: list[str], props_file: str | None = None):
        org: dict = {}
        for f in schema_files:
            with open(f) as fh:
                doc = yaml.safe_load(fh)
                if doc:
                    org.update(doc)
        props = {}
        if props_file:
            # reference props.py:6-27 reads the mapping at top level
            with open(props_file) as fh:
                props = yaml.safe_load(fh) or {}
        type_mapping = {**DEFAULT_TYPE_MAPPING, **(props.get("type_mapping") or {})}
        prop_defs = org.get("PropDefinitions", {}) or {}

        def compile_prop(name: str) -> PropDef:
            pd_ = PropDef(name=name)
            d = prop_defs.get(name)
            if d is None:
                return pd_
            req = str(d.get("Req", False)).lower()
            pd_.required = req in ("true", "yes")
            pd_.private = bool(d.get("Private", False))
            pd_.key = bool(d.get("Key", False))
            desc = d.get("Type", d.get("Enum"))
            if isinstance(desc, str):
                pd_.type = type_mapping.get(desc, DEFAULT_TYPE)
            elif isinstance(desc, list):
                pd_.enum = _enum_from_list(desc)
            elif isinstance(desc, dict):
                if "value_type" in desc:
                    pd_.type = type_mapping.get(desc["value_type"], DEFAULT_TYPE)
                it = desc.get("item_type", desc.get("Enum"))
                if isinstance(it, list):
                    pd_.item_enum = _enum_from_list(it)
                if desc.get("units"):
                    pd_.has_unit = True
                    pd_.units = list(desc["units"])
            for yk, ak in [
                ("minimum", "minimum"),
                ("maximum", "maximum"),
                ("exclusiveMinimum", "exclusive_minimum"),
                ("exclusiveMaximum", "exclusive_maximum"),
            ]:
                if yk in d:
                    setattr(pd_, ak, float(d[yk]))
            return pd_

        nodes: dict = {}
        for node_type, desc in (org.get("Nodes", {}) or {}).items():
            node_props: dict = {}
            for p in (desc or {}).get("Props") or []:
                pdef = compile_prop(p)
                node_props[p] = pdef
                if pdef.has_unit:
                    # companion props (icdc_schema.py:375-392)
                    unit_enum = set(pdef.units)
                    node_props[p + "_unit"] = PropDef(
                        p + "_unit", "String", enum=unit_enum, units=pdef.units
                    )
                    node_props[p + "_original"] = PropDef(p + "_original", pdef.type)
                    node_props[p + "_original_unit"] = PropDef(
                        p + "_original_unit", "String", enum=unit_enum, units=pdef.units
                    )
            nodes[node_type] = node_props

        rels: dict = {}
        for rel_name, desc in (org.get("Relationships", {}) or {}).items():
            mul = (desc or {}).get("Mul", DEFAULT_MULTIPLIER)
            ends = [
                RelEnd(e["Src"], e["Dst"], e.get("Mul", mul))
                for e in (desc or {}).get("Ends") or []
            ]
            rels[rel_name] = RelDef(
                rel_name, mul, ends, list((desc or {}).get("Props") or [])
            )

        return cls(
            nodes,
            rels,
            domain=props.get("domain", "example.org"),
            delimiter=props.get("delimiter", "|"),
            rel_prop_delimiter=props.get("rel_prop_delimiter", "$"),
            id_fields=props.get("id_fields") or {},
            save_parent_id=list(props.get("save_parent_id") or []),
            plurals=props.get("plurals") or {},
        )

    # -- lookups ------------------------------------------------------------

    def props_of(self, node_type: str) -> dict:
        return self.nodes.get(node_type, {})

    def get_prop_type(self, node_type: str, prop: str) -> str:
        p = self.props_of(node_type).get(prop)
        return p.type if p else DEFAULT_TYPE

    def id_field(self, node_type: str) -> str:
        """id_fields from props, else Key: true prop, else 'uuid'
        (icdc_schema.py:96-117,663-673)."""
        if node_type in self._id_fields:
            return self._id_fields[node_type]
        for name, p in self.props_of(node_type).items():
            if p.key:
                return name
        return "uuid"

    def required_props(self, node_type: str) -> list[str]:
        return [n for n, p in self.props_of(node_type).items() if p.required]

    def private_props(self, node_type: str) -> list[str]:
        return [n for n, p in self.props_of(node_type).items() if p.private]

    def relationship_for(self, src: str, dst: str) -> tuple[str, RelEnd] | None:
        for name, rel in self.relationships.items():
            e = rel.end(src, dst)
            if e:
                return name, e
        return None

    def is_parent_pointer(self, col: str) -> bool:
        return bool(re.fullmatch(r"\w+\.\w+", col))

    def is_relationship_property(self, col: str) -> bool:
        d = re.escape(self.rel_prop_delimiter)
        return bool(re.match(rf"^.+{d}.+$", col))

    # -- compilation --------------------------------------------------------

    def spark_schema(self, node_type: str, extra_string_cols: list[str] = ()) -> T.StructType:
        fields = [
            T.StructField(n, SPARK_TYPES[p.type], True)
            for n, p in self.props_of(node_type).items()
        ]
        for c in extra_string_cols:
            fields.append(T.StructField(c, T.StringType(), True))
        return T.StructType(fields)

    def coercion_expr(self, node_type: str, col_name: str) -> Column:
        """Native coercion expression for a string input column, per the
        model-declared type (data_loader.py:383-436 semantics)."""
        c = F.col(col_name)
        t = self.get_prop_type(node_type, col_name)
        if t == "Boolean":
            return coerce.boolean_expr(c)
        if t == "Int":
            return coerce.int_expr(c)
        if t == "Float":
            return coerce.float_expr(c)
        if t == "Array":
            return coerce.array_expr(c, self.delimiter)
        if t in ("Date", "DateTime"):
            return coerce.date_expr(c)
        return c

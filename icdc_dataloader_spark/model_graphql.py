"""Model YAML → GraphQL schema emitter (reference model-converter.py).

The reference's satellite tool turns the compiled model into `type X {...}`
blocks — one per node type, PUBLIC props only, with Date/DateTime and
Object/Array collapsed to String (model-converter.py:66-84) — appends a
caller-supplied custom-query block, and writes a second "-doc" copy with
all `@tag(...)` annotations stripped by parenthesis counting
(model-converter.py:87-128).  Pure metadata work: stays a driver-side
function here (no Spark job needed for a schema file).
"""

from __future__ import annotations

from .model import Model

# GraphQL scalar per model type (model-converter.py:71-76)
_GQL_TYPE = {
    "String": "String",
    "Int": "Int",
    "Integer": "Int",
    "Float": "Float",
    "Boolean": "Boolean",
    "Date": "String",
    "DateTime": "String",
    "Object": "String",
    "Array": "String",
}


def model_to_graphql(model: Model, query_block: str | None = None) -> str:
    """Emit `type <node> { prop: Type ... }` per node, public props only."""
    out = []
    for node in sorted(model.nodes):
        private = set(model.private_props(node))
        out.append(f"type {node} {{")
        for prop, pdef in model.props_of(node).items():
            if prop in private:
                continue
            out.append(f"  {prop}: {_GQL_TYPE.get(pdef.type, 'String')}")
        out.append("}\n")
    text = "\n".join(out)
    if query_block:
        text += query_block if query_block.endswith("\n") else query_block + "\n"
    return text


def strip_annotations(graphql_text: str) -> str:
    """The '-doc' copy: drop `@tag(...)` annotations, tracking parentheses
    across lines (model-converter.py:87-128 semantics)."""
    out_lines = []
    tag_open = False
    count_started = False
    count = 0
    for line in graphql_text.splitlines(keepends=True):
        if tag_open:
            if not count_started and "(" in line:
                count_started = True
                count = line.count("(") - line.count(")")
            elif count_started:
                count += line.count("(") - line.count(")")
            if count_started and count == 0:
                tag_open = False
                count_started = False
            continue
        if "@" in line:
            head, post = line.split("@", 1)
            out_lines.append(head + "\n")
            if "(" in post:
                count = post.count("(") - post.count(")")
                if count != 0:
                    tag_open = True
                    count_started = True
            # argless annotation (@deprecated): consumed with its line —
            # leaving the tag open would swallow the rest of the file
            # waiting for a parenthesis that never comes
            continue
        out_lines.append(line)
    return "".join(out_lines)

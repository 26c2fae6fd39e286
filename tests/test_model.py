"""Model compiler: reference-format YAML -> compiled plans."""

from icdc_dataloader_spark.repos import load_repos_model


def test_model_parses():
    m = load_repos_model()
    assert set(m.nodes) == {"repo_file", "repo_owner"}
    assert m.domain == "repos.example.org"
    props = m.props_of("repo_file")
    # value-with-unit companions synthesized (icdc_schema.py:375-392)
    assert "size_kb_unit" in props and "size_kb_original_unit" in props
    assert props["size_kb_unit"].enum == {"KB", "MB"}
    assert props["size_kb_unit"].default_unit == "KB"
    assert props["size_kb"].type == "Float" and props["size_kb"].has_unit
    assert props["stars"].type == "Int"
    assert props["stars"].minimum == 0 and props["stars"].maximum == 1000000
    assert props["lang"].enum and "python" in props["lang"].enum
    assert props["topics"].type == "Array"
    assert props["topics"].item_enum == {"web", "ml", "db", "cli", "infra"}


def test_required_and_ids():
    m = load_repos_model()
    assert set(m.required_props("repo_file")) == {"repo", "path", "commit"}
    assert m.id_field("repo_file") == "file_key"  # from props id_fields
    assert m.id_field("repo_owner") == "owner_id"
    assert m.id_field("unknown_type") == "uuid"  # fallback (icdc_schema.py:663-673)


def test_relationships():
    m = load_repos_model()
    rel = m.relationships["owned_by"]
    assert rel.multiplier == "many_to_one"
    assert rel.end("repo_file", "repo_owner") is not None
    assert m.relationship_for("repo_file", "repo_owner")[0] == "owned_by"
    assert m.is_relationship_property("owned_by$since")
    assert not m.is_relationship_property("since")


def test_spark_schema():
    m = load_repos_model()
    schema = m.spark_schema("repo_file")
    names = {f.name for f in schema.fields}
    assert {"repo", "path", "commit", "lang", "content", "stars"} <= names
    types = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert types["stars"] == "bigint"
    assert types["size_kb"] == "double"
    assert types["topics"] == "array<string>"

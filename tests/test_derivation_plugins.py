"""J7+W8 (IndividualCreator on NODE_LOADED) and W7 (full VisitCreator:
inferred visit + of_cycle / fallback of_case edge) — end-to-end through
GraphLoader, mirroring the reference's loader_plugins semantics."""

import pytest

from icdc_dataloader_spark.functions.identity import get_uuid
from icdc_dataloader_spark.model import Model, PropDef, RelDef, RelEnd
from icdc_dataloader_spark.plans.graph_loader import GraphLoader
from icdc_dataloader_spark.plugins import (
    IndividualCreator,
    PluginRegistry,
    VisitCreator,
)

DOMAIN = "caninecommons.cancer.gov"


def _write_tsv(path, header, rows):
    with open(path, "w") as fh:
        fh.write("\t".join(header) + "\n")
        for r in rows:
            fh.write("\t".join(r) + "\n")
    return str(path)


def icdc_model() -> Model:
    s = lambda n: PropDef(n, "String")
    return Model(
        nodes={
            "case": {"case_id": s("case_id")},
            "cycle": {
                "cycle_id": s("cycle_id"), "case_id": s("case_id"),
                "date_of_cycle_start": s("date_of_cycle_start"),
                "date_of_cycle_end": s("date_of_cycle_end"),
            },
            "visit": {
                "visit_id": s("visit_id"), "visit_date": s("visit_date"),
                "case_id": s("case_id"),
            },
            "sample": {
                "sample_id": s("sample_id"), "visit_date": s("visit_date"),
                "case_id": s("case_id"),
            },
            "registration": {"registration_id": s("registration_id")},
            "individual": {"individual_id": s("individual_id")},
        },
        relationships={
            "of_case": RelDef("of_case", "many_to_one",
                              [RelEnd("visit", "case", "many_to_one")]),
            "of_cycle": RelDef("of_cycle", "many_to_one",
                               [RelEnd("visit", "cycle", "many_to_one")]),
            "of_visit": RelDef("of_visit", "many_to_one",
                               [RelEnd("sample", "visit", "many_to_one")]),
            "registered_to": RelDef(
                "registered_to", "many_to_many",
                [RelEnd("registration", "case", "many_to_many")]),
            "of_individual": RelDef(
                "of_individual", "many_to_one",
                [RelEnd("case", "individual", "many_to_one")]),
        },
        domain=DOMAIN,
        id_fields={
            "case": "case_id", "cycle": "cycle_id", "visit": "visit_id",
            "sample": "sample_id", "registration": "registration_id",
            "individual": "individual_id",
        },
    )


# ---------------------------------------------------------------------------
# W7: VisitCreator end-to-end
# ---------------------------------------------------------------------------


def test_visit_creator_synthesizes_and_attaches_cycles(spark, tmp_path):
    cases = _write_tsv(tmp_path / "cases.txt", ["type", "case_id"], [["case", "c1"]])
    cycles = _write_tsv(
        tmp_path / "cycles.txt",
        ["type", "cycle_id", "case_id", "date_of_cycle_start", "date_of_cycle_end"],
        [
            ["cycle", "cy1", "c1", "2020-01-10", "2020-01-20"],
            ["cycle", "cy2", "c1", "2020-02-01", ""],  # open-ended
        ],
    )
    samples = _write_tsv(
        tmp_path / "samples.txt",
        ["type", "sample_id", "visit_date", "case_id", "visit.visit_id"],
        [
            ["sample", "s1", "2020-01-12", "c1", "v1"],  # inside cy1
            ["sample", "s2", "2020-01-05", "c1", "v2"],  # PREDATE before cy1
            ["sample", "s3", "2020-01-25", "c1", "v3"],  # gap -> case fallback
            ["sample", "s4", "2020-02-10", "c1", "v4"],  # open cy2
        ],
    )
    reg = PluginRegistry()
    vc = VisitCreator(domain=DOMAIN)
    reg.register(vc)
    gl = GraphLoader(spark, str(tmp_path / "g"), icdc_model(), registry=reg)
    m = gl.load_files([("case", cases), ("cycle", cycles), ("sample", samples)])

    assert m["missing_parents"] == 0  # all four visits synthesized
    visits = {r["visit_id"]: r for r in gl.nodes("visit").collect()}
    assert set(visits) == {"v1", "v2", "v3", "v4"}
    assert all(v["inferred"] is True for v in visits.values())
    assert visits["v1"]["uuid"] == get_uuid(DOMAIN, "visit", "v1")

    cyc = {r["cycle_id"]: r["uuid"] for r in gl.nodes("cycle").collect()}
    case_uuid = gl.nodes("case").collect()[0]["uuid"]
    edges = gl.edges().collect()
    by_child = {}
    for e in edges:
        by_child.setdefault(e["child_uuid"], []).append(e)

    def visit_edges(vid):
        return [
            e for e in by_child.get(visits[vid]["uuid"], [])
            if e["rel_type"] in ("of_cycle", "of_case")
        ]

    assert [(e["rel_type"], e["parent_uuid"]) for e in visit_edges("v1")] == [
        ("of_cycle", cyc["cy1"])
    ]
    assert [(e["rel_type"], e["parent_uuid"]) for e in visit_edges("v2")] == [
        ("of_cycle", cyc["cy1"])
    ]
    assert [(e["rel_type"], e["parent_uuid"]) for e in visit_edges("v3")] == [
        ("of_case", case_uuid)
    ]
    assert [(e["rel_type"], e["parent_uuid"]) for e in visit_edges("v4")] == [
        ("of_cycle", cyc["cy2"])
    ]
    # the inferred flag rides on the edge (visit_creator.py:152)
    assert all(
        e["rel_props"]["inferred"] == "true"
        for vid in ("v1", "v2", "v3", "v4")
        for e in visit_edges(vid)
    )
    # samples attached to their (now existing) visits
    n_sample_edges = sum(1 for e in edges if e["rel_type"] == "of_visit")
    assert n_sample_edges == 4
    assert vc.nodes_created == 4
    assert vc.relationships_created == 4


# ---------------------------------------------------------------------------
# J7 + W8: IndividualCreator end-to-end
# ---------------------------------------------------------------------------


def _individual_setup(spark, tmp_path, name="g"):
    reg = PluginRegistry()
    ic = IndividualCreator(
        registration_type="registration", case_type="case",
        individual_type="individual", individual_id_field="individual_id",
        domain=DOMAIN,
    )
    reg.register(ic)
    gl = GraphLoader(spark, str(tmp_path / name), icdc_model(), registry=reg)
    return gl, ic


def test_individual_created_for_multi_case_registration(spark, tmp_path):
    cases = _write_tsv(
        tmp_path / "cases.txt", ["type", "case_id"],
        [["case", "c1"], ["case", "c2"], ["case", "c3"]],
    )
    regs = _write_tsv(
        tmp_path / "regs.txt",
        ["type", "registration_id", "case.case_id"],
        [["registration", "r1", "c1|c2"], ["registration", "r2", "c3"]],
    )
    gl, ic = _individual_setup(spark, tmp_path)
    gl.load_files([("case", cases), ("registration", regs)])

    inds = gl.nodes("individual").collect()
    assert len(inds) == 1
    assert inds[0]["individual_id"] == "0001"  # W8: max+1 formatted '0000'
    assert inds[0]["uuid"] == get_uuid(DOMAIN, "individual", "r1")
    assert ic.nodes_created == 1

    case_uuid = {r["case_id"]: r["uuid"] for r in gl.nodes("case").collect()}
    ind_edges = [
        e for e in gl.edges().collect() if e["rel_type"] == "of_individual"
    ]
    assert {e["child_uuid"] for e in ind_edges} == {
        case_uuid["c1"], case_uuid["c2"]
    }  # r2 (single case) gets NO individual

    # second load: r3 spans c2 (already linked) + c3 -> REUSE 0001, link c3
    regs2 = _write_tsv(
        tmp_path / "regs2.txt",
        ["type", "registration_id", "case.case_id"],
        [["registration", "r3", "c2|c3"]],
    )
    gl.load_files([("registration", regs2)])
    assert gl.nodes("individual").count() == 1  # reused, not recreated
    ind_edges = [
        e for e in gl.edges().collect() if e["rel_type"] == "of_individual"
    ]
    assert {e["child_uuid"] for e in ind_edges} == {
        case_uuid["c1"], case_uuid["c2"], case_uuid["c3"]
    }


def test_individual_sequence_allocation_order(spark, tmp_path):
    cases = _write_tsv(
        tmp_path / "cases.txt", ["type", "case_id"],
        [["case", f"c{i}"] for i in range(1, 7)],
    )
    regs = _write_tsv(
        tmp_path / "regs.txt",
        ["type", "registration_id", "case.case_id"],
        [
            ["registration", "rB", "c3|c4"],
            ["registration", "rA", "c1|c2"],
            ["registration", "rC", "c5|c6"],
        ],
    )
    gl, _ = _individual_setup(spark, tmp_path)
    gl.load_files([("case", cases), ("registration", regs)])
    inds = {r["uuid"]: r["individual_id"] for r in gl.nodes("individual").collect()}
    # W8 order: ids allocated by registration id (rA < rB < rC)
    assert inds[get_uuid(DOMAIN, "individual", "rA")] == "0001"
    assert inds[get_uuid(DOMAIN, "individual", "rB")] == "0002"
    assert inds[get_uuid(DOMAIN, "individual", "rC")] == "0003"


def test_individual_conflict_raises(spark, tmp_path):
    cases = _write_tsv(
        tmp_path / "cases.txt", ["type", "case_id"],
        [["case", f"c{i}"] for i in range(1, 5)],
    )
    regs = _write_tsv(
        tmp_path / "regs.txt",
        ["type", "registration_id", "case.case_id"],
        [["registration", "r1", "c1|c2"], ["registration", "r2", "c3|c4"]],
    )
    gl, _ = _individual_setup(spark, tmp_path)
    gl.load_files([("case", cases), ("registration", regs)])
    assert gl.nodes("individual").count() == 2

    # r3 bridges cases owned by two different individuals -> reference
    # raises (individual_creator.py:50-56)
    regs2 = _write_tsv(
        tmp_path / "regs2.txt",
        ["type", "registration_id", "case.case_id"],
        [["registration", "r3", "c2|c3"]],
    )
    with pytest.raises(RuntimeError, match="more than one individual"):
        gl.load_files([("registration", regs2)])

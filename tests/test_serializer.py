"""Round-trip tests: parse → serialize → parse must be clause-identical
(the reference's golden str() round-trip, tests/common.py:157-159)."""

from __future__ import annotations

from fastobo_py_spark.obo.parser import CLAUSE_FIELDS, parse_document
from fastobo_py_spark.obo.serializer import format_clause

IX = {f: i for i, f in enumerate(CLAUSE_FIELDS)}


def _roundtrip_doc(content: str):
    rows1 = parse_document(content)
    text = _serialize_py(rows1)
    rows2 = parse_document(text)
    return rows1, rows2, text


def _serialize_py(rows):
    """Single-node mirror of serializer.serialize_documents for tests."""
    frames: dict[int, list] = {}
    ftypes: dict[int, str] = {}
    for r in rows:
        frames.setdefault(r[IX["frame_ix"]], []).append(r)
        ftypes[r[IX["frame_ix"]]] = r[IX["frame_type"]]
    chunks = []
    for ix in sorted(frames):
        body = "\n".join(
            format_clause(
                r[IX["tag"]], r[IX["v1"]], r[IX["v2"]], r[IX["value_text"]],
                r[IX["xrefs"]], r[IX["qualifiers"]], r[IX["comment"]],
                r[IX["scope"]], r[IX["datatype"]],
            )
            for r in sorted(frames[ix], key=lambda r: r[IX["clause_ix"]])
        )
        chunks.append(body if ftypes[ix] == "Header" else f"[{ftypes[ix]}]\n{body}")
    return "\n\n".join(chunks)


def _strip_volatile(rows):
    # full-fidelity comparison: every slot
    return [tuple(tuple(x) if isinstance(x, list) else x for x in r) for r in rows]


def test_roundtrip_ms_fixture():
    content = open("/root/reference/tests/data/ms.obo").read()
    rows1, rows2, _ = _roundtrip_doc(content)
    assert _strip_volatile(rows1) == _strip_volatile(rows2)


def test_roundtrip_plana_fixture():
    content = open("/root/reference/tests/data/plana.obo").read()
    rows1, rows2, _ = _roundtrip_doc(content)
    assert _strip_volatile(rows1) == _strip_volatile(rows2)


def test_roundtrip_synthetic_corpus():
    from fastobo_py_spark.sources.corpus import generate_corpus

    for row in generate_corpus(n_obo=12, n_noise=0, n_broken=0):
        rows1, rows2, text = _roundtrip_doc(row["content"])
        assert _strip_volatile(rows1) == _strip_volatile(rows2), row["path"]


def test_canonical_lines():
    # golden line-level forms mirroring the reference's str() doctests
    assert format_clause("is_obsolete", "false", None, None, None, None, None, None, None) == "is_obsolete: false"
    assert (
        format_clause("creation_date", None, None, "2021-01-23T12:00:00", None, None, None, None, None)
        == "creation_date: 2021-01-23T12:00:00"
    )
    assert (
        format_clause("def", None, None, "A def.", [("PSI:MS", None)], None, None, None, None)
        == 'def: "A def." [PSI:MS]'
    )
    assert (
        format_clause("xref", "value-type:xsd:string", None, "desc", None, None, None, None, None)
        == 'xref: value-type:xsd\\:string "desc"'
    )
    assert (
        format_clause("relationship", "part_of", "GO:1", None, None, [("source", "synth")], "cmt", None, None)
        == 'relationship: part_of GO:1 {source="synth"} ! cmt'
    )


def test_serializer_idempotent_bytes():
    # canonical text serializes to itself byte-for-byte
    content = open("/root/reference/tests/data/ms.obo").read()
    rows1, _, text1 = _roundtrip_doc(content)
    rows2 = parse_document(text1)
    text2 = _serialize_py(rows2)
    assert text1 == text2


def test_reference_display_form_parity(spark):
    """Canonical line forms pinned against the reference's own __str__
    unit tests — our distributed serializer must emit the same text
    fastobo's Display impls print:
      format-version   (reference tests/test_header.py:78)
      date             (tests/test_header.py:146)
      xref lists       (tests/test_xref.py:83-85 — ', ' separator)
      qualifier blocks (tests/test_qualifier.py:76-78)
      is_obsolete      (tests/common.py:158-159)
      property_value   (tests/test_pv.py:105)
    Also drives the multi-xref/multi-qualifier serialization through the
    REAL Spark kernel (the path that once crashed on numpy truthiness).
    """
    from fastobo_py_spark.obo.serializer import serialize_documents
    from fastobo_py_spark.operators.parse import parse_corpus, split_parsed
    from fastobo_py_spark.schema import CORPUS_SCHEMA

    content = (
        "format-version: 1.2\n"
        "date: 08:04:2019 16:51\n"
        "\n"
        "[Term]\n"
        "id: MS:1000031\n"
        'def: "an instrument" [ISBN:0321842685]\n'
        'name: tuned {source="ISBN:0321842685", minCardinality="2"}\n'
        'synonym: "multi xref" EXACT [A:1 "first", B:2]\n'
        "is_obsolete: false\n"
        "property_value: derived_from MS:1000031\n"
        "\n"
        "[Term]\n"
        "id: MS:1000032\n"
        "is_obsolete: true\n"
    )
    corpus = spark.createDataFrame([("r", "p.obo", "c", "OBO", content)], schema=CORPUS_SCHEMA)
    clauses, quarantine = split_parsed(parse_corpus(corpus))
    assert quarantine.count() == 0
    text = serialize_documents(clauses).collect()[0]["obo_text"]
    lines = text.splitlines()
    assert "format-version: 1.2" in lines
    assert "date: 08:04:2019 16:51" in lines
    assert 'def: "an instrument" [ISBN:0321842685]' in lines
    assert 'name: tuned {source="ISBN:0321842685", minCardinality="2"}' in lines
    assert 'synonym: "multi xref" EXACT [A:1 "first", B:2]' in lines
    assert "is_obsolete: false" in lines
    assert "is_obsolete: true" in lines
    assert "property_value: derived_from MS:1000031" in lines

"""Unit tests for the OBO 1.4 lexical layer (no Spark).

Test strategy mirrors the reference's per-class unit tests
(/root/reference/tests/common.py:11-194): init/roundtrip per token kind.
"""

from fastobo_py_spark.obo import grammar as g


def test_unescape_basic():
    assert g.unescape(r"xsd\:string") == "xsd:string"
    assert g.unescape(r"hello\ world") == "hello world"
    assert g.unescape(r"a\\b") == "a\\b"
    assert g.unescape(r"tab\there") == "tab\there"
    assert g.unescape("plain") == "plain"


def test_escape_ident_roundtrip():
    for s in ["xsd:string", "hello world", "a,b", "x[y]", "bang!", "br{ace}"]:
        assert g.unescape(g.escape_ident(s)) == s


def test_split_tag_value():
    assert g.split_tag_value("is_a: MS:123") == ("is_a", "MS:123")
    # escaped colon does not split the tag
    assert g.split_tag_value(r"we\:ird: value") == ("we:ird", "value")
    assert g.split_tag_value("no colon here") is None


def test_split_line_comment():
    payload, quals, comment = g.split_line("MS:1000548 ! sample attribute")
    assert payload == "MS:1000548"
    assert quals is None
    assert comment == "sample attribute"


def test_split_line_bang_inside_quotes_is_payload():
    # real case: regex defs containing ! and {8} (ms.obo line 14401)
    raw = '"([A-Fa-f0-9]{8}-x!y)." [PSI:PI]'
    payload, quals, comment = g.split_line(raw)
    assert payload == raw
    assert quals is None and comment is None


def test_split_line_qualifiers():
    payload, quals, comment = g.split_line('GO:1 {source="x", evidence="IEA"} ! cmt')
    assert payload == "GO:1"
    assert quals == [("source", "x"), ("evidence", "IEA")]
    assert comment == "cmt"


def test_scan_quoted_escapes():
    text, i = g.scan_quoted('"a \\"quoted\\" word" rest', 0)
    assert text == 'a "quoted" word'
    assert i == 19


def test_parse_xref_list():
    xs, _ = g.parse_xref_list('[PSI:MS, GO:1 "with desc", value-type:xsd\\:string]')
    assert xs == [("PSI:MS", None), ("GO:1", "with desc"), ("value-type:xsd:string", None)]


def test_parse_xref_list_empty():
    assert g.parse_xref_list("[]")[0] == []


def test_qualifier_block_unquoted_value():
    assert g.parse_qualifier_block("k=v") == [("k", "v")]

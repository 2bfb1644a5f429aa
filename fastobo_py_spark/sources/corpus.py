'''Deterministic synthetic repo-corpus generator (FIXTURES.md §1/§3).

Produces the ``(repo, path, commit, lang, content)`` table of
``BASELINE.json:input_hint`` at any scale, seeded — no external data.  The
OBO documents mirror the reference fixtures\' structure
(``/root/reference/tests/data/ms.obo`` / ``plana.obo``) so golden counts
are exact, and exercise every grammar feature the reference tests:
escaped idents (``xsd\\:string``), ``! comments``, ``{qualifier="v"}``
blocks, synonyms with scopes, xref lists, genus-differentia macros,
alt_id / obsolete / replaced_by / consider, equivalence xref chains, URL
identifiers with an ``idspace:`` declaration, and broken documents that
must land in quarantine.

Determinism matters twice: tests assert exact counts, and the DuckDB
oracle (``fastobo_py_spark/oracle.py``) re-derives expected outputs from
the same corpus single-threaded.
'''

from __future__ import annotations

import hashlib
import random

_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua"
).split()


def _sha1(s: str) -> str:
    return hashlib.sha1(s.encode()).hexdigest()


def _header(lines: list[str]) -> str:
    return "\n".join(lines) + "\n"


def make_ms_like(doc_ix: int, n_terms: int = 50, n_typedefs: int = 2) -> str:
    """ms.obo-style: MS: idspace, def+xrefs, escaped ident xref,
    relationship has_units, is_a chains into a root. At the default
    size: 53 frames (50 terms + 2 typedefs + 1 instance), 48 is_a + 11
    relationship edges — measured from the generator itself; FIXTURES.md
    §3 mirrors these (an earlier doc draft said 52/12 from before the
    [Instance] frame and the t>=4 guard landed)."""
    p = f"MS{doc_ix}"
    out = [
        "format-version: 1.2",
        f"data-version: 4.1.{doc_ix}",
        "date: 25:03:2019 16:28",
        "saved-by: synthetic",
        "auto-generated-by: fastobo-py-spark-synth",
        f"default-namespace: {p}",
        "remark: synthetic ms-like fixture",
        "import: http://ontologies.example.org/pato.obo",
        f"ontology: ms{doc_ix}",
        "",
    ]
    # two roots: terms 0 and 1; terms 2.. point is_a at a root or a prior term
    for t in range(n_terms):
        tid = f"{p}:{t:07d}"
        out.append("[Term]")
        out.append(f"id: {tid}")
        out.append(f"name: term {t} of doc {doc_ix}")
        out.append(f'def: "Synthetic definition {t}." [PSI:MS]')
        if t % 4 == 1:
            out.append('xref: value-type:xsd\\:string "The allowed value-type for this CV term."')
        if t >= 2:
            parent = f"{p}:{(t % 2):07d}" if t < 26 else f"{p}:{(t - 2):07d}"
            out.append(f"is_a: {parent} ! parent term")
        if t % 4 == 2 and t >= 4:
            out.append(f"relationship: has_units UO:0000021 {{source=\"synth\"}}")
        if t == 3:
            out.append("is_obsolete: true")
            out.append(f"replaced_by: {p}:0000001")
        out.append("")
    for d in range(n_typedefs):
        out.append("[Typedef]")
        out.append(f"id: has_units")
        if d:
            out[-1] = f"id: part_of_{doc_ix}_{d}"
        out.append(f"name: typedef {d}")
        out.append("is_transitive: true" if d else "is_metadata_tag: true")
        out.append("")
    # one [Instance] frame per doc: the third frame type of the reference's
    # AST (src/py/instance/frame.rs), with an xsd-typed property_value
    out.append("[Instance]")
    out.append(f"id: {p}:i000001")
    out.append(f"name: calibration instance {doc_ix}")
    out.append(f"instance_of: {p}:0000001")
    out.append(f'property_value: IAO:0000412 "2.5" xsd:float')
    out.append("")
    return _header(out)


def make_plana_like(doc_ix: int, n_terms: int = 30, n_typedefs: int = 10) -> str:
    """plana.obo-style: multi-idspace (BSPO/PLANA/UBERON), synonyms with
    scopes, synonymtypedef header, genus-differentia macro, xrefs."""
    spaces = ["BSPO", "PLANA", "UBERON"]
    out = [
        "format-version: 1.2",
        f"data-version: plana/releases/2019-02/plana-{doc_ix}.owl",
        'synonymtypedef: human "synonym used in human anatomy" NARROW',
        "default-namespace: Planarian_Anatomy",
        "treat-xrefs-as-genus-differentia: CARO part_of NCBITaxon:79327; CL part_of NCBITaxon:79327",
        "ontology: http://purl.obolibrary.org/obo",
        "",
    ]
    for t in range(n_terms):
        sp = spaces[t % 3]
        tid = f"{sp}:{t:07d}"
        out.append("[Term]")
        out.append(f"id: {tid}")
        out.append(f"name: {sp.lower()} structure {t}")
        out.append(f'def: "A synthetic anatomical entity {t}." [{sp}:curator]')
        out.append(f'synonym: "struct {t}" EXACT []')
        if t % 3 == 0:
            out.append(f'synonym: "human struct {t}" NARROW human [FMA:{10000+t}]')
        out.append(f"xref: CARO:{t:07d}")
        if t >= 3:
            out.append(f"is_a: {spaces[(t - 3) % 3]}:{t - 3:07d} ! prior structure")
        if t % 5 == 4:
            out.append(f"relationship: BSPO:0000110 {spaces[(t + 1) % 3]}:{(t + 1) % n_terms:07d} ! left_of")
        out.append("")
    for d in range(n_typedefs):
        out.append("[Typedef]")
        out.append(f"id: BSPO:9{d:06d}")
        out.append(f"name: relation {d}")
        out.append(f"namespace: planarian_relation")
        if d % 2:
            out.append("is_transitive: true")
        out.append(f"domain: PLANA:0000001")
        out.append(f"range: PLANA:0000002")
        out.append("")
    return _header(out)


def make_go_like(doc_ix: int, n_terms: int = 40) -> str:
    """GO-style: intersection_of genus+differentia (the GO:0000085 pattern,
    ``src/py/term/clause.rs:1146-1161``), alt_id, obsolete terms with
    replaced_by / consider / neither, and hub skew (~60% of is_a edges
    point at 3 hub terms)."""
    p = "GO"
    out = [
        "format-version: 1.2",
        f"data-version: releases/2021-01-{doc_ix % 28 + 1:02d}",
        "default-namespace: gene_ontology",
        f"ontology: go",
        "",
    ]
    rng = random.Random(1000 + doc_ix)
    hubs = [f"{p}:{doc_ix:03d}{h:04d}" for h in range(3)]
    for t in range(n_terms):
        tid = f"{p}:{doc_ix:03d}{t:04d}"
        out.append("[Term]")
        out.append(f"id: {tid}")
        out.append(f"name: biological process {doc_ix}.{t}")
        out.append(f"namespace: biological_process")
        if t % 6 == 1:
            out.append(f"alt_id: {p}:{doc_ix:03d}9{t:03d}")
        out.append(f'def: "A synthetic process {t}." [GOC:synth]')
        if t >= 3:
            parent = hubs[t % 3] if rng.random() < 0.6 else f"{p}:{doc_ix:03d}{t - 1:04d}"
            out.append(f"is_a: {parent}")
        if t % 7 == 3 and t >= 4:
            out.append(f"intersection_of: {p}:{doc_ix:03d}{t - 2:04d} ! genus")
            out.append(f"intersection_of: part_of {p}:{doc_ix:03d}{t - 1:04d} ! differentia")
        if t % 5 == 2:
            # all three creation_date shapes the reference accepts
            # (src/date.rs:14-123): plain date, naive datetime, zoned
            shape = t % 15
            day = t % 27 + 1
            if shape == 2:
                out.append(f"creation_date: 2021-03-{day:02d}")
            elif shape == 7:
                out.append(f"creation_date: 2021-03-{day:02d}T12:{t % 60:02d}:05")
            else:
                out.append(f"creation_date: 2021-03-{day:02d}T08:{t % 60:02d}:30+0{doc_ix % 3 + 1}:00")
            out.append("created_by: synth-curator")
        if t % 10 == 8:
            out.append("is_obsolete: true")
            if t % 20 == 8:
                out.append(f"replaced_by: {hubs[0]}")
            else:
                out.append(f"consider: {hubs[1]}")
        if t == n_terms - 1:
            out.append("is_obsolete: true")  # obsolete w/o replacement (validation case)
        out.append("")
    out.append("[Typedef]")
    out.append("id: part_of")
    out.append("name: part of")
    out.append("is_transitive: true")
    out.append("")
    return _header(out)


def make_pato_like(doc_ix: int, n_terms: int = 20) -> str:
    """PATO-style: ``treat-xrefs-as-equivalent: CL`` + xref chains forming
    2 connected components (sizes 4 and 3), plus URL identifiers with an
    ``idspace:`` declaration (compaction both ways,
    ``src/py/doc.rs:219-234``)."""
    p = "PATO"
    out = [
        "format-version: 1.2",
        "treat-xrefs-as-equivalent: CL",
        f"idspace: {p} http://purl.obolibrary.org/obo/{p}_ \"phenotype ontology\"",
        "ontology: pato",
        "",
    ]
    for t in range(n_terms):
        tid = f"{p}:{doc_ix:03d}{t:04d}"
        out.append("[Term]")
        out.append(f"id: {tid}")
        out.append(f"name: quality {doc_ix}.{t}")
        # component 1: terms 0-3 share CL xref chain; component 2: terms 5-7
        if t in (0, 1, 2, 3):
            out.append(f"xref: CL:{doc_ix:03d}0001")
        if t in (5, 6, 7):
            out.append(f"xref: CL:{doc_ix:03d}0002")
        if t == 10:
            # URL identifier object alongside prefixed ids
            out.append(f"is_a: http://purl.obolibrary.org/obo/{p}_{doc_ix:03d}0001")
        elif t >= 2:
            out.append(f"is_a: {p}:{doc_ix:03d}{t - 2:04d}")
        out.append("")
    return _header(out)


def make_broken(doc_ix: int) -> str:
    """Truncated frame → SyntaxError path (``tests/test_fastobo.py:36-37``)."""
    return f"format-version: 1.{doc_ix}\n\n[Term\nid MS:broken{doc_ix}\nthis line has no colon or tag\n"


def make_noise(doc_ix: int, rng: random.Random) -> tuple[str, str, str]:
    """Non-OBO repo files (path, lang, content)."""
    kind = doc_ix % 4
    words = " ".join(rng.choices(_LOREM, k=40))
    if kind == 0:
        return (f"src/module_{doc_ix}.py", "Python", f'"""{words}"""\n\ndef f_{doc_ix}():\n    return {doc_ix}\n')
    if kind == 1:
        return (f"src/lib_{doc_ix}.rs", "Rust", f"// {words}\npub fn f_{doc_ix}() -> u64 {{ {doc_ix} }}\n")
    if kind == 2:
        return (f"docs/readme_{doc_ix}.md", "Markdown", f"# Doc {doc_ix}\n\n{words}\n")
    return (f"data/cfg_{doc_ix}.json", "JSON", f'{{"id": {doc_ix}, "note": "{words[:60]}"}}\n')


# Family cycle for OBO docs: index % 4 selects the generator.
_FAMILIES = ("ms", "plana", "go", "pato")


def generate_corpus(n_obo: int = 40, n_noise: int = 160, n_broken: int = 2, seed: int = 42, doc_scale: int = 1):
    """Yield corpus rows as dicts. Fully deterministic in (args, seed).

    Default sizing matches FIXTURES.md §1 (~200 rows, ~40 OBO). Scale up
    via ``n_obo``/``n_noise`` (more files) and ``doc_scale`` (bigger
    files: multiplies per-document term counts) for benchmarks.
    """
    rng = random.Random(seed)
    rows = []
    for i in range(n_obo):
        fam = _FAMILIES[i % 4]
        if fam == "ms":
            content = make_ms_like(i, n_terms=50 * doc_scale)
        elif fam == "plana":
            content = make_plana_like(i, n_terms=30 * doc_scale)
        elif fam == "go":
            content = make_go_like(i, n_terms=40 * doc_scale)
        else:
            content = make_pato_like(i, n_terms=20 * doc_scale)
        rows.append(
            {
                "repo": f"org{i % 7}/repo{i % 23}",
                "path": f"ontologies/{fam}_{i}.obo",
                "commit": _sha1(f"c{i}"),
                "lang": "OBO",
                "content": content,
            }
        )
    for i in range(n_broken):
        rows.append(
            {
                "repo": f"org{i % 7}/broken",
                "path": f"ontologies/broken_{i}.obo",
                "commit": _sha1(f"b{i}"),
                "lang": "OBO",
                "content": make_broken(i),
            }
        )
    if n_broken:
        # FIXTURES.md error case 2: non-OBO content mislabeled lang='OBO'
        # (lexes as tag:value lines but has no frames / format-version)
        rows.append(
            {
                "repo": "org0/mislabeled",
                "path": "config/settings.yaml",
                "commit": _sha1("mislabeled"),
                "lang": "OBO",
                "content": "host: example.org\nport: 8080\nretries: 3\n",
            }
        )
    for i in range(n_noise):
        path, lang, content = make_noise(i, rng)
        rows.append(
            {
                "repo": f"org{i % 7}/repo{i % 23}",
                "path": path,
                "commit": _sha1(f"n{i}"),
                "lang": lang,
                "content": content,
            }
        )
    return rows


def corpus_to_parquet(
    out_dir: str,
    n_obo: int = 40,
    n_noise: int = 160,
    n_broken: int = 2,
    seed: int = 42,
    doc_scale: int = 1,
    n_files: int = 64,
) -> str:
    """Materialize the synthetic corpus as a parquet directory WITHOUT
    Spark (pyarrow direct write, one file per slice so a later scan
    parallelizes like a real table). Returns out_dir."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rows = generate_corpus(n_obo=n_obo, n_noise=n_noise, n_broken=n_broken, seed=seed, doc_scale=doc_scale)
    cols = ("repo", "path", "commit", "lang", "content")
    per = max(1, (len(rows) + n_files - 1) // n_files)
    for i in range(0, len(rows), per):
        chunk = rows[i : i + per]
        table = pa.table({c: [r[c] for r in chunk] for c in cols})
        pq.write_table(table, os.path.join(out_dir, f"part-{i//per:05d}.parquet"))
    return out_dir


def corpus_df(spark, n_obo: int = 40, n_noise: int = 160, n_broken: int = 2, seed: int = 42, partitions: int | None = None, doc_scale: int = 1):
    """Materialize the synthetic corpus as a DataFrame.

    At real scale this is ``spark.read.table(iceberg_corpus)``; the
    generator stands in for the Iceberg scan in the sandbox.
    """
    from fastobo_py_spark.schema import CORPUS_SCHEMA

    rows = generate_corpus(n_obo=n_obo, n_noise=n_noise, n_broken=n_broken, seed=seed, doc_scale=doc_scale)
    df = spark.createDataFrame(rows, schema=CORPUS_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df
